#!/bin/sh
# Build the native data-loader core.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 vsr_native.cpp -o libvsr_native.so -lz -lpthread
echo "built $(pwd)/libvsr_native.so"
