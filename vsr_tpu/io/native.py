"""ctypes bindings to the native data-loader core (``native/vsr_native.cpp``).

Provides ``load_nifti_native`` (drop-in for the decode part of
``vsr_tpu.io.nifti.load_nifti``, returning float32) and
``load_nifti_batch`` (thread-pooled batch decode that releases the GIL for
the whole batch). Falls back to the pure-Python reader when the shared
library is absent; ``build()`` compiles it with g++ on demand.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvsr_native.so"
_lib: ctypes.CDLL | None = None

_ERRORS = {1: "open/read", 2: "gunzip", 3: "header", 4: "dtype", 5: "capacity"}


def build(force: bool = False) -> Path:
    """Compile the native library (idempotent)."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    src = _NATIVE_DIR / "vsr_native.cpp"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src),
         "-o", str(_LIB_PATH), "-lz", "-lpthread"],
        check=True,
        capture_output=True,
    )
    return _LIB_PATH


def _load_lib(auto_build: bool = True) -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        if not auto_build:
            return None
        try:
            build()
        except Exception:
            return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.vsr_decode_nifti.restype = ctypes.c_int
    lib.vsr_decode_nifti.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vsr_decode_batch.restype = ctypes.c_int
    lib.vsr_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load_lib() is not None


_DEFAULT_CAPACITY = 64 * 1024 * 1024  # elements (256 MB float32)


def load_nifti_native(path: str | Path, capacity: int = _DEFAULT_CAPACITY) -> np.ndarray:
    """Decode one NIfTI into a float32 array via the native core."""
    lib = _load_lib()
    if lib is None:
        from vsr_tpu.io.nifti import load_nifti

        return np.asarray(load_nifti(path), dtype=np.float32)
    out = np.empty(capacity, dtype=np.float32)
    shape = (ctypes.c_int64 * 7)()
    ndim = ctypes.c_int()
    err = lib.vsr_decode_nifti(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity,
        shape,
        ctypes.byref(ndim),
    )
    if err:
        raise IOError(f"native NIfTI decode failed ({_ERRORS.get(err, err)}): {path}")
    dims = tuple(int(shape[i]) for i in range(ndim.value))
    n = int(np.prod(dims))
    return out[:n].reshape(dims, order="F").copy(order="C")


def load_nifti_batch(
    paths: list[str | Path],
    capacity: int = _DEFAULT_CAPACITY,
    n_threads: int = 8,
) -> list[np.ndarray]:
    """Decode a batch of NIfTI files with the native thread pool."""
    lib = _load_lib()
    if lib is None:
        return [load_nifti_native(p) for p in paths]
    n = len(paths)
    bufs = [np.empty(capacity, dtype=np.float32) for _ in range(n)]
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for b in bufs]
    )
    c_caps = (ctypes.c_int64 * n)(*[capacity] * n)
    c_shapes = (ctypes.c_int64 * (n * 7))()
    c_ndims = (ctypes.c_int * n)()
    err = lib.vsr_decode_batch(c_paths, n, c_outs, c_caps, c_shapes, c_ndims, n_threads)
    if err:
        raise IOError(f"native batch decode failed ({_ERRORS.get(err, err)})")
    out = []
    for i in range(n):
        dims = tuple(int(c_shapes[i * 7 + j]) for j in range(c_ndims[i]))
        cnt = int(np.prod(dims))
        out.append(bufs[i][:cnt].reshape(dims, order="F").copy(order="C"))
    return out
