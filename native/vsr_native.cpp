// vsr_native — native data-loader core for vsr_tpu.
//
// Role: the reference framework leans on torch DataLoader worker *processes*
// for NIfTI decode throughput; this library provides the TPU-framework
// equivalent as an in-process C++ core: zlib-gunzip + NIfTI-1 parse +
// dtype conversion to float32, plus a pthread pool that decodes a whole
// batch of files in parallel without holding the Python GIL (the Python
// side calls through ctypes, releasing the GIL for the whole batch).
//
// Exposed C ABI:
//   int vsr_decode_nifti(const char* path, float* out, int64_t capacity,
//                        int64_t* shape7, int* ndim)
//       -> 0 on success; shape7 receives up to 7 dims (Fortran data order,
//          decoded into `out` as float32 in the same linear order the
//          file stores, i.e. x fastest).
//   int vsr_decode_batch(const char** paths, int n, float** outs,
//                        int64_t* capacities, int64_t* shapes /* n*7 */,
//                        int* ndims, int n_threads)
//       -> 0 if every file decoded, else first error code.
//
// Error codes: 1 open/read, 2 gunzip, 3 header, 4 dtype, 5 capacity.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <thread>
#include <atomic>
#include <zlib.h>

namespace {

struct Header {
    int ndim;
    int64_t shape[7];
    int datatype;
    double slope, inter;
    int64_t vox_offset;
};

int parse_header(const unsigned char* buf, size_t len, Header* h) {
    if (len < 352) return 3;
    int32_t sizeof_hdr;
    std::memcpy(&sizeof_hdr, buf, 4);
    if (sizeof_hdr != 348) return 3;  // big-endian unsupported in fast path
    int16_t dim[8];
    std::memcpy(dim, buf + 40, 16);
    if (dim[0] < 1 || dim[0] > 7) return 3;
    h->ndim = dim[0];
    for (int i = 0; i < h->ndim; i++) h->shape[i] = dim[1 + i];
    int16_t datatype;
    std::memcpy(&datatype, buf + 70, 2);
    h->datatype = datatype;
    float vox_offset, slope, inter;
    std::memcpy(&vox_offset, buf + 108, 4);
    std::memcpy(&slope, buf + 112, 4);
    std::memcpy(&inter, buf + 116, 4);
    h->vox_offset = vox_offset > 0 ? (int64_t)vox_offset : 352;
    h->slope = slope;
    h->inter = inter;
    return 0;
}

template <typename T>
void convert(const unsigned char* src, float* dst, int64_t n, double slope,
             double inter, bool scale) {
    const T* s = reinterpret_cast<const T*>(src);
    if (scale) {
        for (int64_t i = 0; i < n; i++)
            dst[i] = (float)(s[i] * slope + inter);
    } else {
        for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i];
    }
}

int gunzip_file(const char* path, std::vector<unsigned char>& out) {
    gzFile f = gzopen(path, "rb");
    if (!f) return 1;
    gzbuffer(f, 1 << 20);
    out.clear();
    out.reserve(1 << 20);
    unsigned char chunk[1 << 18];
    int n;
    while ((n = gzread(f, chunk, sizeof(chunk))) > 0)
        out.insert(out.end(), chunk, chunk + n);
    int err = 0;
    if (n < 0) err = 2;
    gzclose(f);
    return err;
}

}  // namespace

extern "C" {

int vsr_decode_nifti(const char* path, float* out, int64_t capacity,
                     int64_t* shape7, int* ndim) {
    std::vector<unsigned char> buf;
    int err = gunzip_file(path, buf);  // handles plain files too (gzread
                                       // passes through uncompressed data)
    if (err) return err;

    Header h;
    err = parse_header(buf.data(), buf.size(), &h);
    if (err) return err;

    int64_t n = 1;
    for (int i = 0; i < h.ndim; i++) n *= h.shape[i];
    if (n > capacity) return 5;
    if ((int64_t)buf.size() < h.vox_offset) return 3;

    const unsigned char* vox = buf.data() + h.vox_offset;
    bool scale = (h.slope != 0.0 && h.slope != 1.0) || h.inter != 0.0;
    double slope = (h.slope == 0.0) ? 1.0 : h.slope;
    switch (h.datatype) {
        case 2:   convert<uint8_t>(vox, out, n, slope, h.inter, scale); break;
        case 4:   convert<int16_t>(vox, out, n, slope, h.inter, scale); break;
        case 8:   convert<int32_t>(vox, out, n, slope, h.inter, scale); break;
        case 16:  convert<float>(vox, out, n, slope, h.inter, scale); break;
        case 64:  convert<double>(vox, out, n, slope, h.inter, scale); break;
        case 256: convert<int8_t>(vox, out, n, slope, h.inter, scale); break;
        case 512: convert<uint16_t>(vox, out, n, slope, h.inter, scale); break;
        case 768: convert<uint32_t>(vox, out, n, slope, h.inter, scale); break;
        default: return 4;
    }
    for (int i = 0; i < 7; i++) shape7[i] = i < h.ndim ? h.shape[i] : 1;
    *ndim = h.ndim;
    return 0;
}

int vsr_decode_batch(const char** paths, int n, float** outs,
                     int64_t* capacities, int64_t* shapes, int* ndims,
                     int n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::atomic<int> next(0);
    std::atomic<int> first_err(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            int err = vsr_decode_nifti(paths[i], outs[i], capacities[i],
                                       shapes + (int64_t)i * 7, ndims + i);
            if (err) {
                int expected = 0;
                first_err.compare_exchange_strong(expected, err);
            }
        }
    };
    std::vector<std::thread> threads;
    int k = n_threads < n ? n_threads : n;
    for (int t = 0; t < k; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return first_err.load();
}

}  // extern "C"
