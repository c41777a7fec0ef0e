// pyfft_tpu native IO tier: memory-mapped streaming shot-file loader.
//
// Role: the framework's data-ingestion runtime (the reference delegates IO
// to h5py/NumPy on the Python heap; HeatPulse_Funcs.py:33-70).  Raw DAQ
// captures are interleaved channel frames; this library memory-maps the
// file and produces deinterleaved float32 channel blocks — with optional
// boxcar decimation fused into the copy — so the Python layer touches the
// data exactly once, as device-ready blocks for StreamingWelch.
//
// C ABI (ctypes-bound from pyfft_tpu.io.loader):
//   shotloader_open(path, nch, dtype_code, header_bytes) -> handle | NULL
//   shotloader_nsamples(handle) -> per-channel sample count
//   shotloader_read(handle, start, count, decim, out) -> samples written
//   shotloader_close(handle)
//
// dtype codes: 0 = int16, 1 = float32, 2 = float64 (little-endian).

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Shot {
    int fd = -1;
    const uint8_t* base = nullptr;   // mmap base
    size_t map_len = 0;
    const uint8_t* data = nullptr;   // past header
    long nch = 0;
    int dtype = 0;                   // 0 i16, 1 f32, 2 f64
    long nsamples = 0;               // per channel
};

size_t dtype_size(int code) {
    switch (code) {
        case 0: return 2;
        case 1: return 4;
        case 2: return 8;
        default: return 0;
    }
}

// Deinterleave + convert + (optionally) boxcar-decimate one channel.
// src points at the first frame of the requested range.
template <typename T>
void copy_channel(const T* src, long nch, long ch, long count, long decim,
                  float* out) {
    if (decim <= 1) {
        for (long i = 0; i < count; ++i) {
            out[i] = static_cast<float>(src[i * nch + ch]);
        }
        return;
    }
    const long nout = count / decim;
    const float inv = 1.0f / static_cast<float>(decim);
    for (long o = 0; o < nout; ++o) {
        float acc = 0.0f;
        const T* frame = src + (o * decim) * nch + ch;
        for (long j = 0; j < decim; ++j) {
            acc += static_cast<float>(frame[j * nch]);
        }
        out[o] = acc * inv;
    }
}

}  // namespace

extern "C" {

void* shotloader_open(const char* path, long nch, int dtype_code,
                      long header_bytes) {
    if (nch <= 0 || dtype_size(dtype_code) == 0 || header_bytes < 0) {
        return nullptr;
    }
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (::fstat(fd, &st) != 0 || st.st_size < header_bytes) {
        ::close(fd);
        return nullptr;
    }
    void* base = ::mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                        MAP_PRIVATE, fd, 0);
    if (base == MAP_FAILED) {
        ::close(fd);
        return nullptr;
    }
    ::madvise(base, static_cast<size_t>(st.st_size), MADV_SEQUENTIAL);

    Shot* s = new Shot();
    s->fd = fd;
    s->base = static_cast<const uint8_t*>(base);
    s->map_len = static_cast<size_t>(st.st_size);
    s->data = s->base + header_bytes;
    s->nch = nch;
    s->dtype = dtype_code;
    const size_t frame = dtype_size(dtype_code) * static_cast<size_t>(nch);
    s->nsamples = static_cast<long>(
        (static_cast<size_t>(st.st_size) - header_bytes) / frame);
    return s;
}

long shotloader_nsamples(void* handle) {
    return handle ? static_cast<Shot*>(handle)->nsamples : -1;
}

long shotloader_nch(void* handle) {
    return handle ? static_cast<Shot*>(handle)->nch : -1;
}

// Read `count` per-channel samples starting at frame `start`, decimating
// by `decim` (boxcar mean).  `out` is (nch, count/decim) row-major float32.
// Returns per-channel samples written, or -1 on error.
long shotloader_read(void* handle, long start, long count, long decim,
                     float* out) {
    Shot* s = static_cast<Shot*>(handle);
    if (!s || start < 0 || count < 0 || decim < 1) return -1;
    if (start + count > s->nsamples) count = s->nsamples - start;
    if (count < 0) return -1;
    count -= count % decim;          // whole decimation groups only
    const long nout = count / decim;

    const size_t esz = dtype_size(s->dtype);
    const uint8_t* src = s->data + esz * static_cast<size_t>(start) *
                                       static_cast<size_t>(s->nch);
    for (long ch = 0; ch < s->nch; ++ch) {
        float* dst = out + ch * nout;
        switch (s->dtype) {
            case 0:
                copy_channel(reinterpret_cast<const int16_t*>(src), s->nch,
                             ch, count, decim, dst);
                break;
            case 1:
                copy_channel(reinterpret_cast<const float*>(src), s->nch,
                             ch, count, decim, dst);
                break;
            case 2:
                copy_channel(reinterpret_cast<const double*>(src), s->nch,
                             ch, count, decim, dst);
                break;
        }
    }
    return nout;
}

void shotloader_close(void* handle) {
    Shot* s = static_cast<Shot*>(handle);
    if (!s) return;
    if (s->base) ::munmap(const_cast<uint8_t*>(s->base), s->map_len);
    if (s->fd >= 0) ::close(s->fd);
    delete s;
}

}  // extern "C"
