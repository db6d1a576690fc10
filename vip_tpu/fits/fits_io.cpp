// Native FITS data-block decoder.
//
// The FITS on-disk format stores array data big-endian; decoding a large
// cube means a byteswap + dtype conversion over GBs. This translation unit
// provides a multithreaded mmap-based decoder used by vip_tpu.fits via
// ctypes (the Python side parses the 2880-byte header blocks, which are
// tiny). Falls back transparently to numpy in Python if the shared
// library is unavailable.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o _fits_io.so fits_io.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <thread>
#include <vector>
#include <algorithm>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

// Decode n elements of big-endian data with the given bitpix into float
// (f64=false -> float32, true -> float64), applying bscale/bzero.
template <typename OutT>
void decode_range(const uint8_t *src, OutT *dst, int64_t n, int bitpix,
                  double bscale, double bzero) {
    switch (bitpix) {
    case 8: {
        for (int64_t i = 0; i < n; ++i)
            dst[i] = static_cast<OutT>(bscale * src[i] + bzero);
        break;
    }
    case 16: {
        const uint16_t *p = reinterpret_cast<const uint16_t *>(src);
        for (int64_t i = 0; i < n; ++i) {
            int16_t v = static_cast<int16_t>(bswap16(p[i]));
            dst[i] = static_cast<OutT>(bscale * v + bzero);
        }
        break;
    }
    case 32: {
        const uint32_t *p = reinterpret_cast<const uint32_t *>(src);
        for (int64_t i = 0; i < n; ++i) {
            int32_t v = static_cast<int32_t>(bswap32(p[i]));
            dst[i] = static_cast<OutT>(bscale * v + bzero);
        }
        break;
    }
    case 64: {
        const uint64_t *p = reinterpret_cast<const uint64_t *>(src);
        for (int64_t i = 0; i < n; ++i) {
            int64_t v = static_cast<int64_t>(bswap64(p[i]));
            dst[i] = static_cast<OutT>(bscale * v + bzero);
        }
        break;
    }
    case -32: {
        const uint32_t *p = reinterpret_cast<const uint32_t *>(src);
        for (int64_t i = 0; i < n; ++i) {
            uint32_t b = bswap32(p[i]);
            float v;
            std::memcpy(&v, &b, 4);
            dst[i] = static_cast<OutT>(bscale * v + bzero);
        }
        break;
    }
    case -64: {
        const uint64_t *p = reinterpret_cast<const uint64_t *>(src);
        for (int64_t i = 0; i < n; ++i) {
            uint64_t b = bswap64(p[i]);
            double v;
            std::memcpy(&v, &b, 8);
            dst[i] = static_cast<OutT>(bscale * v + bzero);
        }
        break;
    }
    }
}

template <typename OutT>
int decode_file(const char *path, int64_t offset, int64_t n, int bitpix,
                double bscale, double bzero, OutT *dst) {
    switch (bitpix) {
    case 8: case 16: case 32: case 64: case -32: case -64:
        break;
    default:
        return -5;  // unknown BITPIX: refuse rather than leave dst garbage
    }
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    int64_t elsize = std::abs(bitpix) / 8;
    int64_t nbytes = n * elsize;
    if (offset + nbytes > st.st_size) { close(fd); return -3; }

    void *map = mmap(nullptr, static_cast<size_t>(offset + nbytes),
                     PROT_READ, MAP_PRIVATE, fd, 0);
    if (map == MAP_FAILED) { close(fd); return -4; }
    const uint8_t *src = static_cast<const uint8_t *>(map) + offset;

    unsigned hw = std::thread::hardware_concurrency();
    int64_t min_per_thread = 1 << 20;  // 1M elements
    int nthreads = static_cast<int>(
        std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 1,
                                               n / min_per_thread)));
    if (nthreads <= 1) {
        decode_range(src, dst, n, bitpix, bscale, bzero);
    } else {
        std::vector<std::thread> threads;
        int64_t chunk = (n + nthreads - 1) / nthreads;
        for (int t = 0; t < nthreads; ++t) {
            int64_t lo = t * chunk;
            int64_t hi = std::min<int64_t>(n, lo + chunk);
            if (lo >= hi) break;
            threads.emplace_back([=]() {
                decode_range(src + lo * elsize, dst + lo, hi - lo, bitpix,
                             bscale, bzero);
            });
        }
        for (auto &th : threads) th.join();
    }
    munmap(map, static_cast<size_t>(offset + nbytes));
    close(fd);
    return 0;
}

// Big-endian encode (for the writer): native float -> BE bytes.
template <typename InT>
void encode_range(const InT *src, uint8_t *dst, int64_t n) {
    if (sizeof(InT) == 4) {
        const uint32_t *p = reinterpret_cast<const uint32_t *>(src);
        uint32_t *q = reinterpret_cast<uint32_t *>(dst);
        for (int64_t i = 0; i < n; ++i) q[i] = bswap32(p[i]);
    } else {
        const uint64_t *p = reinterpret_cast<const uint64_t *>(src);
        uint64_t *q = reinterpret_cast<uint64_t *>(dst);
        for (int64_t i = 0; i < n; ++i) q[i] = bswap64(p[i]);
    }
}

}  // namespace

extern "C" {

int fits_decode_f32(const char *path, int64_t offset, int64_t n, int bitpix,
                    double bscale, double bzero, float *dst) {
    return decode_file(path, offset, n, bitpix, bscale, bzero, dst);
}

int fits_decode_f64(const char *path, int64_t offset, int64_t n, int bitpix,
                    double bscale, double bzero, double *dst) {
    return decode_file(path, offset, n, bitpix, bscale, bzero, dst);
}

void fits_encode_f32(const float *src, uint8_t *dst, int64_t n) {
    encode_range(src, dst, n);
}

void fits_encode_f64(const double *src, uint8_t *dst, int64_t n) {
    encode_range(src, dst, n);
}

}  // extern "C"
