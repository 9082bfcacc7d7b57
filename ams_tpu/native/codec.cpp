// Native model-delta codec for AMS-TPU.
//
// Replaces the reference's host-side payload path (run.py:316-333:
// np.packbits per var + fp16 cast + a `gzip -9` subprocess) with a single
// streaming pass: bit-packing, IEEE half conversion and DEFLATE (gzip
// container, level 9) happen in one traversal with no intermediate file and
// no process fork.
//
// Build: ams_tpu/native/build.py  (g++ -O3 -shared -fPIC codec.cpp -lz)

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

// Round-to-nearest-even float32 -> float16, matching numpy's astype.
inline uint16_t f32_to_f16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = x & 0x7FFFFFu;
    if (((x >> 23) & 0xFF) == 0xFF) {  // inf / nan
        return (uint16_t)(sign | 0x7C00u | (mant ? 0x200u : 0));
    }
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u);  // overflow -> inf
    if (exp <= 0) {                                      // subnormal / zero
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000u;
        int shift = 14 - exp;
        uint32_t half = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    uint32_t half = (uint32_t)(exp << 10) | (mant >> 13);
    uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return (uint16_t)(sign | half);
}

struct GzWriter {
    z_stream zs{};
    uint8_t* out;
    long cap;
    long written = 0;
    bool error = false;
    uint8_t chunk[1 << 16];

    explicit GzWriter(uint8_t* out_, long cap_) : out(out_), cap(cap_) {
        // windowBits 15+16 selects the gzip container, level 9 = `gzip -9`.
        if (deflateInit2(&zs, 9, Z_DEFLATED, 15 + 16, 9,
                         Z_DEFAULT_STRATEGY) != Z_OK)
            error = true;
    }
    ~GzWriter() { deflateEnd(&zs); }

    void push(const uint8_t* data, size_t n, bool finish = false) {
        zs.next_in = const_cast<uint8_t*>(data);
        zs.avail_in = (uInt)n;
        do {
            zs.next_out = chunk;
            zs.avail_out = sizeof(chunk);
            int rc = deflate(&zs, finish ? Z_FINISH : Z_NO_FLUSH);
            if (rc == Z_STREAM_ERROR) { error = true; return; }
            long got = (long)(sizeof(chunk) - zs.avail_out);
            if (written + got > cap) { error = true; return; }
            std::memcpy(out + written, chunk, got);
            written += got;
        } while (zs.avail_out == 0 || (finish && zs.avail_in > 0));
        if (finish) {  // drain
            int rc;
            do {
                zs.next_out = chunk;
                zs.avail_out = sizeof(chunk);
                rc = deflate(&zs, Z_FINISH);
                long got = (long)(sizeof(chunk) - zs.avail_out);
                if (written + got > cap) { error = true; return; }
                std::memcpy(out + written, chunk, got);
                written += got;
            } while (rc != Z_STREAM_END && !error);
        }
    }
};

}  // namespace

extern "C" {

// Compress `n` bytes with gzip -9 semantics; returns compressed size or -1.
long ams_gzip9(const uint8_t* in, long n, uint8_t* out, long out_cap) {
    GzWriter w(out, out_cap);
    if (w.error) return -1;
    w.push(in, (size_t)n, true);
    return w.error ? -1 : w.written;
}

// Encode a full delta payload:
//   mask_bools: concatenated per-var boolean masks (1 byte per element)
//   values:     concatenated per-var float32 parameter values (same layout)
//   var_sizes:  element count per var, n_vars entries
//   tail:       raw bytes appended inside the same gzip stream after the
//               values section (the BN stats annex, stream/codec.py
//               STATS_MAGIC); tail_len 0 = no annex
// Layout matches run.py:316-333: all packed bitmasks first (byte-aligned per
// var, big-endian bit order like np.packbits), then all masked fp16 values.
// Returns compressed byte count, or -1 on error/overflow.
long ams_encode_delta2(const uint8_t* mask_bools, const float* values,
                       const long* var_sizes, int n_vars,
                       const uint8_t* tail, long tail_len,
                       uint8_t* out, long out_cap) {
    GzWriter w(out, out_cap);
    if (w.error) return -1;

    std::vector<uint8_t> packbuf;
    long off = 0;
    for (int v = 0; v < n_vars; ++v) {
        long n = var_sizes[v];
        long nbytes = (n + 7) / 8;
        packbuf.assign((size_t)nbytes, 0);
        const uint8_t* m = mask_bools + off;
        for (long i = 0; i < n; ++i)
            if (m[i]) packbuf[(size_t)(i >> 3)] |= (uint8_t)(0x80u >> (i & 7));
        w.push(packbuf.data(), (size_t)nbytes);
        if (w.error) return -1;
        off += n;
    }

    std::vector<uint16_t> halfbuf;
    off = 0;
    for (int v = 0; v < n_vars; ++v) {
        long n = var_sizes[v];
        const uint8_t* m = mask_bools + off;
        const float* val = values + off;
        halfbuf.clear();
        for (long i = 0; i < n; ++i)
            if (m[i]) halfbuf.push_back(f32_to_f16(val[i]));
        if (!halfbuf.empty())
            w.push(reinterpret_cast<const uint8_t*>(halfbuf.data()),
                   halfbuf.size() * 2);
        if (w.error) return -1;
        off += n;
    }
    if (tail_len > 0) {
        w.push(tail, (size_t)tail_len);
        if (w.error) return -1;
    }
    // finalize with empty input
    w.push(nullptr, 0, true);
    return w.error ? -1 : w.written;
}

// Pre-annex entry point, kept so a stale caller against a rebuilt library
// still links; equivalent to ams_encode_delta2 with an empty tail.
long ams_encode_delta(const uint8_t* mask_bools, const float* values,
                      const long* var_sizes, int n_vars,
                      uint8_t* out, long out_cap) {
    return ams_encode_delta2(mask_bools, values, var_sizes, n_vars,
                             nullptr, 0, out, out_cap);
}

}  // extern "C"
