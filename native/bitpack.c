/* Native bit-packing codec for NSC bitstream planes (SURVEY.md §3 #8).
 *
 * MSB-first fixed-width packing of int32 codebook indices <-> bytes,
 * mirroring nsc_tpu/bitstream.py's numpy path exactly (golden-byte tested
 * against it). This is the framework's native IO/runtime component: the
 * reference stack reaches native code for its data plumbing through
 * torch/C++; here the bitstream hot loop is C compiled per-host, loaded via
 * ctypes (no pybind11 in this environment), with the numpy path as fallback.
 *
 * Build: cc -O3 -shared -fPIC -o libnscbitpack.so bitpack.c  (see
 * nsc_tpu/native.py, which compiles lazily and caches the .so).
 */

#include <stdint.h>
#include <stddef.h>

/* pack `n` values of `bits` width (MSB-first) into out; returns bytes written */
long nsc_pack_plane(const int32_t *vals, long n, int bits, uint8_t *out) {
    long nbytes = (n * (long)bits + 7) / 8;
    uint64_t acc = 0;   /* bit accumulator, MSB-aligned stream */
    int nacc = 0;       /* bits currently in acc */
    long o = 0;
    for (long i = 0; i < n; i++) {
        acc = (acc << bits) | (uint32_t)vals[i];
        nacc += bits;
        while (nacc >= 8) {
            out[o++] = (uint8_t)(acc >> (nacc - 8));
            nacc -= 8;
        }
    }
    if (nacc > 0) {
        out[o++] = (uint8_t)(acc << (8 - nacc));
    }
    return nbytes == o ? nbytes : -1;
}

/* unpack `n` values of `bits` width from `in` into vals; returns n or -1 */
long nsc_unpack_plane(const uint8_t *in, long nbytes, long n, int bits,
                      int32_t *vals) {
    if ((n * (long)bits + 7) / 8 > nbytes) return -1;
    uint64_t acc = 0;
    int nacc = 0;
    long b = 0;
    uint32_t mask = (bits >= 32) ? 0xFFFFFFFFu : ((1u << bits) - 1u);
    for (long i = 0; i < n; i++) {
        while (nacc < bits) {
            acc = (acc << 8) | in[b++];
            nacc += 8;
        }
        vals[i] = (int32_t)((acc >> (nacc - bits)) & mask);
        nacc -= bits;
    }
    return n;
}

/* interleaved multi-plane pack: indices (frames, n_q) row-major ->
 * book-major planes, each byte-aligned. Returns total bytes or -1. */
long nsc_pack_frames(const int32_t *idx, long frames, int n_q, int bits,
                     uint8_t *out) {
    long per = (frames * (long)bits + 7) / 8;
    for (int q = 0; q < n_q; q++) {
        uint64_t acc = 0;
        int nacc = 0;
        long o = (long)q * per;
        for (long f = 0; f < frames; f++) {
            acc = (acc << bits) | (uint32_t)idx[f * n_q + q];
            nacc += bits;
            while (nacc >= 8) {
                out[o++] = (uint8_t)(acc >> (nacc - 8));
                nacc -= 8;
            }
        }
        if (nacc > 0) out[o++] = (uint8_t)(acc << (8 - nacc));
        if (o != (long)(q + 1) * per) return -1;
    }
    return (long)n_q * per;
}

long nsc_unpack_frames(const uint8_t *in, long nbytes, long frames, int n_q,
                       int bits, int32_t *idx) {
    long per = (frames * (long)bits + 7) / 8;
    if ((long)n_q * per > nbytes) return -1;
    uint32_t mask = (bits >= 32) ? 0xFFFFFFFFu : ((1u << bits) - 1u);
    for (int q = 0; q < n_q; q++) {
        uint64_t acc = 0;
        int nacc = 0;
        long b = (long)q * per;
        for (long f = 0; f < frames; f++) {
            while (nacc < bits) {
                acc = (acc << 8) | in[b++];
                nacc += 8;
            }
            idx[f * n_q + q] = (int32_t)((acc >> (nacc - bits)) & mask);
            nacc -= bits;
        }
    }
    return frames * (long)n_q;
}
