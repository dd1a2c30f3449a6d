/* Native adaptive arithmetic coder for NSC entropy-coded planes.
 *
 * Byte-identical mirror of nsc_tpu/entropy.py (CACM87-style 32-bit coder,
 * adaptive counts: Laplace init 1, +32 per symbol, cumulative table rebuilt
 * every `rebuild` symbols, counts halved (ceil) when their sum crosses
 * `rescale_at` at a rebuild point). The Python implementation is the
 * specification; tests/unit/test_native_entropy.py asserts byte equality
 * and cross-decoding both ways on random and skewed planes.
 *
 * This is the framework's native entropy-codec component (SURVEY.md §3 #8
 * noted EnCodec-style arithmetic coding as the family-typical extra stage):
 * the pure-Python coder runs ~1e5 symbols/s, this runs ~1e7+ — the
 * difference between entropy coding being an offline-only option and a
 * usable part of the serving path.
 *
 * Built together with bitpack.c into libnscbitpack.so (see nsc_tpu/native.py).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define AC_FULL 0xFFFFFFFFull
#define AC_HALF 0x80000000ull
#define AC_Q1   0x40000000ull
#define AC_Q3   0xC0000000ull

typedef struct {
    int64_t *counts;  /* k */
    int64_t *cum;     /* k + 1 */
    int64_t total;
    int k;
    long pending;
    long rebuild;
    long rescale_at;
} ac_model;

static int ac_model_init(ac_model *m, int k, long rebuild, long rescale_at) {
    m->counts = (int64_t *)malloc(sizeof(int64_t) * (size_t)k);
    m->cum = (int64_t *)malloc(sizeof(int64_t) * ((size_t)k + 1));
    if (!m->counts || !m->cum) {
        free(m->counts);
        free(m->cum);
        return -1;
    }
    for (int i = 0; i < k; i++) m->counts[i] = 1;
    m->k = k;
    m->pending = 0;
    m->rebuild = rebuild;
    m->rescale_at = rescale_at;
    m->cum[0] = 0;
    for (int i = 0; i < k; i++) m->cum[i + 1] = m->cum[i] + m->counts[i];
    m->total = m->cum[k];
    return 0;
}

static void ac_model_free(ac_model *m) {
    free(m->counts);
    free(m->cum);
}

static void ac_model_rebuild(ac_model *m) {
    m->cum[0] = 0;
    for (int i = 0; i < m->k; i++) m->cum[i + 1] = m->cum[i] + m->counts[i];
    m->total = m->cum[m->k];
}

static void ac_model_update(ac_model *m, int s) {
    m->counts[s] += 32;
    m->pending += 1;
    if (m->pending >= m->rebuild) {
        m->pending = 0;
        int64_t sum = 0;
        for (int i = 0; i < m->k; i++) sum += m->counts[i];
        if (sum > m->rescale_at) {
            for (int i = 0; i < m->k; i++)
                m->counts[i] = (m->counts[i] + 1) >> 1;  /* ceil-halve, >=1 */
        }
        ac_model_rebuild(m);
    }
}

/* largest s with cum[s] <= value  (np.searchsorted(cum, v, 'right') - 1) */
static int ac_model_find(const ac_model *m, int64_t value) {
    int lo = 0, hi = m->k + 1; /* upper_bound over cum[0..k] */
    while (lo < hi) {
        int mid = (lo + hi) >> 1;
        if (m->cum[mid] <= value) lo = mid + 1; else hi = mid;
    }
    return lo - 1;
}

typedef struct {
    uint8_t *out;
    long cap;
    long o;
    unsigned acc;
    int nacc;
    int overflow;
} bitw;

static void bw_bit(bitw *w, int b) {
    w->acc = (w->acc << 1) | (unsigned)b;
    if (++w->nacc == 8) {
        if (w->o < w->cap) w->out[w->o++] = (uint8_t)w->acc;
        else w->overflow = 1;
        w->acc = 0;
        w->nacc = 0;
    }
}

static void bw_bit_pending(bitw *w, int b, long pending) {
    bw_bit(w, b);
    int inv = b ^ 1;
    for (long i = 0; i < pending; i++) bw_bit(w, inv);
}

static long bw_finish(bitw *w) {
    while (w->nacc) bw_bit(w, 0);
    return w->overflow ? -1 : w->o;
}

/* returns coded byte length, or -1 on error/overflow */
long nsc_ac_encode_plane(const int32_t *syms, long n, int k,
                         long rebuild, long rescale_at,
                         uint8_t *out, long out_cap) {
    ac_model m;
    if (k < 1 || ac_model_init(&m, k, rebuild, rescale_at)) return -1;
    bitw w = {out, out_cap, 0, 0, 0, 0};
    uint64_t low = 0, high = AC_FULL;
    long pending = 0;
    for (long i = 0; i < n; i++) {
        int s = syms[i];
        if (s < 0 || s >= k) { ac_model_free(&m); return -1; }
        uint64_t span = high - low + 1;
        int64_t c_lo = m.cum[s], c_hi = m.cum[s + 1], tot = m.total;
        high = low + span * (uint64_t)c_hi / (uint64_t)tot - 1;
        low = low + span * (uint64_t)c_lo / (uint64_t)tot;
        for (;;) {
            if (high < AC_HALF) {
                bw_bit_pending(&w, 0, pending); pending = 0;
            } else if (low >= AC_HALF) {
                bw_bit_pending(&w, 1, pending); pending = 0;
                low -= AC_HALF; high -= AC_HALF;
            } else if (low >= AC_Q1 && high < AC_Q3) {
                pending += 1; low -= AC_Q1; high -= AC_Q1;
            } else {
                break;
            }
            low <<= 1;
            high = (high << 1) + 1;
        }
        ac_model_update(&m, s);
    }
    pending += 1;
    if (low < AC_Q1) bw_bit_pending(&w, 0, pending);
    else bw_bit_pending(&w, 1, pending);
    ac_model_free(&m);
    return bw_finish(&w);
}

typedef struct {
    const uint8_t *data;
    long nbytes;
    long pos;
    unsigned acc;
    int nacc;
} bitr;

static int br_bit(bitr *r) {
    if (r->nacc == 0) {
        r->acc = (r->pos < r->nbytes) ? r->data[r->pos++] : 0;
        r->nacc = 8;
    }
    r->nacc -= 1;
    return (int)((r->acc >> r->nacc) & 1u);
}

/* returns n, or -1 on error */
long nsc_ac_decode_plane(const uint8_t *data, long nbytes, long n, int k,
                         long rebuild, long rescale_at, int32_t *out) {
    ac_model m;
    if (k < 1 || ac_model_init(&m, k, rebuild, rescale_at)) return -1;
    bitr r = {data, nbytes, 0, 0, 0};
    uint64_t low = 0, high = AC_FULL, value = 0;
    for (int i = 0; i < 32; i++) value = (value << 1) | (uint64_t)br_bit(&r);
    for (long i = 0; i < n; i++) {
        uint64_t span = high - low + 1;
        int64_t tot = m.total;
        int64_t scaled =
            (int64_t)(((value - low + 1) * (uint64_t)tot - 1) / span);
        int s = ac_model_find(&m, scaled);
        int64_t c_lo = m.cum[s], c_hi = m.cum[s + 1];
        high = low + span * (uint64_t)c_hi / (uint64_t)tot - 1;
        low = low + span * (uint64_t)c_lo / (uint64_t)tot;
        for (;;) {
            if (high < AC_HALF) {
                /* nothing */
            } else if (low >= AC_HALF) {
                low -= AC_HALF; high -= AC_HALF; value -= AC_HALF;
            } else if (low >= AC_Q1 && high < AC_Q3) {
                low -= AC_Q1; high -= AC_Q1; value -= AC_Q1;
            } else {
                break;
            }
            low <<= 1;
            high = (high << 1) + 1;
            value = (value << 1) + (uint64_t)br_bit(&r);
        }
        out[i] = (int32_t)s;
        ac_model_update(&m, s);
    }
    ac_model_free(&m);
    return n;
}
