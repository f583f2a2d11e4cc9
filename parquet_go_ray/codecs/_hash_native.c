/* Segmented FNV-1a over variable-length byte slices: one uint64 hash
 * per [offsets[i], offsets[i+1]) segment. Sequential over the data
 * bytes — memory-bandwidth bound in C, a per-row Python loop otherwise.
 */
#include <stdint.h>

void fnv1a_segments(const unsigned char *data, const long *offsets, long n,
                    uint64_t *out)
{
    for (long i = 0; i < n; i++) {
        uint64_t h = 1469598103934665603ULL;
        for (long p = offsets[i]; p < offsets[i + 1]; p++)
            h = (h ^ (uint64_t)data[p]) * 1099511628211ULL;
        out[i] = h;
    }
}

/* Segmented XXH64 (seed 0) over variable-length byte slices — the hash
 * the parquet split-block bloom filter specifies. One uint64 per
 * [offsets[i], offsets[i+1]) segment. */
#define P64_1 0x9E3779B185EBCA87ULL
#define P64_2 0xC2B2AE3D27D4EB4FULL
#define P64_3 0x165667B19E3779F9ULL
#define P64_4 0x85EBCA77C2B2AE63ULL
#define P64_5 0x27D4EB2F165667C5ULL

static inline uint64_t rotl64(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t read64(const unsigned char *p) {
    uint64_t v;
    __builtin_memcpy(&v, p, 8);
    return v;
}

static inline uint32_t read32(const unsigned char *p) {
    uint32_t v;
    __builtin_memcpy(&v, p, 4);
    return v;
}

static inline uint64_t xxh_round(uint64_t acc, uint64_t x) {
    acc += x * P64_2;
    acc = rotl64(acc, 31);
    return acc * P64_1;
}

static uint64_t xxh64(const unsigned char *p, long len) {
    const unsigned char *end = p + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = P64_1 + P64_2, v2 = P64_2, v3 = 0, v4 = (uint64_t)0 - P64_1;
        const unsigned char *limit = end - 32;
        do {
            v1 = xxh_round(v1, read64(p)); p += 8;
            v2 = xxh_round(v2, read64(p)); p += 8;
            v3 = xxh_round(v3, read64(p)); p += 8;
            v4 = xxh_round(v4, read64(p)); p += 8;
        } while (p <= limit);
        h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
        h ^= xxh_round(0, v1); h = h * P64_1 + P64_4;
        h ^= xxh_round(0, v2); h = h * P64_1 + P64_4;
        h ^= xxh_round(0, v3); h = h * P64_1 + P64_4;
        h ^= xxh_round(0, v4); h = h * P64_1 + P64_4;
    } else {
        h = P64_5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        h ^= xxh_round(0, read64(p));
        h = rotl64(h, 27) * P64_1 + P64_4;
        p += 8;
    }
    if (p + 4 <= end) {
        h ^= (uint64_t)read32(p) * P64_1;
        h = rotl64(h, 23) * P64_2 + P64_3;
        p += 4;
    }
    while (p < end) {
        h ^= (uint64_t)(*p) * P64_5;
        h = rotl64(h, 11) * P64_1;
        p++;
    }
    h ^= h >> 33;
    h *= P64_2;
    h ^= h >> 29;
    h *= P64_3;
    h ^= h >> 32;
    return h;
}

void xxhash64_segments(const unsigned char *data, const long *offsets, long n,
                       uint64_t *out)
{
    for (long i = 0; i < n; i++)
        out[i] = xxh64(data + offsets[i], offsets[i + 1] - offsets[i]);
}

/* Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03), fused:
 * per doc, rolling k-byte FNV window hashes (bit-identical to
 * minhash_segments' windows: zero-padded at the doc's end, >=1 window
 * per doc), sliding-window-of-w minima via a monotonic deque (O(n),
 * where the numpy path materializes an n*w strided view), then SORTED
 * DISTINCT minima -- matching np.unique. out must have capacity for
 * every window; counts[d] = distinct fingerprints of doc d, written
 * contiguously into out. */
#include <stdlib.h>

static int cmp_u64(const void *a, const void *b)
{
    uint64_t x = *(const uint64_t *)a, y = *(const uint64_t *)b;
    return x < y ? -1 : (x > y ? 1 : 0);
}

void winnow_segments(const unsigned char *data, const long *offsets,
                     long n_docs, long k, long w,
                     uint64_t *out, long *counts)
{
    const uint64_t FNV = 1099511628211ULL;
    long max_win = 1;
    for (long d = 0; d < n_docs; d++) {
        long nw = offsets[d + 1] - offsets[d] - k + 1;
        if (nw > max_win) max_win = nw;
    }
    uint64_t *hbuf = (uint64_t *)malloc((size_t)max_win * sizeof(uint64_t));
    long *deque = (long *)malloc((size_t)max_win * sizeof(long));
    uint64_t *op = out;
    for (long d = 0; d < n_docs; d++) {
        long s = offsets[d], e = offsets[d + 1];
        long nwin = e - s - k + 1;
        if (nwin < 1) nwin = 1;
        for (long i = 0; i < nwin; i++) {
            long g = s + i;
            uint64_t h = (g < e) ? data[g] : 0;
            for (long j = 1; j < k; j++)
                h = h * FNV + ((g + j < e) ? data[g + j] : 0);
            hbuf[i] = h;
        }
        uint64_t *seg = op;
        if (nwin <= w) {
            uint64_t m = hbuf[0];
            for (long i = 1; i < nwin; i++)
                if (hbuf[i] < m) m = hbuf[i];
            *op++ = m;
        } else {
            long head = 0, tail = 0;  /* deque of indices, increasing h */
            for (long i = 0; i < nwin; i++) {
                while (tail > head && hbuf[deque[tail - 1]] >= hbuf[i])
                    tail--;
                deque[tail++] = i;
                if (deque[head] <= i - w) head++;
                if (i >= w - 1) *op++ = hbuf[deque[head]];
            }
        }
        long n = op - seg;
        qsort(seg, (size_t)n, sizeof(uint64_t), cmp_u64);
        long m = 0;
        for (long i = 0; i < n; i++)
            if (i == 0 || seg[i] != seg[m - 1]) seg[m++] = seg[i];
        counts[d] = m;
        op = seg + m;
    }
    free(hbuf);
    free(deque);
}

/* SimHash bit accumulation: per doc, sum +-1 per token-hash bit and set
 * the sign bit. tok_starts has n_docs+1 entries indexing into h. The
 * 64-lane inner loop autovectorizes under -O3. */
void simhash_accumulate(const uint64_t *h, const long *tok_starts,
                        long n_docs, uint64_t *out)
{
    for (long d = 0; d < n_docs; d++) {
        long s = tok_starts[d], e = tok_starts[d + 1];
        long acc[64];
        for (int b = 0; b < 64; b++) acc[b] = 0;
        for (long i = s; i < e; i++) {
            uint64_t x = h[i];
            for (int b = 0; b < 64; b++)
                acc[b] += (long)((x >> b) & 1) * 2 - 1;
        }
        uint64_t r = 0;
        for (int b = 0; b < 64; b++)
            if (acc[b] > 0) r |= (uint64_t)1 << b;
        out[d] = r;
    }
}

/* Fully fused MinHash over k-byte FNV shingles: one pass over the
 * concatenated doc bytes, no materialized window/hash arrays (the
 * numpy path allocates several n_shingles*8B temporaries -- ~0.5 GB per
 * 60 MB of text -- whose first-touch page faults dominate its runtime).
 * Bit-identical to the numpy path: window w0 = byte, then w = w*FNV+byte
 * over the next k-1 bytes, zero-padded at the DOC's end (a window
 * never reads a neighboring document's bytes -- short-doc hashes must
 * not depend on batch composition); per permutation p, min over
 * (w*a[p]+b[p]) & MERSENNE61. */
void minhash_segments(const unsigned char *data, long buflen,
                      const long *offsets, long n_docs, long k,
                      const uint64_t *a, const uint64_t *b, long num_perm,
                      uint64_t *out)
{
    const uint64_t MERSENNE = ((uint64_t)1 << 61) - 1;
    const uint64_t FNV = 1099511628211ULL;
    for (long d = 0; d < n_docs; d++) {
        long s = offsets[d], e = offsets[d + 1];
        long nwin = e - s - k + 1;
        if (nwin < 1) nwin = 1;
        uint64_t *row = out + d * num_perm;
        for (long p = 0; p < num_perm; p++) row[p] = (uint64_t)-1;
        for (long i = 0; i < nwin; i++) {
            long g = s + i;
            uint64_t w = (g < e) ? data[g] : 0;
            for (long j = 1; j < k; j++) {
                uint64_t c = (g + j < e) ? data[g + j] : 0;
                w = w * FNV + c;
            }
            for (long p = 0; p < num_perm; p++) {
                uint64_t h = (w * a[p] + b[p]) & MERSENNE;
                if (h < row[p]) row[p] = h;
            }
        }
    }
}
