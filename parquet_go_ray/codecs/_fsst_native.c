/* FSST greedy tokenizer hot loop (optional native path).
 *
 * Compiled at runtime with the system compiler when available (see
 * fsst.py::_native); the vectorized numpy implementation remains the
 * reference/fallback. Wire format is identical: per-input-BLOCK code
 * lengths + code stream (escape 255 + literal byte).
 */
#include <stdint.h>
#include <string.h>

#define MAX_SYMS 255
#define ESCAPE 255
#define BLOCK 4096

/* encode: greedy longest-match per position, matches never cross a
 * BLOCK boundary. Returns 0 on success. */
int fsst_encode(const uint8_t *data, int64_t n,
                const uint8_t *sym_bytes, /* MAX_SYMS * 8, padded */
                const uint8_t *sym_lens,  /* MAX_SYMS */
                int32_t n_syms,
                uint8_t *out,            /* capacity >= 2*n */
                int64_t *out_len,
                int64_t *block_lens,     /* capacity >= n/BLOCK + 1 */
                int64_t *n_blocks)
{
    /* per-2-byte-prefix chains of symbols with len >= 2, longest first */
    static const int32_t NONE = -1;
    int32_t head[65536];
    int32_t nxt[MAX_SYMS];
    int16_t l1[256];
    uint64_t sym_word[MAX_SYMS], sym_mask[MAX_SYMS];
    int32_t i;
    int len;
    /* FSST-paper shortCodes split: len-2 symbols resolve via ONE
     * direct-table load (best2); hash chains hold only len>=3 symbols,
     * so the common position never walks a chain at all. */
    int16_t best2[65536];
    memset(l1, -1, sizeof(l1));
    memset(best2, -1, sizeof(best2));
    for (i = 0; i < 65536; i++) head[i] = NONE;
    /* insert ascending by length so each chain ends longest-first */
    for (len = 3; len <= 8; len++) {
        for (i = 0; i < n_syms; i++) {
            if (sym_lens[i] != len) continue;
            int p = sym_bytes[i * 8] | (sym_bytes[i * 8 + 1] << 8);
            nxt[i] = head[p];
            head[p] = i;
        }
    }
    for (i = 0; i < n_syms; i++)
        if (sym_lens[i] == 2)
            best2[sym_bytes[i * 8] | (sym_bytes[i * 8 + 1] << 8)] = (int16_t)i;
    for (i = 0; i < n_syms; i++)
        if (sym_lens[i] == 1) l1[sym_bytes[i * 8]] = (int16_t)i;
#if !defined(__BYTE_ORDER__) || __BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__
    /* FSST-paper probe: one masked 64-bit compare per chain entry
     * instead of a memcmp call (symbols are stored zero-padded to 8
     * bytes; on little-endian a low-bytes mask keeps the first l
     * bytes). ~2x on html/text chunks. */
    const int use_words = 1;
#else
    const int use_words = 0;
#endif
    for (i = 0; i < n_syms; i++) {
        uint64_t w;
        memcpy(&w, sym_bytes + i * 8, 8);
        uint64_t m = sym_lens[i] >= 8
                         ? ~(uint64_t)0
                         : (((uint64_t)1 << (8 * sym_lens[i])) - 1);
        sym_mask[i] = m;
        sym_word[i] = w & m;
    }

    int64_t pos = 0, o = 0, nb = 0;
    while (pos < n) {
        int64_t block_end = pos + BLOCK;
        if (block_end > n) block_end = n;
        int64_t o_start = o;
        while (pos < block_end) {
            int64_t rem = block_end - pos;
            int best = -1, blen = 0;
            if (rem >= 2) {
                int p = data[pos] | (data[pos + 1] << 8);
                int32_t s = head[p];
                if (s != NONE) {
                    if (use_words) {
                        uint64_t w;
                        if (rem >= 8) {
                            memcpy(&w, data + pos, 8);
                        } else {
                            /* zero-padded tail load: symbols longer
                             * than rem are rejected by the length
                             * check, and shorter masks only see real
                             * bytes */
                            w = 0;
                            memcpy(&w, data + pos, (size_t)rem);
                        }
                        while (s != NONE) {
                            int l = sym_lens[s];
                            if (l <= rem && (w & sym_mask[s]) == sym_word[s]) {
                                best = s; blen = l; break;
                            }
                            s = nxt[s];
                        }
                    } else {
                        while (s != NONE) {
                            int l = sym_lens[s];
                            if (l <= rem &&
                                memcmp(data + pos, sym_bytes + s * 8, l) == 0) {
                                best = s; blen = l; break;
                            }
                            s = nxt[s];
                        }
                    }
                }
                if (best < 0 && best2[p] >= 0) { best = best2[p]; blen = 2; }
            }
            if (best < 0 && l1[data[pos]] >= 0) { best = l1[data[pos]]; blen = 1; }
            if (best >= 0) {
                out[o++] = (uint8_t)best;
                pos += blen;
            } else {
                out[o++] = ESCAPE;
                out[o++] = data[pos];
                pos += 1;
            }
        }
        block_lens[nb++] = o - o_start;
    }
    *out_len = o;
    *n_blocks = nb;
    return 0;
}

/* decode a code stream (without the block-length header) */
int fsst_decode(const uint8_t *codes, int64_t n,
                const uint8_t *sym_bytes, const uint8_t *sym_lens,
                int32_t n_syms,
                uint8_t *out, int64_t out_cap, int64_t *out_len)
{
    int64_t i = 0, o = 0;
    while (i < n) {
        uint8_t c = codes[i];
        if (c == ESCAPE) {
            if (i + 1 >= n || o + 1 > out_cap) return 1;
            out[o++] = codes[i + 1];
            i += 2;
        } else {
            if (c >= n_syms) return 2;
            int l = sym_lens[c];
            if (o + l > out_cap) return 1;
            memcpy(out + o, sym_bytes + c * 8, l);
            o += l;
            i += 1;
        }
    }
    *out_len = o;
    return 0;
}
