/* Front-coding (DELTA_BYTE_ARRAY) decode hot loop.
 *
 * Reconstruction is inherently sequential (each value copies a prefix
 * of its predecessor), so the per-value loop lives here instead of
 * Python. No overlap: offsets[i] >= prev_start + prefix[i] always,
 * because prefix[i] <= len(value[i-1]).
 */
#include <string.h>

int dba_decode(const unsigned char *suffixes,
               long n,
               const long *offsets,
               const int *prefix,
               const int *suffix_lens,
               unsigned char *out)
{
    long spos = 0;
    long prev = 0;
    for (long i = 0; i < n; i++) {
        long start = offsets[i];
        int p = prefix[i];
        int sl = suffix_lens[i];
        if (p)
            memcpy(out + start, out + prev, (size_t)p);
        if (sl) {
            memcpy(out + start + p, suffixes + spos, (size_t)sl);
            spos += sl;
        }
        prev = start;
    }
    return 0;
}
