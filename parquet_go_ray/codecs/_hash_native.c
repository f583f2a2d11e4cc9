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
