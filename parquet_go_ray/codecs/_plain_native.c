/* PLAIN BYTE_ARRAY decode hot loops.
 *
 * Each value is a 4-byte LE length prefix + bytes, so the position of
 * length word i depends on every previous length — the scan is
 * inherently sequential and lives here instead of a Python loop.
 */
#include <stdint.h>
#include <string.h>

/* Fill offsets[0..n] (cumulative value lengths); returns the number of
 * input bytes consumed, or -1 on overrun. */
long plain_ba_offsets(const unsigned char *buf, long buflen, long n,
                      long *offsets)
{
    long pos = 0;
    offsets[0] = 0;
    for (long i = 0; i < n; i++) {
        uint32_t ln;
        if (pos + 4 > buflen)
            return -1;
        memcpy(&ln, buf + pos, 4); /* little-endian hosts only */
        pos += 4 + (long)ln;
        if (pos > buflen)
            return -1;
        offsets[i + 1] = offsets[i] + (long)ln;
    }
    return pos;
}

/* Compact the value bytes (dropping the length words) into out, which
 * must hold offsets[n] bytes. */
long plain_ba_compact(const unsigned char *buf, long n, const long *offsets,
                      unsigned char *out)
{
    long pos = 0;
    for (long i = 0; i < n; i++) {
        long ln = offsets[i + 1] - offsets[i];
        memcpy(out + offsets[i], buf + pos + 4, (size_t)ln);
        pos += 4 + ln;
    }
    return pos;
}
