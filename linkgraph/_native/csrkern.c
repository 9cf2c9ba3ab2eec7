/* Single-pass counting-sort CSR kernels.
 *
 * The numpy CSR build (argsort of a composite key + two gathers) touches
 * ~40-56 bytes of FRESH heap per edge: the concat copies, the key, the
 * argsort output and the gathered columns.  On this host first-touch page
 * population of private anon memory is the documented non-scaling term of
 * the build (BASELINE.md), so bytes-populated IS the wall.  These kernels
 * replace the sort with the classic two-pass counting sort over the
 * already-populated exchange/plasma buffers: one read-only count pass and
 * one scatter pass whose only fresh allocation is the output adjacency
 * itself (8 B/edge, plus 8 B/edge of weights when present).
 *
 * Within-node adjacency order becomes arrival order instead of
 * dst-ascending.  Callers only use these kernels when edge weights are
 * integral (or elided), where every downstream reduction is exact and
 * order-free, and tie-breaks are id-based, so results are value-identical
 * to the sort path (tests/test_csrkern.py pins the parity; the numpy
 * path remains both the fallback and the semantics oracle).
 */
#include <stdint.h>

/* Count pass: counts[src[i]-lo]++ for in-range rows; returns the number
 * of OUT-OF-RANGE rows (callers raise when nonzero — a routed block must
 * only contain owned sources; a segfaulting scatter would be the
 * alternative). */
int64_t csr_count(const int64_t *src, int64_t n, int64_t lo,
                  int64_t n_local, int64_t *counts)
{
    int64_t bad = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t v = src[i] - lo;
        if (v < 0 || v >= n_local) { bad++; continue; }
        counts[v]++;
    }
    return bad;
}

/* Scatter pass (unweighted): out[cursor[src[i]-lo]++] = dst[i].
 * cursor must be a writable copy of indptr[:-1]; src was validated by
 * csr_count. */
void csr_scatter(const int64_t *src, const int64_t *dst, int64_t n,
                 int64_t lo, int64_t *cursor, int64_t *out)
{
    for (int64_t i = 0; i < n; i++)
        out[cursor[src[i] - lo]++] = dst[i];
}

/* Scatter pass carrying integral weights alongside. */
void csr_scatter_w(const int64_t *src, const int64_t *dst, const double *w,
                   int64_t n, int64_t lo, int64_t *cursor,
                   int64_t *out, double *outw)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t p = cursor[src[i] - lo]++;
        out[p] = dst[i];
        outw[p] = w[i];
    }
}
