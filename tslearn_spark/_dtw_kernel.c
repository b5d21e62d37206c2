/* Banded / unconstrained DTW over a batch of variable-length pairs.
 *
 * Scalar C twin of kernels.dtw_banded_batch_mixed /
 * dtw_full_batch_mixed: the same DP, evaluated pair-at-a-time instead
 * of lane-vectorized across the batch.  BIT-IDENTICAL to the numpy
 * kernels on the non-abandoned path — the per-cell float association
 * is replicated exactly:
 *
 *   the numpy kernels vectorize the in-row `left` dependence with the
 *   prefix identity  row[k] = s[k] + min_{j<=k}(a[j] - s[j])  where
 *   s = inclusive cumsum(Dw) and a[k] = Dw[k] + min(up, diag); this
 *   file computes the SAME expressions in the SAME order (sequential
 *   running sum s, running min m of (a - s), row[k] = s + m), so every
 *   intermediate double rounds identically.  min/sqrt are exact IEEE
 *   ops; compile with -ffp-contract=off so no FMA re-rounds the
 *   subtract-square local cost.
 *
 * tau2 early abandon: a pair whose running band minimum exceeds its
 * cap is reported +inf immediately (the numpy kernel defers the inf
 * until a batch compaction fires, so it sometimes returns the true
 * value instead — callers treat both as "provably worse than the
 * current top-k", and tests pin that either answer is accepted).
 *
 * radius < 0 means unconstrained (full window): wlo/whi are set so
 * cur_lo == 0 and hi == lb-1 on every row, which reduces the
 * recurrence to _dtw_full_core's exactly.
 */
#include <math.h>
#include <stdlib.h>

void dtw_batch(const double *bufA, const long long *offA, const long long *lenA,
               const double *bufB, const long long *offB, const long long *lenB,
               long long n, long long d, long long radius,
               const double *tau2, double *out)
{
    long long wmax = 1, p;
    for (p = 0; p < n; p++) {
        long long la = lenA[p], lb = lenB[p], wlo, whi, W;
        if (radius < 0) { wlo = la; whi = lb; }
        else if (la > lb) { wlo = la - lb + radius; whi = radius; }
        else { wlo = radius; whi = lb - la + radius; }
        W = wlo + whi + 1;
        if (W > lb) W = lb;
        if (W > wmax) wmax = W;
    }
    double *prev = (double *) malloc((size_t) wmax * sizeof(double));
    double *row = (double *) malloc((size_t) wmax * sizeof(double));
    if (prev == NULL || row == NULL) {
        /* signal the wrapper to fall back to the numpy path */
        for (p = 0; p < n; p++) out[p] = -1.0;
        free(prev);
        free(row);
        return;
    }
    for (p = 0; p < n; p++) {
        const double *A = bufA + offA[p];
        const double *B = bufB + offB[p];
        long long la = lenA[p], lb = lenB[p], wlo, whi;
        if (radius < 0) { wlo = la; whi = lb; }
        else if (la > lb) { wlo = la - lb + radius; whi = radius; }
        else { wlo = radius; whi = lb - la + radius; }
        double cap = tau2 != NULL ? tau2[p] : INFINITY;
        double result = INFINITY;
        long long prev_lo = 0, prev_w = -1, i;
        for (i = 0; i < la; i++) {
            long long cur_lo = i - wlo;
            if (cur_lo < 0) cur_lo = 0;
            long long hi = i + whi;
            if (hi > lb - 1) hi = lb - 1;
            long long width = hi - cur_lo; /* inclusive lanes [0, width] */
            if (width < 0) { /* fully out-of-band row: all lanes dead */
                prev_lo = cur_lo;
                prev_w = -1;
                continue;
            }
            long long shift = cur_lo - prev_lo, k;
            double s = 0.0;
            if (i == 0) {
                /* row 0: row = cumsum(Dw), like the numpy i==0 branch.
                 * (A row after a fully-dead row — unreachable with
                 * valid bands — falls into the i>0 branch, where every
                 * prev read hits the inf bound and the row propagates
                 * inf, exactly like the numpy kernel.) */
                for (k = 0; k <= width; k++) {
                    double dw;
                    if (d == 1) {
                        double t = A[i] - B[cur_lo + k];
                        dw = t * t;
                    } else {
                        long long dim;
                        dw = 0.0;
                        for (dim = 0; dim < d; dim++) {
                            double t = A[i * d + dim]
                                - B[(cur_lo + k) * d + dim];
                            dw += t * t;
                        }
                    }
                    s += dw;
                    row[k] = s;
                }
            } else {
                double m = INFINITY;
                for (k = 0; k <= width; k++) {
                    double dw;
                    if (d == 1) {
                        double t = A[i] - B[cur_lo + k];
                        dw = t * t;
                    } else {
                        long long dim;
                        dw = 0.0;
                        for (dim = 0; dim < d; dim++) {
                            double t = A[i * d + dim]
                                - B[(cur_lo + k) * d + dim];
                            dw += t * t;
                        }
                    }
                    /* up = prev lane k+shift, diag = prev lane
                     * k+shift-1; out-of-range prev lanes are the inf
                     * pad of the numpy P/Q construction */
                    long long ju = k + shift, jd = ju - 1;
                    double up = (ju >= 0 && ju <= prev_w) ? prev[ju]
                                                          : INFINITY;
                    double dg = (jd >= 0 && jd <= prev_w) ? prev[jd]
                                                          : INFINITY;
                    double mn = up < dg ? up : dg;
                    double a = dw + mn;
                    s += dw;
                    double t = a - s;
                    if (t < m) m = t;
                    row[k] = s + m;
                }
            }
            if (i + 1 == la) {
                result = row[lb - 1 - cur_lo];
                break;
            }
            if (tau2 != NULL) {
                double rmin = INFINITY;
                for (k = 0; k <= width; k++)
                    if (row[k] < rmin) rmin = row[k];
                if (rmin > cap) { result = INFINITY; break; }
            }
            double *tmp = prev;
            prev = row;
            row = tmp;
            prev_lo = cur_lo;
            prev_w = width;
        }
        out[p] = sqrt(result);
    }
    free(prev);
    free(row);
}
