// Native bit-exact LD finisher: f64 D'/r^2 from integer haplotype counts.
//
// This is the hot host-side stage of every file-writing tool path: the
// device returns exact int32 co-occurrence counts and the host must replay
// the reference's Python-f64 operation order (reference backend/
// calc_ld.py:50-97; see ld_tools_tpu/ops/exact.py for the derivation) to
// get bit-matching values before 4-dp rounding.  numpy does this ~50x
// slower than necessary (a dozen full-matrix temporaries through memory);
// here each cell is finished in registers in one pass.
//
// IEEE parity contract: every operation below is a plain IEEE-754 double
// op in the same order numpy executes them.  The build MUST NOT allow
// FMA contraction or fast-math value changes — the ctypes builder passes
// -ffp-contract=off and no -ffast-math/-march flags (an fused
// p_ab - p1*p2 would differ from numpy in the last ulp and break
// bit-parity with the reference).
//
// Entry points (flat C API for ctypes):
//   ef_finish_block : (nr x nc) outer-product layout — c1_rows[i] pairs
//                     with c1_cols[j] for cell (i, j).
//   ef_finish_pairs : elementwise layout — pair k is c1_a[k] vs c1_b[k]
//                     (the streamed scan's hit refinish).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct Cell {
    double r2, dp;
    bool r2_iz, dp_iz;
};

// One pair's finish, numpy op order (ops/exact.py exact_ld_from_counts).
static inline Cell finish_cell(double p_ab, double p1, double q1,
                               double p2, double q2) {
    const double d = p_ab - p1 * p2;
    const double den_pos = std::min(p1 * q2, q1 * p2);
    const double den_neg = std::max((-p1) * p2, (-q1) * q2);
    const double den = d >= 0.0 ? den_pos : den_neg;
    Cell out;
    if (den == 0.0) {
        out.dp = 0.0;
        out.dp_iz = true;
    } else {
        out.dp = d / den;
        out.dp_iz = false;
    }
    if (out.dp == 0.0) {
        out.r2 = 0.0;
        out.r2_iz = true;
    } else {
        const double r2_den = ((p1 * q1) * p2) * q2;
        out.r2 = (d * d) / r2_den;
        out.r2_iz = false;
    }
    return out;
}

static void block_rows(const int32_t* c_ab, const double* c1_rows,
                       const double* c1_cols, double n, int64_t nc,
                       int64_t r0, int64_t r1, double* r2, double* dp,
                       uint8_t* r2_iz, uint8_t* dp_iz) {
    std::vector<double> p2(nc), q2(nc);
    for (int64_t j = 0; j < nc; ++j) {
        p2[j] = c1_cols[j] / n;
        q2[j] = (n - c1_cols[j]) / n;
    }
    for (int64_t i = r0; i < r1; ++i) {
        const double p1 = c1_rows[i] / n;
        const double q1 = (n - c1_rows[i]) / n;
        const int32_t* row = c_ab + i * nc;
        double* r2_row = r2 + i * nc;
        double* dp_row = dp + i * nc;
        uint8_t* r2z_row = r2_iz + i * nc;
        uint8_t* dpz_row = dp_iz + i * nc;
        for (int64_t j = 0; j < nc; ++j) {
            const Cell c = finish_cell(static_cast<double>(row[j]) / n,
                                       p1, q1, p2[j], q2[j]);
            r2_row[j] = c.r2;
            dp_row[j] = c.dp;
            r2z_row[j] = c.r2_iz ? 1 : 0;
            dpz_row[j] = c.dp_iz ? 1 : 0;
        }
    }
}

// Measure-only variant for the streamed TABLE path: emit ONE measure,
// already 4-dp rounded (round4 fast path fused in), plus the int-0
// sentinel and the "risky" near-tie flag.  Halves the output traffic
// (10 B/cell vs 18) and folds the separate round pass away; the value
// math is the identical op-order subset of finish_cell, so results stay
// bit-equal to the full finish + round4.
static void block_rows_measure(const int32_t* c_ab, const double* c1_rows,
                               const double* c1_cols, double n, int64_t nc,
                               int32_t sel, int64_t r0, int64_t r1,
                               double* rounded, uint8_t* iz, uint8_t* risky) {
    std::vector<double> p2(nc), q2(nc);
    for (int64_t j = 0; j < nc; ++j) {
        p2[j] = c1_cols[j] / n;
        q2[j] = (n - c1_cols[j]) / n;
    }
    for (int64_t i = r0; i < r1; ++i) {
        const double p1 = c1_rows[i] / n;
        const double q1 = (n - c1_rows[i]) / n;
        const int32_t* row = c_ab + i * nc;
        double* out_row = rounded + i * nc;
        uint8_t* iz_row = iz + i * nc;
        uint8_t* risky_row = risky + i * nc;
        for (int64_t j = 0; j < nc; ++j) {
            const Cell c = finish_cell(static_cast<double>(row[j]) / n,
                                       p1, q1, p2[j], q2[j]);
            const double v = sel == 0 ? c.r2 : c.dp;
            const bool v_iz = sel == 0 ? c.r2_iz : c.dp_iz;
            const double y = v * 1e4;
            const double m = std::nearbyint(y);
            out_row[j] = v_iz ? 0.0 : m / 1e4;
            iz_row[j] = v_iz ? 1 : 0;
            risky_row[j] =
                (!v_iz && std::fabs(std::fabs(y - m) - 0.5) < 1e-6) ? 1 : 0;
        }
    }
}

// Both measures, rounded, in ONE pass: the columnar-heatmap path needs
// r^2 AND D' of every cell; two single-measure passes repeat the shared
// finish_cell work (and stream the count block through memory twice).
static void block_rows_measures2(const int32_t* c_ab, const double* c1_rows,
                                 const double* c1_cols, double n, int64_t nc,
                                 int64_t r0, int64_t r1,
                                 double* r2r, uint8_t* r2_iz,
                                 uint8_t* r2_risky, double* dpr,
                                 uint8_t* dp_iz, uint8_t* dp_risky) {
    std::vector<double> p2(nc), q2(nc);
    for (int64_t j = 0; j < nc; ++j) {
        p2[j] = c1_cols[j] / n;
        q2[j] = (n - c1_cols[j]) / n;
    }
    for (int64_t i = r0; i < r1; ++i) {
        const double p1 = c1_rows[i] / n;
        const double q1 = (n - c1_rows[i]) / n;
        const int32_t* row = c_ab + i * nc;
        const int64_t off = i * nc;
        for (int64_t j = 0; j < nc; ++j) {
            const Cell c = finish_cell(static_cast<double>(row[j]) / n,
                                       p1, q1, p2[j], q2[j]);
            const double yr = c.r2 * 1e4;
            const double mr = std::nearbyint(yr);
            r2r[off + j] = c.r2_iz ? 0.0 : mr / 1e4;
            r2_iz[off + j] = c.r2_iz ? 1 : 0;
            r2_risky[off + j] =
                (!c.r2_iz && std::fabs(std::fabs(yr - mr) - 0.5) < 1e-6)
                    ? 1 : 0;
            const double yd = c.dp * 1e4;
            const double md = std::nearbyint(yd);
            dpr[off + j] = c.dp_iz ? 0.0 : md / 1e4;
            dp_iz[off + j] = c.dp_iz ? 1 : 0;
            dp_risky[off + j] =
                (!c.dp_iz && std::fabs(std::fabs(yd - md) - 0.5) < 1e-6)
                    ? 1 : 0;
        }
    }
}

}  // namespace

extern "C" {

void ef_finish_block_measures2(const int32_t* c_ab, const double* c1_rows,
                               const double* c1_cols, double n, int64_t nr,
                               int64_t nc, double* r2r, uint8_t* r2_iz,
                               uint8_t* r2_risky, double* dpr,
                               uint8_t* dp_iz, uint8_t* dp_risky,
                               int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    const int64_t want =
        std::min<int64_t>(n_threads, std::max<int64_t>(nr, 1));
    if (want <= 1 || nr * nc < (1 << 18)) {
        block_rows_measures2(c_ab, c1_rows, c1_cols, n, nc, 0, nr, r2r,
                             r2_iz, r2_risky, dpr, dp_iz, dp_risky);
        return;
    }
    std::vector<std::thread> pool;
    const int64_t step = (nr + want - 1) / want;
    for (int64_t t = 0; t < want; ++t) {
        const int64_t r0 = t * step;
        const int64_t r1 = std::min(nr, r0 + step);
        if (r0 >= r1) break;
        pool.emplace_back(block_rows_measures2, c_ab, c1_rows, c1_cols, n,
                          nc, r0, r1, r2r, r2_iz, r2_risky, dpr, dp_iz,
                          dp_risky);
    }
    for (auto& th : pool) th.join();
}

void ef_finish_block_measure(const int32_t* c_ab, const double* c1_rows,
                             const double* c1_cols, double n, int64_t nr,
                             int64_t nc, int32_t sel, double* rounded,
                             uint8_t* iz, uint8_t* risky,
                             int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    const int64_t want =
        std::min<int64_t>(n_threads, std::max<int64_t>(nr, 1));
    if (want <= 1 || nr * nc < (1 << 18)) {
        block_rows_measure(c_ab, c1_rows, c1_cols, n, nc, sel, 0, nr,
                           rounded, iz, risky);
        return;
    }
    std::vector<std::thread> pool;
    const int64_t step = (nr + want - 1) / want;
    for (int64_t t = 0; t < want; ++t) {
        const int64_t r0 = t * step;
        const int64_t r1 = std::min(nr, r0 + step);
        if (r0 >= r1) break;
        pool.emplace_back(block_rows_measure, c_ab, c1_rows, c1_cols, n, nc,
                          sel, r0, r1, rounded, iz, risky);
    }
    for (auto& th : pool) th.join();
}

void ef_finish_block(const int32_t* c_ab, const double* c1_rows,
                     const double* c1_cols, double n, int64_t nr, int64_t nc,
                     double* r2, double* dp, uint8_t* r2_iz, uint8_t* dp_iz,
                     int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    const int64_t want = std::min<int64_t>(n_threads, std::max<int64_t>(nr, 1));
    if (want <= 1 || nr * nc < (1 << 18)) {
        block_rows(c_ab, c1_rows, c1_cols, n, nc, 0, nr, r2, dp, r2_iz, dp_iz);
        return;
    }
    std::vector<std::thread> pool;
    const int64_t step = (nr + want - 1) / want;
    for (int64_t t = 0; t < want; ++t) {
        const int64_t r0 = t * step;
        const int64_t r1 = std::min(nr, r0 + step);
        if (r0 >= r1) break;
        pool.emplace_back(block_rows, c_ab, c1_rows, c1_cols, n, nc, r0, r1,
                          r2, dp, r2_iz, dp_iz);
    }
    for (auto& th : pool) th.join();
}

// One-pass round(x, 4) fast path (ops/exact.round4): out = rint(x*1e4)/1e4
// with half-to-even (nearbyint under the default FE_TONEAREST mode, same
// as np.rint), plus a "risky" flag for values within 1e-6 of a decimal
// half — the Python layer re-rounds those rare entries with Python's
// correct decimal round().
void ef_round4(const double* x, int64_t len, double* out, uint8_t* risky) {
    for (int64_t k = 0; k < len; ++k) {
        const double y = x[k] * 1e4;
        const double m = std::nearbyint(y);
        out[k] = m / 1e4;
        risky[k] = std::fabs(std::fabs(y - m) - 0.5) < 1e-6 ? 1 : 0;
    }
}

void ef_finish_pairs(const double* c_ab, const double* c1_a,
                     const double* c1_b, double n, int64_t len, double* r2,
                     double* dp, uint8_t* r2_iz, uint8_t* dp_iz) {
    for (int64_t k = 0; k < len; ++k) {
        const Cell c = finish_cell(c_ab[k] / n, c1_a[k] / n,
                                   (n - c1_a[k]) / n, c1_b[k] / n,
                                   (n - c1_b[k]) / n);
        r2[k] = c.r2;
        dp[k] = c.dp;
        r2_iz[k] = c.r2_iz ? 1 : 0;
        dp_iz[k] = c.dp_iz ? 1 : 0;
    }
}

}  // extern "C"
