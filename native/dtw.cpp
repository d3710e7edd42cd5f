// Native multivariate DTW kernel — the framework's equivalent of the
// dtaidistance C path the reference calls with use_c=True
// (reference evaluation.py:152-161).
//
// Definition (matches dtaidistance.dtw_ndim.distance and the reference's
// pure-python DP at evaluate/metrics.py:139-170): cell cost is the squared
// Euclidean distance between the two D-dim frames; the returned distance is
// sqrt of the cumulative cost at (T1, T2).
//
// Two-row O(T1*T2) DP, O(T2) memory; optional Sakoe-Chiba band via `window`
// (window <= 0 means unconstrained). Batch driver amortizes the Python
// boundary to one call per array pair set.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstddef>
#include <limits>
#include <vector>

namespace {

inline double frame_cost(const double* a, const double* b, int dim) {
    double s = 0.0;
    for (int d = 0; d < dim; ++d) {
        const double diff = a[d] - b[d];
        s += diff * diff;
    }
    return s;
}

}  // namespace

extern "C" {

// a: (Ta, dim) row-major, b: (Tb, dim). Returns sqrt(accumulated cost).
double t2ms_dtw_ndim(const double* a, int Ta, const double* b, int Tb,
                     int dim, int window) {
    const double INF = std::numeric_limits<double>::infinity();
    std::vector<double> prev(static_cast<size_t>(Tb) + 1, INF);
    std::vector<double> curr(static_cast<size_t>(Tb) + 1, INF);
    prev[0] = 0.0;
    for (int i = 1; i <= Ta; ++i) {
        curr.assign(curr.size(), INF);
        int j_lo = 1, j_hi = Tb;
        if (window > 0) {
            // Sakoe-Chiba band around the (scaled) diagonal
            const double ratio = static_cast<double>(Tb) / Ta;
            const int center = static_cast<int>(i * ratio);
            j_lo = center - window > 1 ? center - window : 1;
            j_hi = center + window < Tb ? center + window : Tb;
        }
        const double* ai = a + static_cast<size_t>(i - 1) * dim;
        for (int j = j_lo; j <= j_hi; ++j) {
            const double c = frame_cost(ai, b + static_cast<size_t>(j - 1) * dim, dim);
            double best = prev[j];               // insertion
            if (curr[j - 1] < best) best = curr[j - 1];   // deletion
            if (prev[j - 1] < best) best = prev[j - 1];   // match
            curr[j] = c + best;
        }
        prev.swap(curr);
    }
    return std::sqrt(prev[Tb]);
}

// Batched pairs with uniform shapes: a (N, T1, dim), b (N, T2, dim).
void t2ms_dtw_batch(const double* a, const double* b, int n, int T1, int T2,
                    int dim, int window, double* out) {
    const size_t stride_a = static_cast<size_t>(T1) * dim;
    const size_t stride_b = static_cast<size_t>(T2) * dim;
    for (int i = 0; i < n; ++i) {
        out[i] = t2ms_dtw_ndim(a + i * stride_a, T1, b + i * stride_b, T2,
                               dim, window);
    }
}

}  // extern "C"
