// Dense linear assignment (Jonker-Volgenant / successive shortest paths).
//
// Native runtime component of reart_tpu: replaces the reference's
// scipy.linear_sum_assignment + multiprocessing.Pool fan-out
// (utils/model_utils.py:85-103) for the assignment loss and the
// model-selection energy. Exact solver; the TPU auction solver in
// reart_tpu/ops/assignment.py is the fast epsilon-optimal path.
//
// Build: g++ -O3 -march=native -shared -fPIC lap.cpp -o libreart_native.so

#include <cstdint>
#include <limits>
#include <vector>

namespace {

// Successive-shortest-path assignment with dual potentials.
// cost: row-major n x m, n <= m. Writes row_to_col[n]. Returns 0 on success.
int solve_one(int n, int m, const float* cost, int32_t* row_to_col) {
    const double INF = std::numeric_limits<double>::infinity();
    std::vector<double> u(n, 0.0), v(m + 1, 0.0), minv(m + 1);
    std::vector<int> p(m + 1, -1), way(m + 1, 0);
    std::vector<char> used(m + 1);

    for (int i = 0; i < n; ++i) {
        std::fill(minv.begin(), minv.end(), INF);
        std::fill(used.begin(), used.end(), 0);
        int j0 = m;  // virtual start column
        p[m] = i;
        do {
            used[j0] = 1;
            const int i0 = p[j0];
            const float* row = cost + static_cast<size_t>(i0) * m;
            double delta = INF;
            int j1 = -1;
            const double ui0 = u[i0];
            for (int j = 0; j < m; ++j) {
                if (used[j]) continue;
                const double cur = static_cast<double>(row[j]) - ui0 - v[j];
                if (cur < minv[j]) {
                    minv[j] = cur;
                    way[j] = j0;
                }
                if (minv[j] < delta) {
                    delta = minv[j];
                    j1 = j;
                }
            }
            if (j1 < 0) return -1;  // infeasible
            for (int j = 0; j <= m; ++j) {
                if (used[j]) {
                    u[p[j]] += delta;
                    v[j] -= delta;
                } else {
                    minv[j] -= delta;
                }
            }
            j0 = j1;
        } while (p[j0] != -1);
        // augment along the found path
        do {
            const int j1 = way[j0];
            p[j0] = p[j1];
            j0 = j1;
        } while (j0 != m);
    }
    for (int j = 0; j < m; ++j) {
        if (p[j] >= 0 && p[j] < n) row_to_col[p[j]] = j;
    }
    return 0;
}

}  // namespace

extern "C" {

int lap_solve(int n, int m, const float* cost, int32_t* row_to_col) {
    if (n > m) return -2;
    return solve_one(n, m, cost, row_to_col);
}

// Batched entry: cost (b, n, m) row-major, out (b, n).
int lap_solve_batch(int b, int n, int m, const float* cost, int32_t* out) {
    if (n > m) return -2;
    for (int k = 0; k < b; ++k) {
        const int rc = solve_one(n, m, cost + static_cast<size_t>(k) * n * m,
                                 out + static_cast<size_t>(k) * n);
        if (rc != 0) return rc;
    }
    return 0;
}

}  // extern "C"
