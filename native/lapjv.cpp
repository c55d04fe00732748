// Dense Jonker-Volgenant linear assignment (LAPJV).
//
// Native replacement for the reference's `lap` C++ dependency
// (services/tracking-service/app/tracker/matching.py:9,91): solves the
// square dense LAP exactly via column reduction, augmenting row reduction,
// and shortest augmenting paths.  Exposed through a C ABI for ctypes.
//
// R. Jonker and A. Volgenant, "A Shortest Augmenting Path Algorithm for
// Dense and Sparse Linear Assignment Problems", Computing 38, 1987.

#include <cfloat>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// cost: n*n row-major. rowsol[i] = column assigned to row i.
// colsol[j] = row assigned to column j.  Returns total cost.
double lapjv(const double* cost, int n, int* rowsol, int* colsol) {
    std::vector<double> u(n, 0.0), v(n, 0.0);
    std::vector<int> free_rows(n), matches(n, 0);
    for (int i = 0; i < n; ++i) { rowsol[i] = -1; }
    for (int j = 0; j < n; ++j) { colsol[j] = -1; }

    // --- column reduction (scan columns right-to-left) ---
    for (int j = n - 1; j >= 0; --j) {
        double min_c = cost[0 * n + j];
        int imin = 0;
        for (int i = 1; i < n; ++i) {
            double c = cost[i * n + j];
            if (c < min_c) { min_c = c; imin = i; }
        }
        v[j] = min_c;
        if (++matches[imin] == 1) {
            rowsol[imin] = j;
            colsol[j] = imin;
        } else {
            colsol[j] = -1;
        }
    }

    // --- reduction transfer ---
    int num_free = 0;
    for (int i = 0; i < n; ++i) {
        if (matches[i] == 0) {
            free_rows[num_free++] = i;
        } else if (matches[i] == 1) {
            int j1 = rowsol[i];
            double min_c = DBL_MAX;
            for (int j = 0; j < n; ++j) {
                if (j != j1) {
                    double c = cost[i * n + j] - v[j];
                    if (c < min_c) min_c = c;
                }
            }
            v[j1] -= min_c;
        }
    }

    // --- augmenting row reduction (two passes) ---
    for (int loop = 0; loop < 2; ++loop) {
        int k = 0;
        int prev_num_free = num_free;
        num_free = 0;
        while (k < prev_num_free) {
            int i = free_rows[k++];
            double umin = DBL_MAX, usubmin = DBL_MAX;
            int j1 = 0, j2 = -1;
            for (int j = 0; j < n; ++j) {
                double h = cost[i * n + j] - v[j];
                if (h < usubmin) {
                    if (h >= umin) { usubmin = h; j2 = j; }
                    else { usubmin = umin; umin = h; j2 = j1; j1 = j; }
                }
            }
            int i0 = colsol[j1];
            if (umin < usubmin) {
                v[j1] -= usubmin - umin;
            } else if (i0 >= 0) {
                j1 = j2;
                i0 = colsol[j1];
            }
            rowsol[i] = j1;
            colsol[j1] = i;
            if (i0 >= 0) {
                if (umin < usubmin) {
                    free_rows[--k] = i0;   // retry immediately
                } else {
                    free_rows[num_free++] = i0;
                }
            }
        }
    }

    // --- augmentation via Dijkstra shortest paths ---
    std::vector<double> d(n);
    std::vector<int> pred(n), col_list(n);
    for (int f = 0; f < num_free; ++f) {
        int free_row = free_rows[f];
        for (int j = 0; j < n; ++j) {
            d[j] = cost[free_row * n + j] - v[j];
            pred[j] = free_row;
            col_list[j] = j;
        }
        int low = 0, up = 0;
        int endofpath = -1;
        double min_d = 0.0;
        bool unassigned_found = false;
        while (!unassigned_found) {
            if (up == low) {
                min_d = d[col_list[up++]];
                for (int k = up; k < n; ++k) {
                    int j = col_list[k];
                    double h = d[j];
                    if (h <= min_d) {
                        if (h < min_d) { up = low; min_d = h; }
                        col_list[k] = col_list[up];
                        col_list[up++] = j;
                    }
                }
                for (int k = low; k < up; ++k) {
                    int j = col_list[k];
                    if (colsol[j] < 0) { endofpath = j; unassigned_found = true; break; }
                }
            }
            if (!unassigned_found) {
                int j1 = col_list[low++];
                int i = colsol[j1];
                double h = cost[i * n + j1] - v[j1] - min_d;
                for (int k = up; k < n; ++k) {
                    int j = col_list[k];
                    double v2 = cost[i * n + j] - v[j] - h;
                    if (v2 < d[j]) {
                        d[j] = v2;
                        pred[j] = i;
                        if (v2 == min_d) {
                            if (colsol[j] < 0) { endofpath = j; unassigned_found = true; break; }
                            col_list[k] = col_list[up];
                            col_list[up++] = j;
                        }
                    }
                }
            }
        }
        for (int k = 0; k < up; ++k) {
            int j = col_list[k];
            v[j] += d[j] - min_d;
        }
        // augment along the alternating path
        int j = endofpath;
        while (true) {
            int i = pred[j];
            colsol[j] = i;
            int tmp = rowsol[i];
            rowsol[i] = j;
            if (i == free_row) break;
            j = tmp;
        }
    }

    double total = 0.0;
    for (int i = 0; i < n; ++i) total += cost[i * n + rowsol[i]];
    return total;
}

}  // extern "C"
