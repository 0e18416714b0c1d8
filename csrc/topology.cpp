// Native host-runtime kernels for sella_tpu.
//
// The reference keeps its host-side hot loops in Cython
// (/root/reference/sella/utilities/math.pyx, blas.pyx); in this rebuild
// the *compute* path is XLA, and the host-side hot spot that remains is
// topology discovery: the candidate bond search over all atom pairs and
// periodic images (O(n^2 * n_images) in numpy, called on every rebuild
// event). This C++ kernel runs the same search as a tight direct pair
// loop (no O(n^2 * n_images) numpy temporaries) behind a plain C ABI
// for ctypes; a cell-list O(n) variant is the planned upgrade for
// >10k-atom systems.
//
// Build: g++ -O3 -march=native -shared -fPIC topology.cpp -o libsella_native.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Candidate bond search with periodic images.
//
// positions: (n, 3) row-major; cell: (3, 3) row-major (rows are lattice
// vectors); pbc: (3,) 0/1; rcov: (n,) covalent radii; labels: (n,)
// fragment labels (-1 = unlabeled; pairs within the same label are
// skipped); scale: threshold factor.
//
// Output: triples (i, j, tx, ty, tz) appended into out (cap entries);
// returns the number of pairs found (may exceed cap — caller must
// retry with a larger buffer; nothing beyond cap is written).
int64_t find_candidate_bonds(
    const double* positions,
    const double* cell,
    const int64_t* pbc,
    const double* rcov,
    const int64_t* labels,
    int64_t n,
    double scale,
    int64_t* out,
    int64_t cap)
{
    // image ranges per axis
    int rx = pbc[0] ? 1 : 0, ry = pbc[1] ? 1 : 0, rz = pbc[2] ? 1 : 0;

    // max threshold determines the cutoff
    double rcov_max = 0.0;
    for (int64_t i = 0; i < n; ++i)
        if (rcov[i] > rcov_max) rcov_max = rcov[i];
    const double cutoff = scale * 2.0 * rcov_max;
    const double cutoff2 = cutoff * cutoff;

    // fractional offset rounding (nearest-image prefold), as in the
    // vectorized reference search (internal.py:3290-3307)
    double inv[9];
    bool have_inv = false;
    {
        // invert cell if non-singular (needed only under pbc)
        const double* c = cell;
        double det =
            c[0] * (c[4] * c[8] - c[5] * c[7])
            - c[1] * (c[3] * c[8] - c[5] * c[6])
            + c[2] * (c[3] * c[7] - c[4] * c[6]);
        if (std::fabs(det) > 1e-300) {
            double id = 1.0 / det;
            inv[0] = (c[4] * c[8] - c[5] * c[7]) * id;
            inv[1] = (c[2] * c[7] - c[1] * c[8]) * id;
            inv[2] = (c[1] * c[5] - c[2] * c[4]) * id;
            inv[3] = (c[5] * c[6] - c[3] * c[8]) * id;
            inv[4] = (c[0] * c[8] - c[2] * c[6]) * id;
            inv[5] = (c[2] * c[3] - c[0] * c[5]) * id;
            inv[6] = (c[3] * c[7] - c[4] * c[6]) * id;
            inv[7] = (c[1] * c[6] - c[0] * c[7]) * id;
            inv[8] = (c[0] * c[4] - c[1] * c[3]) * id;
            have_inv = true;
        }
    }
    const bool any_pbc = (rx | ry | rz) && have_inv;

    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t j = i; j < n; ++j) {
            if (labels[i] == labels[j] && labels[i] != -1) continue;
            double dx = positions[3 * j + 0] - positions[3 * i + 0];
            double dy = positions[3 * j + 1] - positions[3 * i + 1];
            double dz = positions[3 * j + 2] - positions[3 * i + 2];
            const double thr = scale * (rcov[i] + rcov[j]);
            const double thr2 = thr * thr;

            long ox = 0, oy = 0, oz = 0;
            if (any_pbc) {
                // nearest-image prefold offset
                double fx = dx * inv[0] + dy * inv[3] + dz * inv[6];
                double fy = dx * inv[1] + dy * inv[4] + dz * inv[7];
                double fz = dx * inv[2] + dy * inv[5] + dz * inv[8];
                ox = pbc[0] ? (long)std::lround(fx) : 0;
                oy = pbc[1] ? (long)std::lround(fy) : 0;
                oz = pbc[2] ? (long)std::lround(fz) : 0;
            }

            for (long tx = -rx; tx <= rx; ++tx)
            for (long ty = -ry; ty <= ry; ++ty)
            for (long tz = -rz; tz <= rz; ++tz) {
                const long sx = tx - ox, sy = ty - oy, sz = tz - oz;
                if (i == j && sx == 0 && sy == 0 && sz == 0) continue;
                const double vx =
                    dx + sx * cell[0] + sy * cell[3] + sz * cell[6];
                const double vy =
                    dy + sx * cell[1] + sy * cell[4] + sz * cell[7];
                const double vz =
                    dz + sx * cell[2] + sy * cell[5] + sz * cell[8];
                const double d2 = vx * vx + vy * vy + vz * vz;
                if (d2 <= thr2) {
                    if (count < cap) {
                        int64_t* o = out + 5 * count;
                        o[0] = i;
                        o[1] = j;
                        o[2] = sx;
                        o[3] = sy;
                        o[4] = sz;
                    }
                    ++count;
                }
            }
        }
    }
    return count;
}

// Flood-fill fragment labeling over a bond list. bonds: (m, 2) atom
// pairs; labels out: (n,). Returns the number of fragments.
int64_t flood_fill_fragments(
    const int64_t* bonds,
    int64_t m,
    int64_t n,
    int64_t* labels)
{
    std::vector<std::vector<int64_t>> adj(n);
    for (int64_t k = 0; k < m; ++k) {
        int64_t i = bonds[2 * k], j = bonds[2 * k + 1];
        adj[i].push_back(j);
        adj[j].push_back(i);
    }
    for (int64_t i = 0; i < n; ++i) labels[i] = -1;
    int64_t nlab = 0;
    std::vector<int64_t> stack;
    for (int64_t s = 0; s < n; ++s) {
        if (labels[s] != -1) continue;
        labels[s] = nlab;
        stack.push_back(s);
        while (!stack.empty()) {
            int64_t u = stack.back();
            stack.pop_back();
            for (int64_t v : adj[u]) {
                if (labels[v] != nlab) {
                    labels[v] = nlab;
                    stack.push_back(v);
                }
            }
        }
        ++nlab;
    }
    return nlab;
}

}  // extern "C"
