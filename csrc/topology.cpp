// Native host-runtime kernels for sella_tpu.
//
// The reference keeps its host-side hot loops in Cython
// (/root/reference/sella/utilities/math.pyx, blas.pyx); in this rebuild
// the *compute* path is XLA, and the host-side hot spot that remains is
// topology discovery: the candidate bond search over all atom pairs and
// periodic images (O(n^2 * n_images) in numpy, called on every rebuild
// event). Two paths behind one C ABI entry point:
//   * a tight direct pair loop (small n);
//   * a linked-cell O(n) search (n >= 512) binning atoms into fractional
//     (or bounding-box) cells of side >= cutoff and scanning the 27
//     neighbor bins — the standard neighbor-list structure, required for
//     >10k-atom systems where the pair loop's O(n^2) dominates rebuilds.
//
// Build: g++ -O3 -march=native -shared -fPIC topology.cpp -o libsella_native.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Cell3 {
    const double* cell;   // (3,3) row-major, rows are lattice vectors
    double inv[9];        // column-major action: frac = r . inv
    bool have_inv = false;

    explicit Cell3(const double* c) : cell(c) {
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

    void frac(const double* r, double* f) const {
        f[0] = r[0] * inv[0] + r[1] * inv[3] + r[2] * inv[6];
        f[1] = r[0] * inv[1] + r[1] * inv[4] + r[2] * inv[7];
        f[2] = r[0] * inv[2] + r[1] * inv[5] + r[2] * inv[8];
    }

    // perpendicular width of the cell along lattice axis a: V / |b x c|
    double perp_width(int a) const {
        const double* b = cell + 3 * ((a + 1) % 3);
        const double* c = cell + 3 * ((a + 2) % 3);
        double bx = b[1] * c[2] - b[2] * c[1];
        double by = b[2] * c[0] - b[0] * c[2];
        double bz = b[0] * c[1] - b[1] * c[0];
        double area = std::sqrt(bx * bx + by * by + bz * bz);
        const double* aa = cell + 3 * a;
        double vol = std::fabs(aa[0] * bx + aa[1] * by + aa[2] * bz);
        return area > 1e-300 ? vol / area : 0.0;
    }
};

int64_t brute_force_bonds(
    const double* positions, const double* cell, const int64_t* pbc,
    const double* rcov, const int64_t* labels, int64_t n, double scale,
    int64_t* out, int64_t cap, const Cell3& C)
{
    int rx = pbc[0] ? 1 : 0, ry = pbc[1] ? 1 : 0, rz = pbc[2] ? 1 : 0;
    const bool any_pbc = (rx | ry | rz) && C.have_inv;
    const double* inv = C.inv;

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

// Linked-cell O(n) candidate search. Bins atoms into boxes of side
// >= cutoff (fractional boxes when the cell is invertible, Cartesian
// bounding-box otherwise), scans the 27 neighbor boxes, and reports the
// image offset s = u + wrap_i - wrap_j so output triples are identical
// to the brute-force path. Returns -1 when the geometry disqualifies
// the structure (a periodic axis thinner than 3 cutoffs, where an atom
// can bond to its own image) — caller falls back to brute force.
int64_t cell_list_bonds(
    const double* positions, const double* cell, const int64_t* pbc,
    const double* rcov, const int64_t* labels, int64_t n, double scale,
    int64_t* out, int64_t cap, const Cell3& C)
{
    double rcov_max = 0.0;
    for (int64_t i = 0; i < n; ++i)
        if (rcov[i] > rcov_max) rcov_max = rcov[i];
    const double cutoff = scale * 2.0 * rcov_max;
    if (cutoff <= 0.0) return 0;

    const bool use_frac = C.have_inv;

    // per-atom bin coordinate source: fractional or Cartesian
    std::vector<double> coord(3 * n);
    std::vector<int64_t> wrap(3 * n, 0);
    double width[3];                       // physical thickness per unit
    if (use_frac) {
        for (int64_t i = 0; i < n; ++i)
            C.frac(positions + 3 * i, &coord[3 * i]);
        for (int a = 0; a < 3; ++a) width[a] = C.perp_width(a);
    } else {
        for (int64_t i = 0; i < n; ++i)
            for (int a = 0; a < 3; ++a)
                coord[3 * i + a] = positions[3 * i + a];
        width[0] = width[1] = width[2] = 1.0;
    }

    int64_t nb[3];                         // bins per axis
    double lo[3], binw[3];                 // origin + bin width (coord units)
    for (int a = 0; a < 3; ++a) {
        if (pbc[a] && use_frac) {
            // wrap into [0, 1); bins must each be >= cutoff thick
            int64_t m = (int64_t)std::floor(width[a] / cutoff);
            if (m < 3) return -1;          // self-image regime: brute force
            nb[a] = m;
            lo[a] = 0.0;
            binw[a] = 1.0 / (double)m;
            for (int64_t i = 0; i < n; ++i) {
                double f = coord[3 * i + a];
                double w = std::floor(f);
                wrap[3 * i + a] = (int64_t)w;
                coord[3 * i + a] = f - w;
            }
        } else {
            double cmin = coord[a], cmax = coord[a];
            for (int64_t i = 1; i < n; ++i) {
                double v = coord[3 * i + a];
                if (v < cmin) cmin = v;
                if (v > cmax) cmax = v;
            }
            double extent = cmax - cmin;
            double bw = cutoff / width[a];     // bin width in coord units
            int64_t m = (int64_t)std::floor(extent / bw) + 1;
            if (m < 1) m = 1;
            nb[a] = m;
            lo[a] = cmin;
            binw[a] = bw;
        }
    }

    const int64_t nbins = nb[0] * nb[1] * nb[2];
    // counting sort into bins
    std::vector<int64_t> binof(n);
    std::vector<int64_t> start(nbins + 1, 0);
    for (int64_t i = 0; i < n; ++i) {
        int64_t b[3];
        for (int a = 0; a < 3; ++a) {
            int64_t k = (int64_t)std::floor(
                (coord[3 * i + a] - lo[a]) / binw[a]);
            if (k < 0) k = 0;
            if (k >= nb[a]) k = nb[a] - 1;
            b[a] = k;
        }
        binof[i] = (b[0] * nb[1] + b[1]) * nb[2] + b[2];
        ++start[binof[i] + 1];
    }
    for (int64_t k = 0; k < nbins; ++k) start[k + 1] += start[k];
    std::vector<int64_t> order(n);
    {
        std::vector<int64_t> cursor(start.begin(), start.end() - 1);
        for (int64_t i = 0; i < n; ++i) order[cursor[binof[i]]++] = i;
    }

    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t bi0 = binof[i];
        const int64_t bx = bi0 / (nb[1] * nb[2]);
        const int64_t by = (bi0 / nb[2]) % nb[1];
        const int64_t bz = bi0 % nb[2];
        const double* ri = positions + 3 * i;
        for (int dx = -1; dx <= 1; ++dx)
        for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
            int64_t cb[3] = {bx + dx, by + dy, bz + dz};
            int64_t u[3] = {0, 0, 0};
            bool skip = false;
            for (int a = 0; a < 3; ++a) {
                if (cb[a] < 0) {
                    if (pbc[a] && use_frac) { cb[a] += nb[a]; u[a] = -1; }
                    else { skip = true; break; }
                } else if (cb[a] >= nb[a]) {
                    if (pbc[a] && use_frac) { cb[a] -= nb[a]; u[a] = 1; }
                    else { skip = true; break; }
                }
            }
            if (skip) continue;
            const int64_t bj = (cb[0] * nb[1] + cb[1]) * nb[2] + cb[2];
            for (int64_t p = start[bj]; p < start[bj + 1]; ++p) {
                const int64_t j = order[p];
                if (j <= i) continue;       // each unordered pair once
                if (labels[i] == labels[j] && labels[i] != -1) continue;
                const double thr = scale * (rcov[i] + rcov[j]);
                // displacement of wrapped_j + u relative to wrapped_i
                double vx, vy, vz;
                int64_t s[3];
                if (use_frac) {
                    double df[3];
                    for (int a = 0; a < 3; ++a) {
                        double fj = coord[3 * j + a];
                        double fi = coord[3 * i + a];
                        df[a] = fj + (double)u[a] - fi;
                        s[a] = u[a] + wrap[3 * i + a] - wrap[3 * j + a];
                    }
                    vx = df[0] * cell[0] + df[1] * cell[3]
                        + df[2] * cell[6];
                    vy = df[0] * cell[1] + df[1] * cell[4]
                        + df[2] * cell[7];
                    vz = df[0] * cell[2] + df[1] * cell[5]
                        + df[2] * cell[8];
                } else {
                    const double* rj = positions + 3 * j;
                    vx = rj[0] - ri[0];
                    vy = rj[1] - ri[1];
                    vz = rj[2] - ri[2];
                    s[0] = s[1] = s[2] = 0;
                }
                if (vx * vx + vy * vy + vz * vz <= thr * thr) {
                    if (count < cap) {
                        int64_t* o = out + 5 * count;
                        o[0] = i;
                        o[1] = j;
                        o[2] = s[0];
                        o[3] = s[1];
                        o[4] = s[2];
                    }
                    ++count;
                }
            }
        }
    }
    return count;
}

}  // namespace

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
//
// Dispatch: linked-cell O(n) search for n >= 512 (falling back when a
// periodic axis is thinner than 3 cutoffs), direct O(n^2) pair loop
// otherwise.
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
    Cell3 C(cell);
    if (n >= 512) {
        int64_t r = cell_list_bonds(positions, cell, pbc, rcov, labels,
                                    n, scale, out, cap, C);
        if (r >= 0) return r;
    }
    return brute_force_bonds(positions, cell, pbc, rcov, labels, n,
                             scale, out, cap, C);
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
