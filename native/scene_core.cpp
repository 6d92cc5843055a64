// Native scene-compiler core for box2d_tpu.
//
// The TPU compute path is JAX/XLA; this library is the *runtime around it*:
// host-side scene construction that the reference implements in C# with
// HPCSharp-accelerated sorts and hand-rolled spatial hashing
// (ref: src/Hull.cs quickhull, particle/ParticleSystem.cs:801-861
// UpdatePairsAndTriads + VoronoiDiagram.cs). Python/NumPy versions of these
// are O(n^2) loops that make 100k-particle elastic/spring groups unbuildable;
// this C++ core is grid-hashed and linear.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// quickhull (behavioral match of ref: src/Hull.cs:43-160)
// ---------------------------------------------------------------------------

static double cross2(double ex, double ey, double vx, double vy) {
    return ex * vy - ey * vx;
}

// points: n*2 doubles in, hull written to out (cap 8*2), returns count
int compute_hull(const double* points, int n, double linear_slop,
                 double* out, int max_out) {
    if (n < 3) {
        for (int i = 0; i < n; i++) { out[2*i] = points[2*i]; out[2*i+1] = points[2*i+1]; }
        return n;
    }
    // weld close points (ref: Hull.cs:50 tolSqr = 16*slop^2 on SQUARED
    // distance => 4*slop on distance)
    std::vector<double> px, py;
    double tol = 4.0 * linear_slop;
    for (int i = 0; i < n; i++) {
        double x = points[2*i], y = points[2*i+1];
        bool dup = false;
        for (size_t j = 0; j < px.size(); j++) {
            if (std::hypot(x - px[j], y - py[j]) < tol) { dup = true; break; }
        }
        if (!dup) { px.push_back(x); py.push_back(y); }
    }
    int m = (int)px.size();
    if (m < 3) {
        for (int i = 0; i < m; i++) { out[2*i] = px[i]; out[2*i+1] = py[i]; }
        return m;
    }

    // quickhull on indices
    int lo = 0, hi = 0;
    for (int i = 1; i < m; i++) {
        if (px[i] < px[lo] || (px[i] == px[lo] && py[i] < py[lo])) lo = i;
        if (px[i] > px[hi] || (px[i] == px[hi] && py[i] > py[hi])) hi = i;
    }
    std::vector<int> hull;
    // recursive helper via explicit lambda recursion
    struct Rec {
        const std::vector<double>& px; const std::vector<double>& py;
        std::vector<int>& hull;
        void run(int a, int b, const std::vector<int>& cand) {
            if (cand.empty()) return;
            double ex = px[b] - px[a], ey = py[b] - py[a];
            std::vector<int> right;
            int best = -1; double bestd = 0;
            for (int c : cand) {
                double d = cross2(ex, ey, px[c] - px[a], py[c] - py[a]);
                if (d < 0) {
                    right.push_back(c);
                    if (d < bestd) { bestd = d; best = c; }
                }
            }
            if (best < 0) return;
            run(a, best, right);
            hull.push_back(best);
            run(best, b, right);
        }
    } rec{px, py, hull};

    std::vector<int> all(m);
    for (int i = 0; i < m; i++) all[i] = i;
    hull.push_back(lo);
    rec.run(lo, hi, all);
    hull.push_back(hi);
    rec.run(hi, lo, all);

    // ensure CCW
    double area2 = 0;
    for (size_t i = 0; i < hull.size(); i++) {
        int a = hull[i], b = hull[(i+1) % hull.size()];
        area2 += px[a]*py[b] - px[b]*py[a];
    }
    if (area2 < 0) std::reverse(hull.begin(), hull.end());

    // merge collinear within 2*linear_slop (ref: Hull.cs collinearity pass)
    bool changed = true;
    while (changed && hull.size() > 3) {
        changed = false;
        for (size_t i = 0; i < hull.size(); i++) {
            int a = hull[(i + hull.size() - 1) % hull.size()];
            int b = hull[i];
            int c = hull[(i+1) % hull.size()];
            double ex = px[c]-px[a], ey = py[c]-py[a];
            double ln = std::hypot(ex, ey);
            if (ln < 1e-12 ||
                std::fabs(cross2(ex/ln, ey/ln, px[b]-px[a], py[b]-py[a])) < 2.0*linear_slop) {
                hull.erase(hull.begin() + i);
                changed = true;
                break;
            }
        }
    }
    // cap to max_out by dropping least-area vertices
    while ((int)hull.size() > max_out) {
        size_t worst = 0; double wloss = 1e300;
        for (size_t i = 0; i < hull.size(); i++) {
            int a = hull[(i + hull.size() - 1) % hull.size()];
            int b = hull[i];
            int c = hull[(i+1) % hull.size()];
            double loss = std::fabs(cross2(px[b]-px[a], py[b]-py[a],
                                           px[c]-px[a], py[c]-py[a])) * 0.5;
            if (loss < wloss) { wloss = loss; worst = i; }
        }
        hull.erase(hull.begin() + worst);
    }
    for (size_t i = 0; i < hull.size(); i++) {
        out[2*i] = px[hull[i]];
        out[2*i+1] = py[hull[i]];
    }
    return (int)hull.size();
}

// ---------------------------------------------------------------------------
// particle group connectivity: spring pairs + elastic triads
// (behavioral counterpart of ref: ParticleSystem.cs:801-861 via a grid hash
//  instead of the Voronoi diagram — triads triangulate the stride grid)
// ---------------------------------------------------------------------------

struct CellKey {
    int64_t k;
    bool operator==(const CellKey& o) const { return k == o.k; }
};
struct CellHash {
    size_t operator()(const CellKey& c) const {
        return std::hash<int64_t>()(c.k);
    }
};

// positions: n*2 f32. Emits pairs (a, b, dist) for all pairs closer than
// max_dist. Returns count (caps at max_pairs).
int build_pairs(const float* pos, int n, float max_dist,
                int32_t* pair_a, int32_t* pair_b, float* pair_dist,
                int max_pairs) {
    std::unordered_map<CellKey, std::vector<int>, CellHash> grid;
    double inv = 1.0 / max_dist;
    auto cell_of = [&](int i) -> std::pair<int64_t, int64_t> {
        return { (int64_t)std::floor(pos[2*i] * inv),
                 (int64_t)std::floor(pos[2*i+1] * inv) };
    };
    for (int i = 0; i < n; i++) {
        auto [cx, cy] = cell_of(i);
        grid[{ (cx << 32) ^ (cy & 0xffffffffLL) }].push_back(i);
    }
    int count = 0;
    for (int i = 0; i < n && count < max_pairs; i++) {
        auto [cx, cy] = cell_of(i);
        for (int dy = -1; dy <= 1; dy++) {
            for (int dx = -1; dx <= 1; dx++) {
                auto it = grid.find({ ((cx+dx) << 32) ^ ((cy+dy) & 0xffffffffLL) });
                if (it == grid.end()) continue;
                for (int j : it->second) {
                    if (j <= i) continue;
                    double ddx = pos[2*j] - pos[2*i];
                    double ddy = pos[2*j+1] - pos[2*i+1];
                    double d = std::hypot(ddx, ddy);
                    if (d < max_dist && count < max_pairs) {
                        pair_a[count] = i;
                        pair_b[count] = j;
                        pair_dist[count] = (float)d;
                        count++;
                    }
                }
            }
        }
    }
    return count;
}

// Triads from the stride grid: for each particle join (+x, +y, +xy) neighbors
// into two triangles per grid cell. Writes (a, b, c) triples and the rest
// offsets (pa, pb, pc from midpoint). Returns triad count.
int build_triads(const float* pos, int n, float stride,
                 int32_t* tri, float* rest, int max_triads) {
    std::unordered_map<CellKey, int, CellHash> key;
    double inv = 1.0 / stride;
    for (int i = 0; i < n; i++) {
        int64_t ix = (int64_t)std::llround(pos[2*i] * inv);
        int64_t iy = (int64_t)std::llround(pos[2*i+1] * inv);
        key[{ (ix << 32) ^ (iy & 0xffffffffLL) }] = i;
    }
    auto get = [&](int64_t ix, int64_t iy) -> int {
        auto it = key.find({ (ix << 32) ^ (iy & 0xffffffffLL) });
        return it == key.end() ? -1 : it->second;
    };
    int count = 0;
    for (int i = 0; i < n && count < max_triads; i++) {
        int64_t ix = (int64_t)std::llround(pos[2*i] * inv);
        int64_t iy = (int64_t)std::llround(pos[2*i+1] * inv);
        int right = get(ix+1, iy), up = get(ix, iy+1), diag = get(ix+1, iy+1);
        int tris[2][3] = { { i, right, up }, { right, diag, up } };
        for (auto& t : tris) {
            if (t[0] < 0 || t[1] < 0 || t[2] < 0 || count >= max_triads) continue;
            double mx = (pos[2*t[0]] + pos[2*t[1]] + pos[2*t[2]]) / 3.0;
            double my = (pos[2*t[0]+1] + pos[2*t[1]+1] + pos[2*t[2]+1]) / 3.0;
            tri[3*count] = t[0];
            tri[3*count+1] = t[1];
            tri[3*count+2] = t[2];
            for (int k = 0; k < 3; k++) {
                rest[6*count + 2*k] = (float)(pos[2*t[k]] - mx);
                rest[6*count + 2*k + 1] = (float)(pos[2*t[k]+1] - my);
            }
            count++;
        }
    }
    return count;
}

// ---------------------------------------------------------------------------
// grid fill for particle group creation (ref: CreateParticleGroup :652-720)
// ---------------------------------------------------------------------------

// Fill an axis-aligned box with stride-grid points. Returns count.
int fill_box(float cx, float cy, float half_w, float half_h, float stride,
             float* out, int max_out) {
    int count = 0;
    for (double y = -half_h + stride / 2; y < half_h; y += stride) {
        for (double x = -half_w + stride / 2; x < half_w; x += stride) {
            if (count >= max_out) return count;
            out[2*count] = (float)(cx + x);
            out[2*count+1] = (float)(cy + y);
            count++;
        }
    }
    return count;
}

}  // extern "C"
