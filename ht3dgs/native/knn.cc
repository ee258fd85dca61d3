// Native runtime kernels for ht3dgs (C++17, no external deps).
//
// TPU-native replacement for the reference's `simple-knn` CUDA extension
// (consumed at /root/reference/scene/gaussian_model_ht.py:211-217) plus the
// open3d voxel_down_sample call on the per-frame init path
// (/root/reference/trainer/trainer.py:660-665). These run on the HOST as part
// of model initialization / data loading — the right placement on a TPU
// system, where host cores are plentiful and the ops are pointer-chasing
// (bad fit for the MXU/VPU).
//
// Exposed via a C ABI for ctypes (see knn.py). Built with `make` (see
// Makefile in this directory).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
    int64_t x, y, z;
    bool operator==(const CellKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct CellHash {
    size_t operator()(const CellKey& k) const {
        // 3D hash with large primes; good spread for lattice keys
        return static_cast<size_t>(k.x * 73856093LL ^ k.y * 19349663LL ^
                                   k.z * 83492791LL);
    }
};

}  // namespace

extern "C" {

// Mean squared distance to the 3 nearest neighbors of each point.
// points: [n, 3] float32; out: [n] float32.
// Grid-hash accelerated: cell size from a heuristic density estimate,
// expanding ring search until 3 neighbors are guaranteed exact.
void ht3dgs_mean_sq_dist_3nn(const float* points, int64_t n, float* out) {
    if (n <= 1) {
        for (int64_t i = 0; i < n; ++i) out[i] = 0.f;
        return;
    }
    // bounding box
    float lo[3] = {points[0], points[1], points[2]};
    float hi[3] = {points[0], points[1], points[2]};
    for (int64_t i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            lo[d] = std::min(lo[d], points[3 * i + d]);
            hi[d] = std::max(hi[d], points[3 * i + d]);
        }
    }
    float ext = std::max({hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2], 1e-6f});
    // target ~2 points per cell on average
    float cell = ext / std::max(1.0f, std::cbrt(static_cast<float>(n) / 2.0f));
    if (cell <= 0.f) cell = 1e-6f;

    std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
    grid.reserve(static_cast<size_t>(n));
    auto key_of = [&](const float* p) {
        return CellKey{static_cast<int64_t>(std::floor((p[0] - lo[0]) / cell)),
                       static_cast<int64_t>(std::floor((p[1] - lo[1]) / cell)),
                       static_cast<int64_t>(std::floor((p[2] - lo[2]) / cell))};
    };
    for (int64_t i = 0; i < n; ++i)
        grid[key_of(points + 3 * i)].push_back(static_cast<int32_t>(i));

    const int KNN = 3;
#pragma omp parallel for schedule(dynamic, 256)
    for (int64_t i = 0; i < n; ++i) {
        const float* p = points + 3 * i;
        CellKey c = key_of(p);
        float best[KNN] = {std::numeric_limits<float>::max(),
                           std::numeric_limits<float>::max(),
                           std::numeric_limits<float>::max()};
        int found = 0;
        for (int ring = 0;; ++ring) {
            // ring `ring` = all cells with Chebyshev distance == ring
            for (int64_t dx = -ring; dx <= ring; ++dx) {
                for (int64_t dy = -ring; dy <= ring; ++dy) {
                    for (int64_t dz = -ring; dz <= ring; ++dz) {
                        if (std::max({std::llabs(dx), std::llabs(dy),
                                      std::llabs(dz)}) != ring)
                            continue;
                        auto it = grid.find(CellKey{c.x + dx, c.y + dy,
                                                    c.z + dz});
                        if (it == grid.end()) continue;
                        for (int32_t j : it->second) {
                            if (j == i) continue;
                            float ddx = p[0] - points[3 * j];
                            float ddy = p[1] - points[3 * j + 1];
                            float ddz = p[2] - points[3 * j + 2];
                            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                            if (d2 < best[KNN - 1]) {
                                best[KNN - 1] = d2;
                                for (int k = KNN - 1;
                                     k > 0 && best[k] < best[k - 1]; --k)
                                    std::swap(best[k], best[k - 1]);
                                if (found < KNN) ++found;
                            }
                        }
                    }
                }
            }
            // exact-stop rule: the 3rd-best distance must be within the
            // radius fully covered by the searched rings
            float covered = ring * cell;
            if (found >= KNN && best[KNN - 1] <= covered * covered) break;
            if (ring > 0 && found >= KNN &&
                std::sqrt(best[KNN - 1]) <= covered)
                break;
            if (ring * cell > ext * 2.f) break;  // degenerate safety
        }
        float s = 0.f;
        int cnt = 0;
        for (int k = 0; k < KNN; ++k)
            if (best[k] != std::numeric_limits<float>::max()) {
                s += best[k];
                ++cnt;
            }
        out[i] = cnt ? s / cnt : 0.f;
    }
}

// Voxel-grid downsample with per-voxel averaging of points and colors.
// Returns the number of output points (<= n). Outputs are written to
// out_points/out_colors (caller allocates n rows).
int64_t ht3dgs_voxel_downsample(const float* points, const float* colors,
                                int64_t n, float voxel,
                                float* out_points, float* out_colors) {
    if (voxel <= 0.f || n == 0) return 0;
    std::unordered_map<CellKey, int64_t, CellHash> slot;
    slot.reserve(static_cast<size_t>(n));
    std::vector<double> acc;     // [m * 7]: xyz, rgb, count
    acc.reserve(static_cast<size_t>(n) * 7);
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        CellKey k{static_cast<int64_t>(std::floor(points[3 * i] / voxel)),
                  static_cast<int64_t>(std::floor(points[3 * i + 1] / voxel)),
                  static_cast<int64_t>(std::floor(points[3 * i + 2] / voxel))};
        auto it = slot.find(k);
        int64_t s;
        if (it == slot.end()) {
            s = m++;
            slot.emplace(k, s);
            acc.resize(static_cast<size_t>(m) * 7, 0.0);
        } else {
            s = it->second;
        }
        double* a = acc.data() + s * 7;
        for (int d = 0; d < 3; ++d) a[d] += points[3 * i + d];
        for (int d = 0; d < 3; ++d) a[3 + d] += colors[3 * i + d];
        a[6] += 1.0;
    }
    for (int64_t s = 0; s < m; ++s) {
        const double* a = acc.data() + s * 7;
        double inv = 1.0 / a[6];
        for (int d = 0; d < 3; ++d)
            out_points[3 * s + d] = static_cast<float>(a[d] * inv);
        for (int d = 0; d < 3; ++d)
            out_colors[3 * s + d] = static_cast<float>(a[3 + d] * inv);
    }
    return m;
}

}  // extern "C"
