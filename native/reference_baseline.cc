// Native CPU baseline: faithful re-implementations of the reference
// algorithms (ethz-asl/aerial_mapper) for benchmark denominators.
//
// The reference publishes no numbers (BASELINE.md), so bench.py measures
// this library — the same per-cell loops the reference runs
// (aerial_mapper_ortho/src/ortho-backward-grid.cc:56-121 and
// aerial_mapper_dsm/src/dsm.cc:54-111), parallelized with a contiguous
// block std::thread parallel-for exactly like utils::parFor
// (aerial_mapper_utils/include/aerial-mapper-utils/utils-common.h:29-59).
// The kd-tree radius search is replaced by a uniform-grid bucket search,
// which is FASTER than nanoflann for 2-D radius queries — i.e. this
// baseline is conservative (harder to beat) while algorithmically
// identical in output.
//
// Exposed via a plain C ABI for ctypes. No external dependencies.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void par_for(std::size_t num_items,
             const std::function<void(std::size_t, std::size_t)>& fn,
             std::size_t num_threads) {
  // contiguous block partition, one thread per block (utils-common.h:40-58)
  if (num_threads == 0) num_threads = 1;
  num_threads = std::min(num_threads, num_items ? num_items : 1);
  std::vector<std::thread> threads;
  const std::size_t block = (num_items + num_threads - 1) / num_threads;
  for (std::size_t t = 0; t < num_threads; ++t) {
    const std::size_t lo = t * block;
    const std::size_t hi = std::min(num_items, lo + block);
    if (lo >= hi) break;
    threads.emplace_back([lo, hi, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Backward-grid best-angle ortho, the reference's dominant loop
// (ortho-backward-grid.cc:56-121). Pinhole projection, no distortion (the
// reference path feeds undistorted images).
//
// cells:   [num_cells * 3] (easting, northing, elevation; NaN elevation
//          cells are skipped like invalid projections)
// R_cw:    [num_imgs * 9] world->camera rotations, row-major
// t:       [num_imgs * 3] camera positions (world)
// images:  [num_imgs * img_h * img_w] gray values
// out_ortho / out_angle / out_obs: [num_cells]
void backward_grid_baseline(
    const double* cells, int64_t num_cells,
    const double* R_cw, const double* t, int64_t num_imgs,
    const float* images, int32_t img_h, int32_t img_w,
    double fx, double fy, double cx, double cy,
    float* out_ortho, float* out_angle, float* out_obs,
    int32_t num_threads) {
  par_for(
      static_cast<std::size_t>(num_cells),
      [&](std::size_t lo, std::size_t hi) {
        for (std::size_t ci = lo; ci < hi; ++ci) {
          const double e = cells[ci * 3 + 0];
          const double n = cells[ci * 3 + 1];
          const double z = cells[ci * 3 + 2];
          float best_angle = 0.0f;
          float ortho = 255.0f;
          float obs = -1.0f;
          if (std::isfinite(z)) {
            for (int64_t i = 0; i < num_imgs; ++i) {
              const double* R = R_cw + i * 9;
              const double dx = e - t[i * 3 + 0];
              const double dy = n - t[i * 3 + 1];
              const double dz = z - t[i * 3 + 2];
              const double pcx = R[0] * dx + R[1] * dy + R[2] * dz;
              const double pcy = R[3] * dx + R[4] * dy + R[5] * dz;
              const double pcz = R[6] * dx + R[7] * dy + R[8] * dz;
              if (pcz <= 1e-6) continue;
              const double u = fx * pcx / pcz + cx;
              const double v = fy * pcy / pcz + cy;
              if (u < 0.0 || v < 0.0 || u >= img_w || v >= img_h) continue;
              const double norm =
                  std::sqrt(pcx * pcx + pcy * pcy + pcz * pcz);
              const double alpha = std::asin(std::fabs(pcz) / norm);
              if (std::fabs(alpha) > best_angle) {
                best_angle = static_cast<float>(std::fabs(alpha));
                obs = static_cast<float>(i);
                const int kp_x = std::min(
                    static_cast<int>(std::lround(u)), img_w - 1);
                const int kp_y = std::min(
                    static_cast<int>(std::lround(v)), img_h - 1);
                ortho = images[i * img_h * img_w + kp_y * img_w + kp_x];
              }
            }
          }
          out_ortho[ci] = ortho;
          out_angle[ci] = best_angle;
          out_obs[ci] = obs;
        }
      },
      static_cast<std::size_t>(num_threads));
}

// DSM IDW with radius search + adaptive growth (dsm.cc:54-111). Radius
// parameters are in squared-distance units (nanoflann L2 semantics) and
// weights are 1/d^2, matching the reference bit-for-bit in math.
// Bucket-grid accelerated: buckets of size sqrt(max_radius_sq).
void dsm_idw_baseline(
    const double* points, int64_t num_points,  // [N*3] e, n, z
    const double* qx, const double* qy, int64_t num_cells,
    double radius_sq, int adaptive, double growth, double max_radius_sq,
    float* out_val, uint8_t* out_hit, int32_t num_threads) {
  // build bucket grid over point bbox
  double min_x = 1e30, min_y = 1e30, max_x = -1e30, max_y = -1e30;
  for (int64_t i = 0; i < num_points; ++i) {
    min_x = std::min(min_x, points[i * 3]);
    max_x = std::max(max_x, points[i * 3]);
    min_y = std::min(min_y, points[i * 3 + 1]);
    max_y = std::max(max_y, points[i * 3 + 1]);
  }
  const double cell = std::max(std::sqrt(max_radius_sq), 1e-6);
  const int gw = std::max(
      1, static_cast<int>((max_x - min_x) / cell) + 1);
  const int gh = std::max(
      1, static_cast<int>((max_y - min_y) / cell) + 1);
  std::vector<std::vector<int32_t>> buckets(
      static_cast<std::size_t>(gw) * gh);
  for (int64_t i = 0; i < num_points; ++i) {
    const int bx = std::min(
        gw - 1, std::max(0, static_cast<int>((points[i * 3] - min_x) / cell)));
    const int by = std::min(
        gh - 1,
        std::max(0, static_cast<int>((points[i * 3 + 1] - min_y) / cell)));
    buckets[static_cast<std::size_t>(by) * gw + bx].push_back(
        static_cast<int32_t>(i));
  }

  par_for(
      static_cast<std::size_t>(num_cells),
      [&](std::size_t lo, std::size_t hi) {
        std::vector<int32_t> idx;
        std::vector<double> d2s;
        for (std::size_t ci = lo; ci < hi; ++ci) {
          const double x = qx[ci];
          const double y = qy[ci];
          idx.clear();
          d2s.clear();
          // gather candidates within max radius (one bucket ring)
          const int bx0 = static_cast<int>((x - min_x) / cell);
          const int by0 = static_cast<int>((y - min_y) / cell);
          for (int by = std::max(0, by0 - 1);
               by <= std::min(gh - 1, by0 + 1); ++by) {
            for (int bx = std::max(0, bx0 - 1);
                 bx <= std::min(gw - 1, bx0 + 1); ++bx) {
              for (int32_t pi :
                   buckets[static_cast<std::size_t>(by) * gw + bx]) {
                const double dx = points[pi * 3] - x;
                const double dy = points[pi * 3 + 1] - y;
                const double d2 = dx * dx + dy * dy;
                if (d2 < max_radius_sq * (1.0 + 1e-12)) {
                  idx.push_back(pi);
                  d2s.push_back(d2);
                }
              }
            }
          }
          // radius ladder (dsm.cc:60-77)
          double r = radius_sq;
          bool found = false;
          double num = 0.0, den = 0.0;
          bool exact = false;
          while (true) {
            num = den = 0.0;
            exact = false;
            for (std::size_t k = 0; k < idx.size(); ++k) {
              if (d2s[k] < r) {
                if (d2s[k] == 0.0 && !exact) {
                  num = points[idx[k] * 3 + 2];
                  den = 1.0;
                  exact = true;
                }
                if (!exact) {
                  num += points[idx[k] * 3 + 2] / d2s[k];
                  den += 1.0 / d2s[k];
                }
              }
            }
            if (den > 0.0) {
              found = true;
              break;
            }
            if (!adaptive) break;
            r *= growth;
            if (r > max_radius_sq) break;
          }
          if (found) {
            out_val[ci] = static_cast<float>(num / den);
            out_hit[ci] = 1;
          } else {
            out_val[ci] = 0.0f;
            out_hit[ci] = 0;
          }
        }
      },
      static_cast<std::size_t>(num_threads));
}

int hardware_threads() {
  return static_cast<int>(std::thread::hardware_concurrency());
}

}  // extern "C"
