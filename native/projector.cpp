// Native system-matrix assembly for the CT operators.
//
// TPU-native framework counterpart of the role ASTRA's C++/CUDA plays in the
// reference (offline geometry/matrix work; see SURVEY.md §2.9): the hot
// *online* path runs in XLA on the TPU, while the one-time host-side
// assembly of sparse system matrices is done here, multithreaded, instead of
// in numpy:
//
//  - joseph_parallel_coo: 2D parallel-beam Joseph system matrix
//    (same discretization as physics/geometry.py:joseph_system_matrix).
//  - cone_slice_coo: masked single-slice cone-beam matrix by uniform
//    ray sampling with bilinear in-plane / summed-z weights (same
//    discretization as physics/cone_beam.py:masked_slice_matrix).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// Build: scripts/build_native.sh  ->  native/libprojector.so
#include <algorithm>
#include <cmath>
#include <functional>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Triplet {
  int64_t row;
  int64_t col;
  float val;
};

void parallel_for(int64_t n, int num_threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  if (num_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// 2D parallel-beam Joseph system matrix.
//   angles: (A,) radians; image HxW unit cells centred at origin;
//   detector D bins spacing `det_spacing` centred at 0.
// Writes up to cap triplets into (rows, cols, vals); returns count or -1 if
// cap too small.  Row index = a*D + d; col = i*W + j.
int64_t joseph_parallel_coo(const double* angles, int64_t num_angles,
                            int64_t H, int64_t W, int64_t D,
                            double det_spacing, int num_threads,
                            int64_t* rows, int64_t* cols, float* vals,
                            int64_t cap) {
  std::vector<std::vector<Triplet>> per_angle(num_angles);
  parallel_for(num_angles, num_threads, [&](int64_t a_lo, int64_t a_hi) {
    for (int64_t a = a_lo; a < a_hi; ++a) {
      double th = angles[a];
      double c = std::cos(th), s = std::sin(th);
      auto& out = per_angle[a];
      out.reserve(static_cast<size_t>(D) * (std::max(H, W) * 2 + 2));
      if (std::fabs(c) >= std::fabs(s)) {
        double step = 1.0 / std::fabs(c);
        for (int64_t d = 0; d < D; ++d) {
          double t = (d - (D - 1) / 2.0) * det_spacing;
          for (int64_t i = 0; i < H; ++i) {
            double y = (H - 1) / 2.0 - i;
            double x = (t - y * s) / c;
            double j = x + (W - 1) / 2.0;
            int64_t j0 = static_cast<int64_t>(std::floor(j));
            double f = j - j0;
            double w0 = (1.0 - f) * step, w1 = f * step;
            if (j0 >= 0 && j0 < W && w0 != 0.0)
              out.push_back({a * D + d, i * W + j0, static_cast<float>(w0)});
            if (j0 + 1 >= 0 && j0 + 1 < W && w1 != 0.0)
              out.push_back({a * D + d, i * W + j0 + 1, static_cast<float>(w1)});
          }
        }
      } else {
        double step = 1.0 / std::fabs(s);
        for (int64_t d = 0; d < D; ++d) {
          double t = (d - (D - 1) / 2.0) * det_spacing;
          for (int64_t j = 0; j < W; ++j) {
            double x = j - (W - 1) / 2.0;
            double y = (t - x * c) / s;
            double i = (H - 1) / 2.0 - y;
            int64_t i0 = static_cast<int64_t>(std::floor(i));
            double f = i - i0;
            double w0 = (1.0 - f) * step, w1 = f * step;
            if (i0 >= 0 && i0 < H && w0 != 0.0)
              out.push_back({a * D + d, i0 * W + j, static_cast<float>(w0)});
            if (i0 + 1 >= 0 && i0 + 1 < H && w1 != 0.0)
              out.push_back({a * D + d, (i0 + 1) * W + j, static_cast<float>(w1)});
          }
        }
      }
    }
  });

  int64_t total = 0;
  for (auto& v : per_angle) total += static_cast<int64_t>(v.size());
  if (total > cap) return -1;
  int64_t off = 0;
  for (auto& v : per_angle) {
    for (auto& tr : v) {
      rows[off] = tr.row;
      cols[off] = tr.col;
      vals[off] = tr.val;
      ++off;
    }
  }
  return total;
}

// Masked single-slice cone-beam matrix (edge-padded slab).
//   src, det: (N, 3) world positions of masked rays (xyz);
//   volume (NZ, NY, NX) voxels of size `vox` centred at origin;
//   n_steps uniform samples along the in-AABB chord.
// Accumulates dense per-ray rows into a COO stream with bilinear (x, y)
// weights times the summed z-interpolation weight (see
// physics/cone_beam.py:masked_slice_matrix).
int64_t cone_slice_coo(const double* src, const double* det, int64_t n_rays,
                       int64_t NZ, int64_t NY, int64_t NX, double vox,
                       int64_t n_steps, int num_threads,
                       int64_t* rows, int64_t* cols, float* vals,
                       int64_t cap) {
  double hx = NX * vox / 2.0, hy = NY * vox / 2.0, hz = NZ * vox / 2.0;
  const double half[3] = {hx, hy, hz};

  std::vector<std::vector<Triplet>> per_ray(n_rays);
  parallel_for(n_rays, num_threads, [&](int64_t lo, int64_t hi) {
    std::vector<double> acc(static_cast<size_t>(NY) * NX);
    for (int64_t r = lo; r < hi; ++r) {
      const double* s = src + 3 * r;
      const double* d = det + 3 * r;
      double dir[3] = {d[0] - s[0], d[1] - s[1], d[2] - s[2]};
      double t_in = -1e30, t_out = 1e30;
      for (int ax = 0; ax < 3; ++ax) {
        double dd = dir[ax];
        if (std::fabs(dd) < 1e-12) dd = dd < 0 ? -1e-12 : 1e-12;
        double t1 = (-half[ax] - s[ax]) / dd;
        double t2 = (half[ax] - s[ax]) / dd;
        t_in = std::max(t_in, std::min(t1, t2));
        t_out = std::min(t_out, std::max(t1, t2));
      }
      if (t_out < t_in) t_out = t_in;
      double norm = std::sqrt(dir[0] * dir[0] + dir[1] * dir[1] +
                              dir[2] * dir[2]);
      double seg = (t_out - t_in) * norm / (n_steps - 1);

      std::fill(acc.begin(), acc.end(), 0.0);
      for (int64_t k = 0; k < n_steps; ++k) {
        double t = t_in + (t_out - t_in) * k / (n_steps - 1);
        double px = s[0] + t * dir[0];
        double py = s[1] + t * dir[1];
        double pz = s[2] + t * dir[2];
        double ix = px / vox + (NX - 1) / 2.0;
        double iy = py / vox + (NY - 1) / 2.0;
        double iz = pz / vox + (NZ - 1) / 2.0;
        int64_t z0 = static_cast<int64_t>(std::floor(iz));
        double fz = iz - z0;
        double wz = 0.0;
        if (z0 >= 0 && z0 < NZ) wz += 1.0 - fz;
        if (z0 + 1 >= 0 && z0 + 1 < NZ) wz += fz;
        if (wz == 0.0) continue;
        double wstep = seg * ((k == 0 || k == n_steps - 1) ? 0.5 : 1.0) * wz;
        int64_t x0 = static_cast<int64_t>(std::floor(ix));
        int64_t y0 = static_cast<int64_t>(std::floor(iy));
        double fx = ix - x0, fy = iy - y0;
        for (int dy = 0; dy < 2; ++dy) {
          int64_t yi = y0 + dy;
          if (yi < 0 || yi >= NY) continue;
          double wy = dy ? fy : 1.0 - fy;
          for (int dx = 0; dx < 2; ++dx) {
            int64_t xi = x0 + dx;
            if (xi < 0 || xi >= NX) continue;
            double wx = dx ? fx : 1.0 - fx;
            acc[yi * NX + xi] += wstep * wy * wx;
          }
        }
      }
      auto& out = per_ray[r];
      for (int64_t p = 0; p < NY * NX; ++p) {
        if (acc[p] != 0.0)
          out.push_back({r, p, static_cast<float>(acc[p])});
      }
    }
  });

  int64_t total = 0;
  for (auto& v : per_ray) total += static_cast<int64_t>(v.size());
  if (total > cap) return -1;
  int64_t off = 0;
  for (auto& v : per_ray) {
    for (auto& tr : v) {
      rows[off] = tr.row;
      cols[off] = tr.col;
      vals[off] = tr.val;
      ++off;
    }
  }
  return total;
}

}  // extern "C"
