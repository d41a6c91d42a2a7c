// Fused geometric-consistency kernel for depth-map fusion.
//
// Native (C++/OpenMP) replacement for the reference's numba-JIT reprojection
// kernels + two cv2.remap calls (/root/reference/eval.py:113-182), fused into
// a single pass over reference pixels:
//   ref pixel -> lift by predicted depth -> project into src view
//   -> bilinear-sample src depth & color -> reproject back into ref
//   -> accept if the round trip lands within 1 px and 1% relative depth.
//
// Build: g++ -O3 -shared -fPIC -fopenmp (see fusion/native.py).

#include <cmath>
#include <cstdint>

namespace {

// Bilinear sample with zero border (cv2.remap INTER_LINEAR + BORDER_CONSTANT 0
// semantics: each out-of-bounds tap contributes zero).
inline float sample1(const float* img, int H, int W, float x, float y) {
  if (!(std::isfinite(x) && std::isfinite(y))) return 0.f;
  const int x0 = (int)std::floor(x), y0 = (int)std::floor(y);
  const float fx = x - x0, fy = y - y0;
  float acc = 0.f;
  for (int dy = 0; dy < 2; ++dy) {
    const int yy = y0 + dy;
    if (yy < 0 || yy >= H) continue;
    const float wy = dy ? fy : 1.f - fy;
    for (int dx = 0; dx < 2; ++dx) {
      const int xx = x0 + dx;
      if (xx < 0 || xx >= W) continue;
      const float wx = dx ? fx : 1.f - fx;
      acc += wy * wx * img[yy * W + xx];
    }
  }
  return acc;
}

inline void sample3(const float* img, int H, int W, float x, float y,
                    float out[3]) {
  out[0] = out[1] = out[2] = 0.f;
  if (!(std::isfinite(x) && std::isfinite(y))) return;
  const int x0 = (int)std::floor(x), y0 = (int)std::floor(y);
  const float fx = x - x0, fy = y - y0;
  for (int dy = 0; dy < 2; ++dy) {
    const int yy = y0 + dy;
    if (yy < 0 || yy >= H) continue;
    const float wy = dy ? fy : 1.f - fy;
    for (int dx = 0; dx < 2; ++dx) {
      const int xx = x0 + dx;
      if (xx < 0 || xx >= W) continue;
      const float w = wy * (dx ? fx : 1.f - fx);
      const float* p = img + (yy * W + xx) * 3;
      out[0] += w * p[0];
      out[1] += w * p[1];
      out[2] += w * p[2];
    }
  }
}

}  // namespace

extern "C" {

// depth_ref/depth_src: (H, W) f32; image_src: (H, W, 3) f32;
// P_r2s/P_s2r: (3, 4) f64 row-major; outputs preallocated.
void geo_consistency(const float* depth_ref, const float* depth_src,
                     const float* image_src, const double* P_r2s,
                     const double* P_s2r, float* out_depth,
                     uint8_t* out_mask, float* out_image, int H, int W) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      const int idx = y * W + x;
      const double d = depth_ref[idx];
      out_depth[idx] = 0.f;
      out_mask[idx] = 0;
      float* oc = out_image + idx * 3;
      oc[0] = oc[1] = oc[2] = 0.f;

      // ref -> src
      const double hx = x * d, hy = y * d;
      const double qx = P_r2s[0] * hx + P_r2s[1] * hy + P_r2s[2] * d + P_r2s[3];
      const double qy = P_r2s[4] * hx + P_r2s[5] * hy + P_r2s[6] * d + P_r2s[7];
      const double qz = P_r2s[8] * hx + P_r2s[9] * hy + P_r2s[10] * d + P_r2s[11];
      const float xs = (float)(qx / qz);
      const float ys = (float)(qy / qz);
      const float ds = sample1(depth_src, H, W, xs, ys);

      // src -> ref with the sampled depth
      const double sx = (double)xs * ds, sy = (double)ys * ds;
      const double rx = P_s2r[0] * sx + P_s2r[1] * sy + P_s2r[2] * ds + P_s2r[3];
      const double ry = P_s2r[4] * sx + P_s2r[5] * sy + P_s2r[6] * ds + P_s2r[7];
      const double rz = P_s2r[8] * sx + P_s2r[9] * sy + P_s2r[10] * ds + P_s2r[11];
      const double xr = rx / rz, yr = ry / rz;

      const double pix2 = (xr - x) * (xr - x) + (yr - y) * (yr - y);
      const double rel = std::fabs((rz - d) / d);
      if (std::isfinite(pix2) && std::isfinite(rel) && pix2 < 1.0 &&
          rel < 0.01) {
        out_depth[idx] = (float)rz;
        out_mask[idx] = 1;
        sample3(image_src, H, W, xs, ys, oc);
      }
    }
  }
}

// Back-project masked pixels to world space:
// xyz_world = inv(P_world2ref) @ [x*d, y*d, d, 1]. Returns count written.
int backproject_points(const float* depth, const uint8_t* mask,
                       const float* colors, const double* P_inv, int H, int W,
                       int skip, float* out_xyz, uint8_t* out_rgb) {
  int n = 0;
  int kept = 0;
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      const int idx = y * W + x;
      if (!mask[idx]) continue;
      if ((kept++) % skip) continue;
      const double d = depth[idx];
      const double hx = x * d, hy = y * d;
      out_xyz[n * 3 + 0] =
          (float)(P_inv[0] * hx + P_inv[1] * hy + P_inv[2] * d + P_inv[3]);
      out_xyz[n * 3 + 1] =
          (float)(P_inv[4] * hx + P_inv[5] * hy + P_inv[6] * d + P_inv[7]);
      out_xyz[n * 3 + 2] =
          (float)(P_inv[8] * hx + P_inv[9] * hy + P_inv[10] * d + P_inv[11]);
      const float* c = colors + idx * 3;
      out_rgb[n * 3 + 0] = (uint8_t)(c[0] < 0 ? 0 : (c[0] > 255 ? 255 : c[0]));
      out_rgb[n * 3 + 1] = (uint8_t)(c[1] < 0 ? 0 : (c[1] > 255 ? 255 : c[1]));
      out_rgb[n * 3 + 2] = (uint8_t)(c[2] < 0 ? 0 : (c[2] > 255 ? 255 : c[2]));
      ++n;
    }
  }
  return n;
}

}  // extern "C"
