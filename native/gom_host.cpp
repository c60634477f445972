// gom_host: native host-side image pipeline for gomavatar_tpu.
//
// The reference leans on OpenCV's native kernels for its per-frame host
// work (cv2.undistort + cv2.resize + background compositing, three separate
// full-image passes: dataset/train.py:149-172).  This library fuses them
// into ONE pass per output pixel — inverse-map through the resize scale,
// apply the Brown-Conrady distortion model, bilinear-sample image+mask,
// composite over the background color — parallelized across rows with
// OpenMP.  Exposed over a plain C ABI for ctypes (no pybind11 in this
// toolchain).
//
// Build: make -C native   (produces libgomhost.so)

#include <cstdint>
#include <cmath>
#include <algorithm>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Intrinsics {
  double fx, fy, cx, cy;
};

// forward distortion: normalized undistorted (x, y) -> distorted (xd, yd)
inline void distort(double x, double y, const double* D, int n_d, double& xd,
                    double& yd) {
  const double k1 = n_d > 0 ? D[0] : 0.0;
  const double k2 = n_d > 1 ? D[1] : 0.0;
  const double p1 = n_d > 2 ? D[2] : 0.0;
  const double p2 = n_d > 3 ? D[3] : 0.0;
  const double k3 = n_d > 4 ? D[4] : 0.0;
  const double r2 = x * x + y * y;
  const double radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3));
  xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x);
  yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y;
}

template <typename T>
inline float sample_bilinear(const T* buf, int H, int W, int C, double u,
                             double v, int c) {
  // clamp-to-edge bilinear
  u = std::min(std::max(u, 0.0), double(W - 1));
  v = std::min(std::max(v, 0.0), double(H - 1));
  const int x0 = int(u), y0 = int(v);
  const int x1 = std::min(x0 + 1, W - 1), y1 = std::min(y0 + 1, H - 1);
  const double fx = u - x0, fy = v - y0;
  const double a = buf[(y0 * W + x0) * C + c];
  const double b = buf[(y0 * W + x1) * C + c];
  const double d = buf[(y1 * W + x0) * C + c];
  const double e = buf[(y1 * W + x1) * C + c];
  return float((a * (1 - fx) + b * fx) * (1 - fy) + (d * (1 - fx) + e * fx) * fy);
}

}  // namespace

extern "C" {

// Fused undistort + resize + composite.
//  img:   (H, W, 3) uint8;  mask: (H, W) uint8 (0..255)
//  K:     row-major 3x3 (pixel intrinsics of the INPUT image)
//  D:     n_d distortion coefficients (k1 k2 p1 p2 k3); n_d == 0 -> none
//  out:   (outH, outW, 3) float32 in [0, 255]; out_mask: (outH, outW) in [0, 1]
//  bgcolor: 3 floats in [0, 255]
// The output grid maps to input coords by (u_in = (u_out + 0.5) * W / outW
// - 0.5) — standard resize convention — then through the distortion model
// around the intrinsics.
void undistort_resize_composite(const uint8_t* img, const uint8_t* mask,
                                int H, int W, const double* K,
                                const double* D, int n_d,
                                const float* bgcolor, float* out_img,
                                float* out_mask, int outH, int outW) {
  const Intrinsics in{K[0], K[4], K[2], K[5]};
  const double sx = double(W) / outW, sy = double(H) / outH;

#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int v = 0; v < outH; ++v) {
    for (int u = 0; u < outW; ++u) {
      // output pixel -> full-res undistorted pixel
      const double ux = (u + 0.5) * sx - 0.5;
      const double uy = (v + 0.5) * sy - 0.5;
      double src_u = ux, src_v = uy;
      if (n_d > 0) {
        // normalized coords, forward-distort, back to pixels
        const double xn = (ux - in.cx) / in.fx;
        const double yn = (uy - in.cy) / in.fy;
        double xd, yd;
        distort(xn, yn, D, n_d, xd, yd);
        src_u = xd * in.fx + in.cx;
        src_v = yd * in.fy + in.cy;
      }
      const float a = sample_bilinear(mask, H, W, 1, src_u, src_v, 0) / 255.0f;
      float* po = &out_img[(v * outW + u) * 3];
      for (int c = 0; c < 3; ++c) {
        const float px = sample_bilinear(img, H, W, 3, src_u, src_v, c);
        po[c] = a * px + (1.0f - a) * bgcolor[c];
      }
      out_mask[v * outW + u] = a;
    }
  }
}

// Rodrigues rotation (host): rvec (3,) -> R row-major (9,)
void rodrigues(const double* rvec, double* R) {
  const double x = rvec[0], y = rvec[1], z = rvec[2];
  const double th = std::sqrt(x * x + y * y + z * z);
  if (th < 1e-12) {
    for (int i = 0; i < 9; ++i) R[i] = (i % 4 == 0) ? 1.0 : 0.0;
    return;
  }
  const double kx = x / th, ky = y / th, kz = z / th;
  const double c = std::cos(th), s = std::sin(th), t = 1.0 - c;
  R[0] = c + kx * kx * t;      R[1] = kx * ky * t - kz * s;  R[2] = kx * kz * t + ky * s;
  R[3] = ky * kx * t + kz * s; R[4] = c + ky * ky * t;       R[5] = ky * kz * t - kx * s;
  R[6] = kz * kx * t - ky * s; R[7] = kz * ky * t + kx * s;  R[8] = c + kz * kz * t;
}

}  // extern "C"
