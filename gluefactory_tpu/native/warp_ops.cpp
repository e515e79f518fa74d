// Native host-side image ops for the data pipeline.
//
// The reference's data path leans on OpenCV's C++ (warpPerspective, resize,
// color conversion — SURVEY §2.9). This module provides the framework's own
// native implementations so the hot per-sample CPU work of the homography
// data pipeline (inverse-warp + photometric transforms) does not depend on
// OpenCV and can be threaded with OpenMP. Exposed via ctypes
// (gluefactory_tpu/native/__init__.py) with a NumPy fallback.
//
// All images are float32 HWC, C contiguous.

#include <cmath>
#include <cstdint>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// dst(x, y) = src(H^-1 (x, y)) bilinear, zero outside (cv2.warpPerspective
// semantics with INTER_LINEAR + BORDER_CONSTANT). h_inv is ROW-MAJOR 3x3 of
// the INVERSE map (dst -> src), precomputed by the caller.
void warp_perspective_f32(
    const float* src, int sh, int sw, int c,
    const double* h_inv,
    float* dst, int dh, int dw) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int y = 0; y < dh; ++y) {
        for (int x = 0; x < dw; ++x) {
            // raw-coordinate convention (cv2.warpPerspective): dst(x, y)
            // samples src at H^-1 (x, y) with no half-pixel offsets, which
            // also matches geometry.warp_points keypoint semantics
            double px = x, py = y;
            double sx = h_inv[0] * px + h_inv[1] * py + h_inv[2];
            double sy = h_inv[3] * px + h_inv[4] * py + h_inv[5];
            double sz = h_inv[6] * px + h_inv[7] * py + h_inv[8];
            if (std::fabs(sz) < 1e-12) sz = 1e-12;
            double ux = sx / sz;
            double uy = sy / sz;
            int x0 = (int)std::floor(ux);
            int y0 = (int)std::floor(uy);
            double wx = ux - x0, wy = uy - y0;
            float* out = dst + ((size_t)y * dw + x) * c;
            if (x0 < -1 || y0 < -1 || x0 >= sw || y0 >= sh) {
                for (int k = 0; k < c; ++k) out[k] = 0.f;
                continue;
            }
            int x0c = std::max(x0, 0), x1c = std::min(x0 + 1, sw - 1);
            int y0c = std::max(y0, 0), y1c = std::min(y0 + 1, sh - 1);
            // zero contribution from out-of-bounds neighbors
            double w00 = (x0 >= 0 && y0 >= 0) ? (1 - wx) * (1 - wy) : 0.0;
            double w01 = (x0 + 1 < sw && y0 >= 0) ? wx * (1 - wy) : 0.0;
            double w10 = (x0 >= 0 && y0 + 1 < sh) ? (1 - wx) * wy : 0.0;
            double w11 = (x0 + 1 < sw && y0 + 1 < sh) ? wx * wy : 0.0;
            const float* p00 = src + ((size_t)y0c * sw + x0c) * c;
            const float* p01 = src + ((size_t)y0c * sw + x1c) * c;
            const float* p10 = src + ((size_t)y1c * sw + x0c) * c;
            const float* p11 = src + ((size_t)y1c * sw + x1c) * c;
            for (int k = 0; k < c; ++k) {
                out[k] = (float)(w00 * p00[k] + w01 * p01[k] +
                                 w10 * p10[k] + w11 * p11[k]);
            }
        }
    }
}

// out = clip(img * alpha + beta, 0, 1), in place allowed
void brightness_contrast_f32(const float* src, float* dst, int64_t n,
                             float alpha, float beta) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) {
        float v = src[i] * alpha + beta;
        dst[i] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
    }
}

// RGB (HWC) -> grayscale (HW1) with BT.601 weights
void rgb_to_gray_f32(const float* src, float* dst, int h, int w) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < (int64_t)h * w; ++i) {
        const float* p = src + i * 3;
        dst[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
    }
}

// area-style downscale by arbitrary factor via bilinear on the fly
void resize_bilinear_f32(const float* src, int sh, int sw, int c,
                         float* dst, int dh, int dw) {
    double fx = (double)sw / dw, fy = (double)sh / dh;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int y = 0; y < dh; ++y) {
        for (int x = 0; x < dw; ++x) {
            double ux = (x + 0.5) * fx - 0.5;
            double uy = (y + 0.5) * fy - 0.5;
            int x0 = (int)std::floor(ux), y0 = (int)std::floor(uy);
            double wx = ux - x0, wy = uy - y0;
            int x0c = std::clamp(x0, 0, sw - 1), x1c = std::clamp(x0 + 1, 0, sw - 1);
            int y0c = std::clamp(y0, 0, sh - 1), y1c = std::clamp(y0 + 1, 0, sh - 1);
            const float* p00 = src + ((size_t)y0c * sw + x0c) * c;
            const float* p01 = src + ((size_t)y0c * sw + x1c) * c;
            const float* p10 = src + ((size_t)y1c * sw + x0c) * c;
            const float* p11 = src + ((size_t)y1c * sw + x1c) * c;
            float* out = dst + ((size_t)y * dw + x) * c;
            for (int k = 0; k < c; ++k) {
                out[k] = (float)((1 - wx) * (1 - wy) * p00[k] + wx * (1 - wy) * p01[k] +
                                 (1 - wx) * wy * p10[k] + wx * wy * p11[k]);
            }
        }
    }
}

}  // extern "C"
