// Native LSD line segment detector.
//
// The reference's line detector is pytlsd, a C++ binding of the published
// LSD algorithm (von Gioi et al., "LSD: a Line Segment Detector", IPOL 2012)
// — see reference gluefactory/models/lines/lsd.py:4,26 and SURVEY §2.9.
// This is the framework's own from-scratch C++ implementation of that
// published algorithm (gradient level-line field, greedy region growing,
// rectangle approximation, NFA validation by binomial tail), so the line
// stack has no OpenCV/pytlsd dependency. Exposed via ctypes
// (gluefactory_tpu/native/__init__.py, lsd_detect()).
//
// Input: float32 grayscale image in [0, 1], row-major (h, w).
// Output rows: x1, y1, x2, y2, width, precision(deg frac), -log10(NFA).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

constexpr double kNotDef = -1024.0;  // marker for undefined level-line angle
constexpr double kPi = 3.14159265358979323846;

struct DImage {
    int w = 0, h = 0;
    std::vector<double> data;
    DImage() = default;
    DImage(int w_, int h_, double v = 0.0) : w(w_), h(h_), data((size_t)w_ * h_, v) {}
    double& at(int x, int y) { return data[(size_t)y * w + x]; }
    double at(int x, int y) const { return data[(size_t)y * w + x]; }
};

struct Point {
    int x, y;
};

// ---------------------------------------------------------------------------
// Gaussian downscale (anti-aliased) — LSD runs at scale 0.8 by default.
// ---------------------------------------------------------------------------

static std::vector<double> gaussian_kernel(double sigma, int& radius) {
    // cutoff where the Gaussian drops below 1/1000 of its peak
    radius = (int)std::ceil(sigma * std::sqrt(2.0 * 3.0 * std::log(10.0)));
    std::vector<double> k(2 * radius + 1);
    double sum = 0.0;
    for (int i = -radius; i <= radius; ++i) {
        double v = std::exp(-0.5 * (i * i) / (sigma * sigma));
        k[i + radius] = v;
        sum += v;
    }
    for (double& v : k) v /= sum;
    return k;
}

static DImage gaussian_subsample(const DImage& in, double scale, double sigma_scale) {
    if (scale >= 1.0) return in;
    const double sigma = (scale < 1.0) ? sigma_scale / scale : sigma_scale;
    int radius = 0;
    std::vector<double> k = gaussian_kernel(sigma, radius);

    // separable blur with edge clamping
    DImage tmp(in.w, in.h), blur(in.w, in.h);
    for (int y = 0; y < in.h; ++y)
        for (int x = 0; x < in.w; ++x) {
            double acc = 0.0;
            for (int i = -radius; i <= radius; ++i) {
                int xx = std::min(std::max(x + i, 0), in.w - 1);
                acc += k[i + radius] * in.at(xx, y);
            }
            tmp.at(x, y) = acc;
        }
    for (int y = 0; y < in.h; ++y)
        for (int x = 0; x < in.w; ++x) {
            double acc = 0.0;
            for (int i = -radius; i <= radius; ++i) {
                int yy = std::min(std::max(y + i, 0), in.h - 1);
                acc += k[i + radius] * tmp.at(x, yy);
            }
            blur.at(x, y) = acc;
        }

    const int nw = std::max(2, (int)std::lround(in.w * scale));
    const int nh = std::max(2, (int)std::lround(in.h * scale));
    DImage out(nw, nh);
    for (int y = 0; y < nh; ++y)
        for (int x = 0; x < nw; ++x) {
            // bilinear sample of the blurred image at the source position
            double sx = x / scale, sy = y / scale;
            int x0 = std::min((int)sx, in.w - 1), y0 = std::min((int)sy, in.h - 1);
            int x1 = std::min(x0 + 1, in.w - 1), y1 = std::min(y0 + 1, in.h - 1);
            double fx = sx - x0, fy = sy - y0;
            out.at(x, y) = (1 - fx) * (1 - fy) * blur.at(x0, y0) +
                           fx * (1 - fy) * blur.at(x1, y0) +
                           (1 - fx) * fy * blur.at(x0, y1) +
                           fx * fy * blur.at(x1, y1);
        }
    return out;
}

// ---------------------------------------------------------------------------
// Level-line field: 2x2 gradient, angle orthogonal to the gradient.
// ---------------------------------------------------------------------------

static void compute_gradient(const DImage& img, DImage& angles, DImage& mags,
                             double threshold) {
    angles = DImage(img.w, img.h, kNotDef);
    mags = DImage(img.w, img.h, 0.0);
    for (int y = 0; y < img.h - 1; ++y)
        for (int x = 0; x < img.w - 1; ++x) {
            double a = img.at(x, y), b = img.at(x + 1, y);
            double c = img.at(x, y + 1), d = img.at(x + 1, y + 1);
            double gx = (b - a + d - c) / 2.0;
            double gy = (c - a + d - b) / 2.0;
            double norm = std::sqrt(gx * gx + gy * gy);
            mags.at(x, y) = norm;
            if (norm > threshold)
                angles.at(x, y) = std::atan2(gx, -gy);  // level-line angle
        }
}

// ---------------------------------------------------------------------------
// Pseudo-ordering of seed pixels by gradient magnitude (descending bins).
// ---------------------------------------------------------------------------

static std::vector<Point> pseudo_sort(const DImage& mags, int n_bins) {
    double max_mag = 0.0;
    for (double v : mags.data) max_mag = std::max(max_mag, v);
    std::vector<std::vector<Point>> bins(n_bins);
    if (max_mag <= 0.0) return {};
    for (int y = 0; y < mags.h; ++y)
        for (int x = 0; x < mags.w; ++x) {
            double v = mags.at(x, y);
            if (v <= 0.0) continue;
            int b = std::min((int)(v / max_mag * n_bins), n_bins - 1);
            bins[b].push_back({x, y});
        }
    std::vector<Point> order;
    order.reserve(mags.data.size());
    for (int b = n_bins - 1; b >= 0; --b)
        order.insert(order.end(), bins[b].begin(), bins[b].end());
    return order;
}

// ---------------------------------------------------------------------------
// Angle utilities.
// ---------------------------------------------------------------------------

static double angle_diff(double a, double b) {
    double d = a - b;
    while (d <= -kPi) d += 2.0 * kPi;
    while (d > kPi) d -= 2.0 * kPi;
    return std::fabs(d);
}

static bool is_aligned(double pixel_angle, double theta, double prec) {
    if (pixel_angle == kNotDef) return false;
    double d = angle_diff(pixel_angle, theta);
    // level-line angles are modulo pi for alignment purposes
    if (d > kPi / 2.0 + prec) d = kPi - d;
    return d <= prec;
}

// ---------------------------------------------------------------------------
// Region growing: collect 8-connected pixels whose level-line angle agrees
// with the (running) region angle within `prec`.
// ---------------------------------------------------------------------------

static void region_grow(int sx, int sy, const DImage& angles, std::vector<uint8_t>& used,
                        double prec, std::vector<Point>& region, double& reg_angle) {
    region.clear();
    region.push_back({sx, sy});
    reg_angle = angles.at(sx, sy);
    double sumdx = std::cos(reg_angle), sumdy = std::sin(reg_angle);
    used[(size_t)sy * angles.w + sx] = 1;

    for (size_t i = 0; i < region.size(); ++i) {
        Point p = region[i];
        for (int dy = -1; dy <= 1; ++dy)
            for (int dx = -1; dx <= 1; ++dx) {
                int nx = p.x + dx, ny = p.y + dy;
                if (nx < 0 || ny < 0 || nx >= angles.w || ny >= angles.h) continue;
                size_t idx = (size_t)ny * angles.w + nx;
                if (used[idx]) continue;
                double a = angles.at(nx, ny);
                if (a == kNotDef || !is_aligned(a, reg_angle, prec)) continue;
                used[idx] = 1;
                region.push_back({nx, ny});
                sumdx += std::cos(a);
                sumdy += std::sin(a);
                reg_angle = std::atan2(sumdy, sumdx);
            }
    }
}

// ---------------------------------------------------------------------------
// Rectangle approximation of a region.
// ---------------------------------------------------------------------------

struct Rect {
    double x1, y1, x2, y2;  // endpoints of the main axis
    double width;
    double cx, cy;      // center
    double theta;       // main-axis angle
    double dx, dy;      // main-axis direction (cos/sin theta)
    double prec;        // alignment tolerance (rad)
    double p;           // prec / pi
};

static double region_theta(const std::vector<Point>& region, const DImage& mags,
                           double cx, double cy, double reg_angle, double prec) {
    // main inertia axis of the magnitude-weighted region
    double ixx = 0.0, iyy = 0.0, ixy = 0.0;
    for (const Point& pt : region) {
        double w = mags.at(pt.x, pt.y);
        double dx = pt.x - cx, dy = pt.y - cy;
        ixx += w * dy * dy;
        iyy += w * dx * dx;
        ixy -= w * dx * dy;
    }
    double lambda = (ixx + iyy - std::sqrt((ixx - iyy) * (ixx - iyy) + 4.0 * ixy * ixy)) / 2.0;
    double theta = (std::fabs(ixx) > std::fabs(iyy))
                       ? std::atan2(lambda - ixx, ixy)
                       : std::atan2(ixy, lambda - iyy);
    // the inertia axis is modulo pi: pick the orientation closer to the
    // region's level-line angle
    if (angle_diff(theta, reg_angle) > prec) theta += kPi;
    if (theta > kPi) theta -= 2.0 * kPi;
    return theta;
}

static Rect region_to_rect(const std::vector<Point>& region, const DImage& mags,
                           double reg_angle, double prec, double p) {
    double cx = 0.0, cy = 0.0, wsum = 0.0;
    for (const Point& pt : region) {
        double w = mags.at(pt.x, pt.y);
        cx += w * pt.x;
        cy += w * pt.y;
        wsum += w;
    }
    if (wsum <= 0.0) wsum = 1.0;
    cx /= wsum;
    cy /= wsum;

    double theta = region_theta(region, mags, cx, cy, reg_angle, prec);
    double dx = std::cos(theta), dy = std::sin(theta);

    double lmin = 0.0, lmax = 0.0, wmin = 0.0, wmax = 0.0;
    for (const Point& pt : region) {
        double l = (pt.x - cx) * dx + (pt.y - cy) * dy;
        double w = -(pt.x - cx) * dy + (pt.y - cy) * dx;
        lmin = std::min(lmin, l);
        lmax = std::max(lmax, l);
        wmin = std::min(wmin, w);
        wmax = std::max(wmax, w);
    }

    Rect r;
    r.x1 = cx + lmin * dx;
    r.y1 = cy + lmin * dy;
    r.x2 = cx + lmax * dx;
    r.y2 = cy + lmax * dy;
    r.width = std::max(wmax - wmin, 1.0);
    r.cx = cx;
    r.cy = cy;
    r.theta = theta;
    r.dx = dx;
    r.dy = dy;
    r.prec = prec;
    r.p = p;
    return r;
}

// ---------------------------------------------------------------------------
// NFA of a rectangle: count aligned pixels inside, binomial tail bound.
// ---------------------------------------------------------------------------

static double log_gamma(double x) { return std::lgamma(x); }

// -log10( NT * P[B(n, p) >= k] )  — larger is more meaningful
static double nfa_score(int n, int k, double p, double logNT) {
    if (n == 0 || k == 0) return -logNT;
    if (n == k) return -logNT - (double)n * std::log10(p);
    double p_term = p / (1.0 - p);
    // first term of the binomial tail
    double log1term = log_gamma(n + 1.0) - log_gamma(k + 1.0) - log_gamma(n - k + 1.0) +
                      (double)k * std::log(p) + (double)(n - k) * std::log(1.0 - p);
    double term = std::exp(log1term);
    if (term == 0.0) {
        // underflow: use the largest term as the bound
        if ((double)k > (double)n * p)
            return -log1term / std::log(10.0) - logNT;
        return -logNT;
    }
    double bin_tail = term;
    double tolerance = 0.1;
    for (int i = k; i < n; ++i) {
        double bin_term = (double)(n - i) / (double)(i + 1);
        double mult = bin_term * p_term;
        term *= mult;
        bin_tail += term;
        if (bin_term < 1.0) {
            // terms decrease geometrically: bound the remainder and stop
            double err = term * ((1.0 - std::pow(mult, (double)(n - i))) / (1.0 - mult) - 1.0);
            if (err < tolerance * std::fabs(-std::log10(bin_tail) - logNT) * bin_tail) break;
        }
    }
    return -std::log10(bin_tail) - logNT;
}

static double rect_nfa(const Rect& r, const DImage& angles, double logNT) {
    int n = 0, k = 0;
    // walk the rectangle's bounding box, test point-in-rectangle
    double hw = r.width / 2.0;
    double cxs[4] = {r.x1 - r.dy * hw, r.x1 + r.dy * hw, r.x2 + r.dy * hw, r.x2 - r.dy * hw};
    double cys[4] = {r.y1 + r.dx * hw, r.y1 - r.dx * hw, r.y2 - r.dx * hw, r.y2 + r.dx * hw};
    double xmin = cxs[0], xmax = cxs[0], ymin = cys[0], ymax = cys[0];
    for (int i = 1; i < 4; ++i) {
        xmin = std::min(xmin, cxs[i]);
        xmax = std::max(xmax, cxs[i]);
        ymin = std::min(ymin, cys[i]);
        ymax = std::max(ymax, cys[i]);
    }
    int x0 = std::max(0, (int)std::floor(xmin)), x1 = std::min(angles.w - 1, (int)std::ceil(xmax));
    int y0 = std::max(0, (int)std::floor(ymin)), y1 = std::min(angles.h - 1, (int)std::ceil(ymax));
    double len = std::hypot(r.x2 - r.x1, r.y2 - r.y1);
    for (int y = y0; y <= y1; ++y)
        for (int x = x0; x <= x1; ++x) {
            double l = (x - r.cx) * r.dx + (y - r.cy) * r.dy;
            double w = -(x - r.cx) * r.dy + (y - r.cy) * r.dx;
            if (std::fabs(l) > len / 2.0 || std::fabs(w) > hw) continue;
            ++n;
            if (is_aligned(angles.at(x, y), r.theta, r.prec)) ++k;
        }
    return nfa_score(n, k, r.p, logNT);
}

// try rectangle variations (finer precision, thinner widths) to improve NFA
static double rect_improve(Rect& r, const DImage& angles, double logNT, double log_eps) {
    double best = rect_nfa(r, angles, logNT);
    if (best > log_eps) return best;
    const double delta = 0.5;

    Rect t = r;  // halve the precision a few times
    for (int i = 0; i < 5 && best <= log_eps; ++i) {
        t.p /= 2.0;
        t.prec = t.p * kPi;
        double s = rect_nfa(t, angles, logNT);
        if (s > best) {
            best = s;
            r = t;
        }
    }
    t = r;  // shrink width
    for (int i = 0; i < 5 && best <= log_eps; ++i) {
        if (t.width - delta < 0.5) break;
        t.width -= delta;
        double s = rect_nfa(t, angles, logNT);
        if (s > best) {
            best = s;
            r = t;
        }
    }
    // shift one side at a time
    for (int side = 0; side < 2; ++side) {
        t = r;
        for (int i = 0; i < 5 && best <= log_eps; ++i) {
            if (t.width - delta < 0.5) break;
            double sgn = side == 0 ? 1.0 : -1.0;
            t.x1 += sgn * -t.dy * delta / 2.0;
            t.y1 += sgn * t.dx * delta / 2.0;
            t.x2 += sgn * -t.dy * delta / 2.0;
            t.y2 += sgn * t.dx * delta / 2.0;
            t.width -= delta;
            double s = rect_nfa(t, angles, logNT);
            if (s > best) {
                best = s;
                r = t;
            }
        }
    }
    return best;
}

// re-grow with a tighter tolerance estimated from the pixels near the seed
static bool refine_region(std::vector<Point>& region, const DImage& angles,
                          const DImage& mags, std::vector<uint8_t>& used,
                          double& reg_angle, double prec, double density_th,
                          Rect& rect, double p) {
    double len = std::hypot(rect.x2 - rect.x1, rect.y2 - rect.y1);
    double density = (double)region.size() / std::max(len * rect.width, 1.0);
    if (density >= density_th) return true;

    // estimate a new angle tolerance as 2x the std of angles near the seed
    Point seed = region[0];
    double ang_c = angles.at(seed.x, seed.y);
    double sum = 0.0, s_sum = 0.0;
    int n = 0;
    for (const Point& pt : region) {
        double d = std::hypot(pt.x - seed.x, pt.y - seed.y);
        if (d > rect.width) continue;
        double a = angle_diff(angles.at(pt.x, pt.y), ang_c);
        sum += a;
        s_sum += a * a;
        ++n;
    }
    if (n < 2) return false;
    double mean = sum / n;
    double tau = 2.0 * std::sqrt(std::max(s_sum / n - mean * mean, 1e-12));
    tau = std::min(std::max(tau, 1e-3), prec);

    // release and re-grow from the seed with the new tolerance
    for (const Point& pt : region) used[(size_t)pt.y * angles.w + pt.x] = 0;
    region_grow(seed.x, seed.y, angles, used, tau, region, reg_angle);
    if (region.size() < 2) return false;
    rect = region_to_rect(region, mags, reg_angle, tau, tau / kPi);
    len = std::hypot(rect.x2 - rect.x1, rect.y2 - rect.y1);
    density = (double)region.size() / std::max(len * rect.width, 1.0);
    return density >= density_th;
}

}  // namespace

extern "C" {

// Detect line segments. Returns the number of segments written (<= cap).
// out: cap x 7 floats (x1, y1, x2, y2, width, p, -log10 NFA), full-res coords.
int lsd_detect_f32(const float* img_f, int h, int w, float scale_f,
                   float sigma_scale_f, float quant_f, float ang_th_deg,
                   float log_eps_f, float density_th_f, int n_bins, float* out,
                   int cap) {
    const double scale = scale_f, sigma_scale = sigma_scale_f;
    const double quant = quant_f, log_eps = log_eps_f, density_th = density_th_f;
    const double prec = kPi * ang_th_deg / 180.0;
    const double p = ang_th_deg / 180.0;

    DImage img(w, h);
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
            img.at(x, y) = 255.0 * (double)img_f[(size_t)y * w + x];

    DImage work = gaussian_subsample(img, scale, sigma_scale);

    // gradient threshold: suppress pixels whose angle is dominated by
    // quantization noise
    const double grad_th = quant / std::sin(prec);
    DImage angles, mags;
    compute_gradient(work, angles, mags, grad_th);

    // number of tests: all rectangles x width precisions
    const double logNT =
        5.0 * (std::log10((double)work.w) + std::log10((double)work.h)) / 2.0 +
        std::log10(11.0);
    const int min_reg_size = (int)(-logNT / std::log10(p));

    std::vector<Point> order = pseudo_sort(mags, n_bins);
    std::vector<uint8_t> used((size_t)work.w * work.h, 0);

    int count = 0;
    std::vector<Point> region;
    region.reserve(4096);
    for (const Point& seed : order) {
        size_t idx = (size_t)seed.y * work.w + seed.x;
        if (used[idx] || angles.at(seed.x, seed.y) == kNotDef) continue;

        double reg_angle = 0.0;
        region_grow(seed.x, seed.y, angles, used, prec, region, reg_angle);
        if ((int)region.size() < min_reg_size) continue;

        Rect rect = region_to_rect(region, mags, reg_angle, prec, p);
        if (!refine_region(region, angles, mags, used, reg_angle, prec, density_th,
                           rect, p))
            continue;
        if ((int)region.size() < min_reg_size) continue;

        double log_nfa = rect_improve(rect, angles, logNT, log_eps);
        if (log_nfa <= log_eps) continue;

        if (count < cap) {
            float* row = out + (size_t)count * 7;
            // +0.5: gradient value at (x,y) sits between pixels; back to
            // full-resolution coordinates
            row[0] = (float)((rect.x1 + 0.5) / scale);
            row[1] = (float)((rect.y1 + 0.5) / scale);
            row[2] = (float)((rect.x2 + 0.5) / scale);
            row[3] = (float)((rect.y2 + 0.5) / scale);
            row[4] = (float)(rect.width / scale);
            row[5] = (float)rect.p;
            row[6] = (float)log_nfa;
            ++count;
        } else {
            break;
        }
    }
    return count;
}

}  // extern "C"
