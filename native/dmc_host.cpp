// Native host-side data-path kernels for diffusionmodelscustom_tpu.
//
// The reference's input pipeline ran per-sample scipy EDT + PIL resize
// inside Dataset.__getitem__ (data_DANRA_conditional.py:1118-1190,
// SURVEY.md hot-loop #5). These C++ kernels provide the fast host path
// behind ctypes bindings (diffusionmodelscustom_tpu/data/native.py):
//
//   * edt_2d       — exact Euclidean distance transform (Felzenszwalb &
//                    Huttenlocher two-pass algorithm), used for SDF maps.
//   * crop_resize_scale — fused window-crop + bilinear resize + linear
//                    interval rescale for batched cutout loading.
//
// Build: make -C native    (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();
// Large finite stand-in for +inf inside the parabola arithmetic: true
// infinities produce inf-inf = NaN envelope intersections which can walk
// k below 0 (classic FH-EDT pitfall).
constexpr float kBig = 1e20f;

// 1-D squared distance transform of a sampled function f (Felzenszwalh-
// Huttenlocher). Writes result into d; v/z are scratch of size n / n+1.
void dt_1d(const float* f, float* d, int* v, float* z, int n) {
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; ++q) {
    float s;
    while (true) {
      s = ((f[q] + q * (float)q) - (f[v[k]] + v[k] * (float)v[k])) /
          (2.0f * q - 2.0f * v[k]);
      if (s <= z[k]) {
        --k;
      } else {
        break;
      }
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    float dq = q - (float)v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

}  // namespace

extern "C" {

// Exact EDT of a binary mask: out[i] = euclidean distance from cell i to
// the nearest nonzero cell (0 where mask != 0). Matches
// scipy.ndimage.distance_transform_edt(~mask) composed the way
// generate_sdf uses it (distance over the sea to the nearest land pixel).
void edt_2d(const uint8_t* mask, float* out, int h, int w) {
  std::vector<float> f(std::max(h, w));
  std::vector<float> d(std::max(h, w));
  std::vector<int> v(std::max(h, w));
  std::vector<float> z(std::max(h, w) + 1);
  std::vector<float> g((size_t)h * w);

  // column pass: squared distance to nearest feature in each column
  for (int x = 0; x < w; ++x) {
    for (int y = 0; y < h; ++y) f[y] = mask[(size_t)y * w + x] ? 0.0f : kBig;
    dt_1d(f.data(), d.data(), v.data(), z.data(), h);
    for (int y = 0; y < h; ++y) g[(size_t)y * w + x] = d[y];
  }
  // row pass
  for (int y = 0; y < h; ++y) {
    dt_1d(&g[(size_t)y * w], d.data(), v.data(), z.data(), w);
    for (int x = 0; x < w; ++x)
      out[(size_t)y * w + x] = std::sqrt(d[x]);
  }
}

namespace {

// Separable antialiased (triangle/bilinear-filter) resampling weights,
// matching PIL's ResampleHorizontal/Vertical with the BILINEAR filter:
// center = (o + 0.5) * scale; support scaled by max(scale, 1) so
// downscales are antialiased exactly like torchvision
// Resize(antialias=True) in the reference (data_DANRA_conditional.py:
// 1031-1042).
struct ResampleSpan {
  std::vector<int> starts;     // first source index per output index
  std::vector<int> sizes;      // taps per output index
  std::vector<float> weights;  // flattened [out][tap]
  int max_taps;
};

ResampleSpan build_spans(int in_size, int out_size) {
  ResampleSpan sp;
  double scale = (double)in_size / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // triangle filter support = 1
  int max_taps = (int)std::ceil(support) * 2 + 1;
  sp.starts.resize(out_size);
  sp.sizes.resize(out_size);
  sp.weights.assign((size_t)out_size * max_taps, 0.0f);
  sp.max_taps = max_taps;
  for (int o = 0; o < out_size; ++o) {
    double center = (o + 0.5) * scale;
    int xmin = (int)std::max(center - support + 0.5, 0.0);
    int xmax = std::min((int)(center + support + 0.5), in_size);
    double wsum = 0.0;
    int n = xmax - xmin;
    for (int i = 0; i < n; ++i) {
      double x = (xmin + i + 0.5 - center) / filterscale;
      double wgt = x < 0 ? 1.0 + x : 1.0 - x;  // triangle
      if (wgt < 0) wgt = 0;
      sp.weights[(size_t)o * max_taps + i] = (float)wgt;
      wsum += wgt;
    }
    if (wsum > 0) {
      for (int i = 0; i < n; ++i)
        sp.weights[(size_t)o * max_taps + i] /= (float)wsum;
    }
    sp.starts[o] = xmin;
    sp.sizes[o] = n;
  }
  return sp;
}

}  // namespace

// Fused crop + antialiased resize + linear rescale:
// src (src_h, src_w) float32; window rows [y1, y1+crop), cols [x1, x1+crop)
// resized to (out_h, out_w) with PIL-equivalent triangle filtering; then
// out = (v - data_min) * scale + offset, implementing the reference Scale
// transform (data_DANRA_conditional.py:158-191).
void crop_resize_scale(const float* src, int src_h, int src_w,
                       int y1, int x1, int crop_h, int crop_w,
                       float* out, int out_h, int out_w,
                       float data_min, float scale, float offset) {
  ResampleSpan hx = build_spans(crop_w, out_w);
  ResampleSpan vy = build_spans(crop_h, out_h);

  // horizontal pass: (crop_h, crop_w) -> (crop_h, out_w)
  std::vector<float> tmp((size_t)crop_h * out_w);
  for (int yy = 0; yy < crop_h; ++yy) {
    const float* row = src + (size_t)(y1 + yy) * src_w + x1;
    for (int ox = 0; ox < out_w; ++ox) {
      const float* w = &hx.weights[(size_t)ox * hx.max_taps];
      int start = hx.starts[ox];
      float acc = 0.0f;
      for (int i = 0; i < hx.sizes[ox]; ++i) acc += row[start + i] * w[i];
      tmp[(size_t)yy * out_w + ox] = acc;
    }
  }
  // vertical pass: (crop_h, out_w) -> (out_h, out_w), fused rescale
  for (int oy = 0; oy < out_h; ++oy) {
    const float* w = &vy.weights[(size_t)oy * vy.max_taps];
    int start = vy.starts[oy];
    for (int ox = 0; ox < out_w; ++ox) {
      float acc = 0.0f;
      for (int i = 0; i < vy.sizes[oy]; ++i)
        acc += tmp[(size_t)(start + i) * out_w + ox] * w[i];
      out[(size_t)oy * out_w + ox] = (acc - data_min) * scale + offset;
    }
  }
}

// Batched crop+resize+scale: processes n independent (source, window)
// pairs in parallel with a thread pool — the data-loader batch-assembly
// hot path. srcs: n pointers; windows: n*4 ints (y1, x1, crop_h, crop_w);
// out: (n, out_h, out_w) contiguous.
void batch_crop_resize_scale(const float** srcs, const int* src_hw,
                             const int* windows, int n,
                             float* out, int out_h, int out_w,
                             float data_min, float scale, float offset,
                             int n_threads) {
  if (n_threads <= 0) n_threads = 4;
  std::vector<std::thread> workers;
  std::atomic<int> next{0};
  auto work = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      crop_resize_scale(srcs[i], src_hw[2 * i], src_hw[2 * i + 1],
                        windows[4 * i], windows[4 * i + 1],
                        windows[4 * i + 2], windows[4 * i + 3],
                        out + (size_t)i * out_h * out_w, out_h, out_w,
                        data_min, scale, offset);
    }
  };
  int nt = std::min(n_threads, n);
  workers.reserve(nt);
  for (int t = 0; t < nt; ++t) workers.emplace_back(work);
  for (auto& w : workers) w.join();
}

}  // extern "C"
