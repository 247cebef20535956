// ffrnet_host: native host-side data-preparation library.
//
// The PyTorch reference prepares training batches in Python worker
// processes (PIL decode -> BGR re-merge -> bicubic resize -> flip ->
// ToTensor/Normalize; data/dataset.py:126-161, data/dataloader.py:33).
// This library is the TPU framework's native equivalent of that hot host
// path: JPEG decode (libjpeg), BGR channel swap, separable Catmull-Rom
// bicubic resize with PIL-style antialias support scaling, horizontal
// flip, and fused uint8 -> float32 [-1, 1] normalization, fanned out over
// a std::thread pool. Exposed as a C ABI for ctypes (no pybind11 in the
// image).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC, links libjpeg).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <csetjmp>
#include <cstdio>

extern "C" {
#include <jpeglib.h>
}

namespace {

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  template <typename F>
  void run_batch(int n, F&& fn) {
    if (n <= 0) return;
    std::atomic<int> next(0), done(0);
    std::mutex done_mu;
    std::condition_variable done_cv;
    int workers = std::max<int>(1, static_cast<int>(workers_.size()));
    int shards = std::min(n, workers);
    {
      std::unique_lock<std::mutex> lock(mu_);
      for (int s = 0; s < shards; ++s) {
        tasks_.emplace([&, n] {
          int i;
          while ((i = next.fetch_add(1)) < n) fn(i);
          // notify while holding the lock: run_batch's stack frame (and
          // done_cv with it) dies as soon as the waiter sees done==shards,
          // so an unlocked notify could touch a destroyed cv (UB race)
          std::lock_guard<std::mutex> g(done_mu);
          ++done;
          done_cv.notify_one();
        });
      }
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lock(done_mu);
    done_cv.wait(lock, [&] { return done == shards; });
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* pool() {
  static ThreadPool p(std::max(1u, std::thread::hardware_concurrency()));
  return &p;
}

// ---------------------------------------------------------------------------
// Bicubic (Catmull-Rom, a = -0.5) separable resize with antialias support
// scaling for downscale — PIL's resampling scheme in float.
// ---------------------------------------------------------------------------

inline double cubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct ResamplePlan {
  std::vector<int> bounds;     // [out] -> (start, size) pairs
  std::vector<double> coeffs;  // [out][ksize]
  int ksize;
};

ResamplePlan plan_axis(int in_size, int out_size) {
  ResamplePlan plan;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 2.0 * filterscale;
  plan.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  plan.bounds.resize(out_size * 2);
  plan.coeffs.resize(static_cast<size_t>(out_size) * plan.ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
    int xmax = static_cast<int>(std::min<double>(in_size,
                                                 std::ceil(center + support)));
    int size = xmax - xmin;
    double* k = &plan.coeffs[static_cast<size_t>(xx) * plan.ksize];
    double total = 0.0;
    for (int x = 0; x < size; ++x) {
      double w = cubic((x + xmin - center + 0.5) / filterscale);
      k[x] = w;
      total += w;
    }
    if (total != 0.0)
      for (int x = 0; x < size; ++x) k[x] /= total;
    plan.bounds[xx * 2] = xmin;
    plan.bounds[xx * 2 + 1] = size;
  }
  return plan;
}

// uint8 HWC -> float HWC resize
void resize_bicubic(const uint8_t* in, int ih, int iw, int c, float* out,
                    int oh, int ow) {
  ResamplePlan px = plan_axis(iw, ow);
  ResamplePlan py = plan_axis(ih, oh);
  std::vector<float> tmp(static_cast<size_t>(ih) * ow * c);
  for (int y = 0; y < ih; ++y) {
    const uint8_t* row = in + static_cast<size_t>(y) * iw * c;
    for (int x = 0; x < ow; ++x) {
      int xmin = px.bounds[x * 2], size = px.bounds[x * 2 + 1];
      const double* k = &px.coeffs[static_cast<size_t>(x) * px.ksize];
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int i = 0; i < size; ++i)
          acc += row[(xmin + i) * c + ch] * k[i];
        tmp[(static_cast<size_t>(y) * ow + x) * c + ch] =
            static_cast<float>(acc);
      }
    }
  }
  for (int y = 0; y < oh; ++y) {
    int ymin = py.bounds[y * 2], size = py.bounds[y * 2 + 1];
    const double* k = &py.coeffs[static_cast<size_t>(y) * py.ksize];
    for (int x = 0; x < ow; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int i = 0; i < size; ++i)
          acc += tmp[(static_cast<size_t>(ymin + i) * ow + x) * c + ch] * k[i];
        out[(static_cast<size_t>(y) * ow + x) * c + ch] =
            static_cast<float>(acc);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) with error-return instead of exit()
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                 int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize(static_cast<size_t>(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) *
                                     *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// one-sample pipeline: RGB uint8 (ih, iw) -> float32 NHWC (oh, ow) BGR
// normalized to [-1, 1], optional hflip
void prep_one(const uint8_t* rgb, int ih, int iw, float* out, int oh, int ow,
              bool bgr, bool flip) {
  std::vector<float> resized;
  const float* srcf = nullptr;
  std::vector<float> direct;
  if (ih == oh && iw == ow) {
    direct.resize(static_cast<size_t>(oh) * ow * 3);
    for (size_t i = 0; i < direct.size(); ++i)
      direct[i] = static_cast<float>(rgb[i]);
    srcf = direct.data();
  } else {
    resized.resize(static_cast<size_t>(oh) * ow * 3);
    resize_bicubic(rgb, ih, iw, 3, resized.data(), oh, ow);
    // PIL converts back to uint8 (clip + round) after resize; match that.
    for (auto& v : resized)
      v = std::round(std::min(255.0f, std::max(0.0f, v)));
    srcf = resized.data();
  }
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      int sx = flip ? (ow - 1 - x) : x;
      const float* p = srcf + (static_cast<size_t>(y) * ow + sx) * 3;
      float* q = out + (static_cast<size_t>(y) * ow + x) * 3;
      float r = p[0], g = p[1], b = p[2];
      if (bgr) std::swap(r, b);
      q[0] = (r / 255.0f - 0.5f) / 0.5f;
      q[1] = (g / 255.0f - 0.5f) / 0.5f;
      q[2] = (b / 255.0f - 0.5f) / 0.5f;
    }
  }
}

// uint8-output variant of prep_one: identical decode/resize/flip/BGR
// pipeline but emits the QUANTIZED pixels (the exact values the float path
// normalizes), so (u8/255 - 0.5)/0.5 on the accelerator reproduces the
// float path bitwise. Uploading uint8 moves 4x fewer bytes host->device —
// the train driver's measured bottleneck on relayed TPU hosts.
void prep_one_u8(const uint8_t* rgb, int ih, int iw, uint8_t* out, int oh,
                 int ow, bool bgr, bool flip) {
  const uint8_t* src8 = rgb;
  std::vector<uint8_t> resized8;
  if (!(ih == oh && iw == ow)) {
    std::vector<float> resized(static_cast<size_t>(oh) * ow * 3);
    resize_bicubic(rgb, ih, iw, 3, resized.data(), oh, ow);
    resized8.resize(resized.size());
    // same clip+round as the float path (PIL converts back to uint8)
    for (size_t i = 0; i < resized.size(); ++i)
      resized8[i] = static_cast<uint8_t>(
          std::round(std::min(255.0f, std::max(0.0f, resized[i]))));
    src8 = resized8.data();
  }
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      int sx = flip ? (ow - 1 - x) : x;
      const uint8_t* p = src8 + (static_cast<size_t>(y) * ow + sx) * 3;
      uint8_t* q = out + (static_cast<size_t>(y) * ow + x) * 3;
      uint8_t r = p[0], g = p[1], b = p[2];
      if (bgr) std::swap(r, b);
      q[0] = r;
      q[1] = g;
      q[2] = b;
    }
  }
}

}  // namespace

extern "C" {

// Prep a batch of raw RGB images (uint8 HWC, per-image sizes) into a float32
// NHWC batch. Returns 0 on success.
int ffrnet_prep_batch(const uint8_t* const* images, const int* heights,
                      const int* widths, int n, float* out, int out_h,
                      int out_w, int bgr, const uint8_t* flips) {
  pool()->run_batch(n, [&](int i) {
    prep_one(images[i], heights[i], widths[i],
             out + static_cast<size_t>(i) * out_h * out_w * 3, out_h, out_w,
             bgr != 0, flips && flips[i]);
  });
  return 0;
}

// Decode a batch of JPEG buffers and prep them in one pass. jpeg_data /
// jpeg_len: per-image encoded buffers. Returns the number of failures.
int ffrnet_decode_prep_batch(const uint8_t* const* jpeg_data,
                             const size_t* jpeg_len, int n, float* out,
                             int out_h, int out_w, int bgr,
                             const uint8_t* flips) {
  std::atomic<int> failures(0);
  pool()->run_batch(n, [&](int i) {
    std::vector<uint8_t> rgb;
    int h = 0, w = 0;
    if (!decode_jpeg(jpeg_data[i], jpeg_len[i], &rgb, &h, &w)) {
      failures.fetch_add(1);
      std::memset(out + static_cast<size_t>(i) * out_h * out_w * 3, 0,
                  static_cast<size_t>(out_h) * out_w * 3 * sizeof(float));
      return;
    }
    prep_one(rgb.data(), h, w,
             out + static_cast<size_t>(i) * out_h * out_w * 3, out_h, out_w,
             bgr != 0, flips && flips[i]);
  });
  return failures.load();
}

// uint8-output twins of the two entry points above: same pipeline, the
// output batch stays uint8 NHWC (normalize on the accelerator instead).
int ffrnet_prep_batch_u8(const uint8_t* const* images, const int* heights,
                         const int* widths, int n, uint8_t* out, int out_h,
                         int out_w, int bgr, const uint8_t* flips) {
  pool()->run_batch(n, [&](int i) {
    prep_one_u8(images[i], heights[i], widths[i],
                out + static_cast<size_t>(i) * out_h * out_w * 3, out_h,
                out_w, bgr != 0, flips && flips[i]);
  });
  return 0;
}

int ffrnet_decode_prep_batch_u8(const uint8_t* const* jpeg_data,
                                const size_t* jpeg_len, int n, uint8_t* out,
                                int out_h, int out_w, int bgr,
                                const uint8_t* flips) {
  std::atomic<int> failures(0);
  pool()->run_batch(n, [&](int i) {
    std::vector<uint8_t> rgb;
    int h = 0, w = 0;
    if (!decode_jpeg(jpeg_data[i], jpeg_len[i], &rgb, &h, &w)) {
      failures.fetch_add(1);
      std::memset(out + static_cast<size_t>(i) * out_h * out_w * 3, 0,
                  static_cast<size_t>(out_h) * out_w * 3);
      return;
    }
    prep_one_u8(rgb.data(), h, w,
                out + static_cast<size_t>(i) * out_h * out_w * 3, out_h,
                out_w, bgr != 0, flips && flips[i]);
  });
  return failures.load();
}

int ffrnet_host_version() { return 2; }

}  // extern "C"
