// Native threaded dataset loader (the C++ runtime component).
//
// The reference's runtime is C++ and loads images synchronously on the
// frame loop (`visualSLAM::loadImageL/R`, /root/reference/src/rosFuncs.cpp:48-71
// — cv::imread per frame, blocking the ~10 Hz loop).  On a TPU host the
// loop must never stall on disk: this loader decodes PNGs on a worker
// thread pool into a bounded in-order queue so `get(idx)` is a memcpy
// when the pipeline is keeping up.
//
//   - libpng decode -> float32 grayscale in [0, 1] (8/16-bit, any channel
//     count; RGB collapses via BT.601 luma)
//   - N worker threads, bounded look-ahead window (backpressure)
//   - C ABI for ctypes (no pybind11 dependency)
//
// Build: make -C native   (produces libslamloader.so)

#include <png.h>

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> data;
  int width = 0;
  int height = 0;
  bool ok = false;
};

bool decode_png_gray(const char* path, Frame* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const int width = png_get_image_width(png, info);
  const int height = png_get_image_height(png, info);
  const png_byte color = png_get_color_type(png, info);
  const png_byte depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  const int channels = png_get_channels(png, info);
  const size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<png_byte> raw(rowbytes * height);
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y) rows[y] = raw.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  out->width = width;
  out->height = height;
  out->data.resize(static_cast<size_t>(width) * height);
  const float inv = 1.0f / 255.0f;
  for (int y = 0; y < height; ++y) {
    const png_byte* r = raw.data() + y * rowbytes;
    float* d = out->data.data() + static_cast<size_t>(y) * width;
    if (channels == 1) {
      for (int x = 0; x < width; ++x) d[x] = r[x] * inv;
    } else {
      // BT.601 luma for RGB(A).
      for (int x = 0; x < width; ++x) {
        const png_byte* p = r + x * channels;
        d[x] = (0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2]) * inv;
      }
    }
  }
  out->ok = true;
  return true;
}

class Loader {
 public:
  Loader(std::vector<std::string> paths, int n_threads, int lookahead)
      : paths_(std::move(paths)),
        lookahead_(lookahead < 1 ? 1 : lookahead),
        next_issue_(0),
        next_consume_(0),
        stop_(false) {
    const int n = n_threads < 1 ? 1 : n_threads;
    for (int i = 0; i < n; ++i) workers_.emplace_back(&Loader::work, this);
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    cv_done_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocking fetch; returns 0 on success, -1 decode failure, -2 bad idx.
  int get(size_t idx, float* out, int* width, int* height) {
    if (idx >= paths_.size()) return -2;
    std::unique_lock<std::mutex> lk(mu_);
    // Any access outside the current forward window restarts it under a
    // new generation; in-flight results from older generations are
    // discarded on completion (they must never pin queue capacity).
    if (idx < next_consume_ || idx >= next_consume_ + lookahead_ * 2) {
      ++gen_;
      done_.clear();
      inflight_ = 0;
      next_issue_ = idx;
    }
    next_consume_ = idx;
    // Drop frames the consumer skipped past.
    for (auto it = done_.begin(); it != done_.end();) {
      it = (it->first < idx) ? done_.erase(it) : std::next(it);
    }
    if (next_issue_ < idx) next_issue_ = idx;
    cv_work_.notify_all();
    cv_done_.wait(lk, [&] { return stop_ || done_.count(idx) > 0; });
    if (stop_) return -3;
    Frame f = std::move(done_[idx]);
    done_.erase(idx);
    cv_work_.notify_all();  // freed a slot
    lk.unlock();
    if (!f.ok) return -1;
    *width = f.width;
    *height = f.height;
    std::memcpy(out, f.data.data(), f.data.size() * sizeof(float));
    return 0;
  }

 private:
  void work() {
    for (;;) {
      size_t idx;
      uint64_t gen;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [&] {
          return stop_ ||
                 (next_issue_ < paths_.size() &&
                  next_issue_ < next_consume_ + lookahead_ &&
                  done_.size() + inflight_ < static_cast<size_t>(lookahead_));
        });
        if (stop_) return;
        idx = next_issue_++;
        gen = gen_;
        ++inflight_;
      }
      Frame f;
      decode_png_gray(paths_[idx].c_str(), &f);
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (gen == gen_) {
          --inflight_;
          if (idx >= next_consume_) done_[idx] = std::move(f);
        }
        // Stale generation: inflight_ was already reset; drop the frame.
      }
      cv_done_.notify_all();
      cv_work_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  const int lookahead_;
  size_t next_issue_;
  size_t next_consume_;
  bool stop_;
  uint64_t gen_ = 0;
  size_t inflight_ = 0;
  std::map<size_t, Frame> done_;
  std::mutex mu_;
  std::condition_variable cv_work_, cv_done_;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, int n, int n_threads, int lookahead) {
  std::vector<std::string> p(paths, paths + n);
  return new Loader(std::move(p), n_threads, lookahead);
}

int loader_get(void* h, long idx, float* out, int* width, int* height) {
  return static_cast<Loader*>(h)->get(static_cast<size_t>(idx), out, width,
                                      height);
}

void loader_destroy(void* h) { delete static_cast<Loader*>(h); }

// One-shot decode helper (no threading) for probing image geometry.
int decode_png(const char* path, float* out, int* width, int* height,
               int max_pixels) {
  Frame f;
  if (!decode_png_gray(path, &f)) return -1;
  if (f.width * f.height > max_pixels) return -2;
  *width = f.width;
  *height = f.height;
  std::memcpy(out, f.data.data(), f.data.size() * sizeof(float));
  return 0;
}
}
