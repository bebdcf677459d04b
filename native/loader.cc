// litepi_tpu native data loader: multi-threaded JPEG decode + letterbox.
//
// The reference delegates image decode + resize to OpenCV's C++ core and its
// inference to NCNN/ORT/OpenVINO C++ engines.  In this framework the compute
// path is XLA; the host-side bottleneck that remains for a >5k FPS device
// program is *input*: JPEG decode + letterbox at hundreds of frames per
// second.  This library provides exactly that as a persistent worker pool:
//
//   lp_create_loader(threads, out_size, pad_value) -> handle
//   lp_load_batch(handle, paths[], n, out_u8, geoms_f32)  (parallel)
//   lp_destroy_loader(handle)
//
// Each image is decoded with libjpeg, bilinearly resized (half-pixel
// centres, no antialias - cv2.INTER_LINEAR semantics) and placed on a
// pad_value canvas with the reference letterbox geometry
// (round(d -/+ 0.1) split; see e2e.py:66-86 and ops/letterbox.py).
// Output is BGR uint8 (the reference pipeline's colour order).
// geoms rows are (ratio, dw, dh, orig_w, orig_h); decode failures yield
// ratio = 0 and a fully padded canvas.
//
// Build: g++ -O3 -shared -fPIC loader.cc -o liblitepi_loader.so -ljpeg -lpthread

#include <cstdio>  // must precede jpeglib.h: it does not declare FILE itself

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void error_exit_longjmp(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

struct Image {
  int w = 0, h = 0;
  std::vector<unsigned char> rgb;  // packed RGB from libjpeg
};

bool decode_jpeg(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = error_exit_longjmp;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = static_cast<int>(cinfo.output_width);
  out->h = static_cast<int>(cinfo.output_height);
  out->rgb.resize(static_cast<size_t>(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->rgb.data() +
                         static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Bilinear sample of channel c at (x, y) from packed RGB (clamped borders).
inline float sample(const Image& im, float x, float y, int c) {
  x = x < 0 ? 0 : (x > im.w - 1 ? im.w - 1 : x);
  y = y < 0 ? 0 : (y > im.h - 1 ? im.h - 1 : y);
  int x0 = static_cast<int>(x), y0 = static_cast<int>(y);
  int x1 = x0 + 1 < im.w ? x0 + 1 : im.w - 1;
  int y1 = y0 + 1 < im.h ? y0 + 1 : im.h - 1;
  float fx = x - x0, fy = y - y0;
  const unsigned char* d = im.rgb.data();
  auto at = [&](int yy, int xx) {
    return static_cast<float>(d[(static_cast<size_t>(yy) * im.w + xx) * 3 + c]);
  };
  float top = at(y0, x0) * (1 - fx) + at(y0, x1) * fx;
  float bot = at(y1, x0) * (1 - fx) + at(y1, x1) * fx;
  return top * (1 - fy) + bot * fy;
}

void letterbox_into(const Image& im, int out_size, int pad_value,
                    unsigned char* dst /* out_size*out_size*3, BGR */,
                    float* geom /* ratio, dw, dh, w, h */) {
  std::memset(dst, pad_value,
              static_cast<size_t>(out_size) * out_size * 3);
  if (im.w == 0 || im.h == 0) {
    geom[0] = 0.f;
    geom[1] = geom[2] = geom[3] = geom[4] = 0.f;
    return;
  }
  const double r =
      std::min(static_cast<double>(out_size) / im.h,
               static_cast<double>(out_size) / im.w);
  const int new_w = static_cast<int>(std::lround(im.w * r));
  const int new_h = static_cast<int>(std::lround(im.h * r));
  const double dw = (out_size - new_w) / 2.0;
  const double dh = (out_size - new_h) / 2.0;
  const int left = static_cast<int>(std::lround(dw - 0.1));
  const int top = static_cast<int>(std::lround(dh - 0.1));
  for (int oy = 0; oy < new_h; ++oy) {
    const float sy = (oy + 0.5f) * (static_cast<float>(im.h) / new_h) - 0.5f;
    unsigned char* row =
        dst + (static_cast<size_t>(top + oy) * out_size + left) * 3;
    for (int ox = 0; ox < new_w; ++ox) {
      const float sx = (ox + 0.5f) * (static_cast<float>(im.w) / new_w) - 0.5f;
      // write BGR from RGB source
      row[ox * 3 + 0] =
          static_cast<unsigned char>(sample(im, sx, sy, 2) + 0.5f);
      row[ox * 3 + 1] =
          static_cast<unsigned char>(sample(im, sx, sy, 1) + 0.5f);
      row[ox * 3 + 2] =
          static_cast<unsigned char>(sample(im, sx, sy, 0) + 0.5f);
    }
  }
  geom[0] = static_cast<float>(r);
  geom[1] = static_cast<float>(dw);
  geom[2] = static_cast<float>(dh);
  geom[3] = static_cast<float>(im.w);
  geom[4] = static_cast<float>(im.h);
}

class Loader {
 public:
  Loader(int threads, int out_size, int pad_value)
      : out_size_(out_size), pad_value_(pad_value), stop_(false) {
    for (int i = 0; i < threads; ++i) {
      workers_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  int LoadBatch(const char** paths, int n, unsigned char* out, float* geoms) {
    std::atomic<int> next(0), ok(0), done(0);
    std::mutex done_mu;
    std::condition_variable done_cv;
    auto task = [&, this] {
      for (;;) {
        const int i = next.fetch_add(1);
        if (i >= n) break;
        Image im;
        if (decode_jpeg(paths[i], &im)) ok.fetch_add(1);
        letterbox_into(
            im, out_size_, pad_value_,
            out + static_cast<size_t>(i) * out_size_ * out_size_ * 3,
            geoms + static_cast<size_t>(i) * 5);
      }
      {
        std::lock_guard<std::mutex> lk(done_mu);
        done.fetch_add(1);
      }
      done_cv.notify_one();
    };
    const int fanout = static_cast<int>(workers_.size());
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (int i = 0; i < fanout; ++i) tasks_.push(task);
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(done_mu);
    done_cv.wait(lk, [&] { return done.load() == fanout; });
    return ok.load();
  }

 private:
  void WorkerLoop() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = std::move(tasks_.front());
        tasks_.pop();
      }
      task();
    }
  }

  const int out_size_;
  const int pad_value_;
  bool stop_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> tasks_;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void* lp_create_loader(int threads, int out_size, int pad_value) {
  return new Loader(threads, out_size, pad_value);
}

void lp_destroy_loader(void* handle) {
  delete static_cast<Loader*>(handle);
}

int lp_load_batch(void* handle, const char** paths, int n, unsigned char* out,
                  float* geoms) {
  return static_cast<Loader*>(handle)->LoadBatch(paths, n, out, geoms);
}

}  // extern "C"
