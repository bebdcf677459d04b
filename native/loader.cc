// litepi_tpu native data loader: multi-threaded JPEG decode + letterbox.
//
// The reference delegates image decode + resize to OpenCV's C++ core and its
// inference to NCNN/ORT/OpenVINO C++ engines.  In this framework the compute
// path is XLA; the host-side bottleneck that remains for a >5k FPS device
// program is *input*: JPEG decode + letterbox at hundreds of frames per
// second.  This library provides exactly that as a persistent worker pool:
//
//   lp_create_loader(threads, out_size, pad_value, scaled_decode) -> handle
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
// scaled_decode != 0 enables libjpeg DCT-domain scaled decode: the smallest
// FAST scale_num/8 whose decoded size still covers the letterbox resize
// target.  Measured on this libjpeg-turbo 2.1.5: only N in {1,2,4,8} have
// SIMD IDCT kernels — N=3 decodes FEWER pixels than N=4 yet is equal-or-
// slower, and N in {5,6,7} are slower than full decode — so the policy
// rounds ceil(r*8) up to the next of {1,2,4} and otherwise skips scaling.
// The payoff is bounded by entropy (Huffman) decode, which no scale factor
// touches: measured on a 2048^2 870KB photo-like source, full decode is
// 21-22 ms/frame and the 1/8-scale floor is still 13 ms/frame, so the
// end-to-end lever is ~1.25-1.45x per core, not the naive pixel ratio (7x).
// Geometry is ALWAYS reported in ORIGINAL image coordinates, so downstream
// box unmapping is unchanged.  Numerics: DCT-scaled decode + bilinear is NOT
// bit-identical to full decode + bilinear (it is a different, slightly
// box-filtered resample chain) — this is a serving throughput knob; the
// parity/eval path keeps full decode (the default).
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
  int w = 0, h = 0;    // decoded buffer dims (may be DCT-scaled)
  int ow = 0, oh = 0;  // original (full-resolution) dims for geometry
  std::vector<unsigned char> px;  // packed pixels from libjpeg (BGR on
                                  // libjpeg-turbo via JCS_EXT_BGR, else RGB)
};

// libjpeg-turbo decodes straight to BGR (the pipeline's colour order),
// removing the swizzle and making the identity resize path a row memcpy.
#ifdef JCS_EXTENSIONS
constexpr J_COLOR_SPACE kOutColor = JCS_EXT_BGR;
constexpr bool kDecodeIsBGR = true;
#else
constexpr J_COLOR_SPACE kOutColor = JCS_RGB;
constexpr bool kDecodeIsBGR = false;
#endif

// target_size > 0 requests DCT-domain scaled decode: the smallest N/8 whose
// scaled output still covers the letterbox resize target for target_size.
bool decode_jpeg(const char* path, Image* out, int target_size) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = error_exit_longjmp;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    // a mid-scanline error (truncated/corrupt stream) has already set
    // w/h/ow/oh and partially filled px — zero the dims so letterbox_into
    // honours the documented failure contract (ratio = 0, padded canvas)
    out->w = out->h = out->ow = out->oh = 0;
    out->px.clear();
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = kOutColor;
  out->ow = static_cast<int>(cinfo.image_width);
  out->oh = static_cast<int>(cinfo.image_height);
  if (target_size > 0 && out->ow > 0 && out->oh > 0) {
    // letterbox ratio on ORIGINAL dims; decode at the smallest FAST N/8 >= r
    // so the scaled buffer is never smaller than the bilinear resize target.
    // Only N in {1,2,4} beat full decode (SIMD IDCT kernels; see header).
    const double r =
        std::min(static_cast<double>(target_size) / out->oh,
                 static_cast<double>(target_size) / out->ow);
    if (r < 1.0) {
      int num = static_cast<int>(std::ceil(r * 8.0));
      if (num <= 1) {
        num = 1;
      } else if (num <= 2) {
        num = 2;
      } else if (num <= 4) {
        num = 4;
      } else {
        num = 8;  // measured: N in {5,6,7} are SLOWER than full decode
      }
      if (num < 8) {
        cinfo.scale_num = static_cast<unsigned>(num);
        cinfo.scale_denom = 8;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  out->w = static_cast<int>(cinfo.output_width);
  out->h = static_cast<int>(cinfo.output_height);
  out->px.resize(static_cast<size_t>(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->px.data() +
                         static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Precomputed 1-D bilinear taps (half-pixel centres, clamped borders —
// cv2.INTER_LINEAR semantics).  Hoisting the coordinate math and clamping
// out of the inner loop is worth ~8x over per-sample computation: the
// resample was measured DOMINATING the whole load (10+ ms of a 16 ms 640px
// letterbox) when done per pixel with clamped float sampling.
struct Taps {
  // byte offsets of the two source taps; ptrdiff_t because a row offset is
  // s0 * (w*3), which overflows int for legal JPEGs beyond ~715 MP (the
  // replaced per-sample code indexed with size_t)
  std::vector<ptrdiff_t> i0, i1;
  std::vector<float> f;  // fraction toward i1
  Taps(int src, int dst, int stride) : i0(dst), i1(dst), f(dst) {
    const float scale = static_cast<float>(src) / dst;
    for (int o = 0; o < dst; ++o) {
      float s = (o + 0.5f) * scale - 0.5f;
      s = s < 0 ? 0 : (s > src - 1 ? src - 1 : s);
      int s0 = static_cast<int>(s);
      int s1 = s0 + 1 < src ? s0 + 1 : src - 1;
      i0[o] = static_cast<ptrdiff_t>(s0) * stride;
      i1[o] = static_cast<ptrdiff_t>(s1) * stride;
      f[o] = s - s0;
    }
  }
};

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
  // geometry and the resize target come from the ORIGINAL dims — with a
  // DCT-scaled decode the buffer (im.w, im.h) is smaller, but downstream box
  // unmapping must see the full-resolution letterbox ratio/offsets
  const double r =
      std::min(static_cast<double>(out_size) / im.oh,
               static_cast<double>(out_size) / im.ow);
  const int new_w = static_cast<int>(std::lround(im.ow * r));
  const int new_h = static_cast<int>(std::lround(im.oh * r));
  const double dw = (out_size - new_w) / 2.0;
  const double dh = (out_size - new_h) / 2.0;
  const int left = static_cast<int>(std::lround(dw - 0.1));
  const int top = static_cast<int>(std::lround(dh - 0.1));
  const unsigned char* src = im.px.data();
  if (im.w == new_w && im.h == new_h) {
    // identity fast path (source already at the resize target — e.g. a
    // 640px source, or a DCT scale that lands exactly)
    for (int oy = 0; oy < new_h; ++oy) {
      const unsigned char* srow = src + static_cast<size_t>(oy) * im.w * 3;
      unsigned char* row =
          dst + (static_cast<size_t>(top + oy) * out_size + left) * 3;
      if (kDecodeIsBGR) {
        std::memcpy(row, srow, static_cast<size_t>(new_w) * 3);
      } else {
        for (int ox = 0; ox < new_w; ++ox) {
          row[ox * 3 + 0] = srow[ox * 3 + 2];
          row[ox * 3 + 1] = srow[ox * 3 + 1];
          row[ox * 3 + 2] = srow[ox * 3 + 0];
        }
      }
    }
  } else {
    const Taps tx(im.w, new_w, 3);
    const Taps ty(im.h, new_h, im.w * 3);
    for (int oy = 0; oy < new_h; ++oy) {
      const unsigned char* r0 = src + ty.i0[oy];
      const unsigned char* r1 = src + ty.i1[oy];
      const float fy = ty.f[oy];
      unsigned char* row =
          dst + (static_cast<size_t>(top + oy) * out_size + left) * 3;
      for (int ox = 0; ox < new_w; ++ox) {
        const ptrdiff_t a = tx.i0[ox], b = tx.i1[ox];
        const float fx = tx.f[ox];
        for (int c = 0; c < 3; ++c) {
          const float t = r0[a + c] + (r0[b + c] - r0[a + c]) * fx;
          const float u = r1[a + c] + (r1[b + c] - r1[a + c]) * fx;
          row[ox * 3 + (kDecodeIsBGR ? c : 2 - c)] =
              static_cast<unsigned char>(t + (u - t) * fy + 0.5f);
        }
      }
    }
  }
  geom[0] = static_cast<float>(r);
  geom[1] = static_cast<float>(dw);
  geom[2] = static_cast<float>(dh);
  geom[3] = static_cast<float>(im.ow);
  geom[4] = static_cast<float>(im.oh);
}

class Loader {
 public:
  Loader(int threads, int out_size, int pad_value, int scaled_decode)
      : out_size_(out_size),
        pad_value_(pad_value),
        scaled_decode_(scaled_decode != 0),
        stop_(false) {
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
        if (decode_jpeg(paths[i], &im, scaled_decode_ ? out_size_ : 0))
          ok.fetch_add(1);
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
  const bool scaled_decode_;
  bool stop_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> tasks_;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void* lp_create_loader(int threads, int out_size, int pad_value,
                       int scaled_decode) {
  return new Loader(threads, out_size, pad_value, scaled_decode);
}

void lp_destroy_loader(void* handle) {
  delete static_cast<Loader*>(handle);
}

int lp_load_batch(void* handle, const char** paths, int n, unsigned char* out,
                  float* geoms) {
  return static_cast<Loader*>(handle)->LoadBatch(paths, n, out, geoms);
}

}  // extern "C"
