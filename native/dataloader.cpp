// Native data-loader core: JPEG/PNG decode + bilinear letterbox + threaded
// batch fill.
//
// TPU-native counterpart of the reference's native-code layer (its CUDA
// extensions and C++ deployment examples): the TPU compute path is
// JAX/XLA/Pallas, so the native work moves to the host input pipeline —
// the hot path between disk and the (B, S, S, 3) uint8 device batch.
//
// C ABI, consumed from Python via ctypes (see data/native_loader.py).
// Build: make -C native (produces libyolodata.so).

#include <cstddef>
#include <cstdio>
#include <csetjmp>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC, RGB
  int h = 0;
  int w = 0;
};

bool decode_jpeg(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr c) { longjmp(*static_cast<jmp_buf*>(c->client_data), 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode_png(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y) rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return true;
}

bool decode(const char* path, Image* out) {
  const char* dot = std::strrchr(path, '.');
  std::string ext = dot ? dot + 1 : "";
  std::transform(ext.begin(), ext.end(), ext.begin(), ::tolower);
  if (ext == "png") return decode_png(path, out);
  return decode_jpeg(path, out);
}

// ---- in-memory decode (serving hot path: bytes arrive over HTTP) ----

// Untrusted input: a tiny buffer can declare enormous dimensions; cap
// before any allocation (64 MP ≈ 192 MB RGB).
constexpr int64_t kMaxDecodePixels = 64LL * 1024 * 1024;

bool decode_jpeg_mem(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr c) { longjmp(*static_cast<jmp_buf*>(c->client_data), 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  if (out->w <= 0 || out->h <= 0 || int64_t(out->w) * out->h > kMaxDecodePixels) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;  // forged header: refuse before allocating
  }
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct MemCursor {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

bool decode_png_mem(const uint8_t* buf, size_t len, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  MemCursor cur{buf, len, 0};
  png_set_read_fn(png, &cur, [](png_structp p, png_bytep dst, png_size_t n) {
    auto* c = static_cast<MemCursor*>(png_get_io_ptr(p));
    if (c->pos + n > c->len) png_error(p, "read past end of buffer");
    std::memcpy(dst, c->buf + c->pos, n);
    c->pos += n;
  });
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  if (out->w <= 0 || out->h <= 0 || int64_t(out->w) * out->h > kMaxDecodePixels) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;  // forged header: refuse before allocating
  }
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y) rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_mem(const uint8_t* buf, size_t len, Image* out) {
  // sniff magic bytes: PNG = \x89PNG, JPEG = \xFF\xD8
  if (len >= 4 && buf[0] == 0x89 && buf[1] == 'P' && buf[2] == 'N' && buf[3] == 'G')
    return decode_png_mem(buf, len, out);
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg_mem(buf, len, out);
  return false;
}

// bilinear resize + center letterbox into dst (S x S x 3, prefilled 114).
// Matches data/augment.py:letterbox rounding (round(x - 0.1)/round(x + 0.1)).
void letterbox_into(const Image& img, uint8_t* dst, int s, float* gain, float* padw, float* padh) {
  const float r = std::min(float(s) / img.h, float(s) / img.w);
  const int nw = int(std::lround(img.w * r));
  const int nh = int(std::lround(img.h * r));
  const float dw = (s - nw) / 2.0f;
  const float dh = (s - nh) / 2.0f;
  const int left = int(std::lround(dw - 0.1f));
  const int top = int(std::lround(dh - 0.1f));
  *gain = r;
  *padw = float(left);
  *padh = float(top);

  const float sx = float(img.w) / nw;
  const float sy = float(img.h) / nh;
  for (int y = 0; y < nh; ++y) {
    // cv2 INTER_LINEAR source coordinate convention
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, float(img.h - 1)));
    const int y0 = int(fy);
    const int y1 = std::min(y0 + 1, img.h - 1);
    const float wy = fy - y0;
    uint8_t* drow = dst + (size_t(top + y) * s + left) * 3;
    const uint8_t* r0 = img.data.data() + size_t(y0) * img.w * 3;
    const uint8_t* r1 = img.data.data() + size_t(y1) * img.w * 3;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, float(img.w - 1)));
      const int x0 = int(fx);
      const int x1 = std::min(x0 + 1, img.w - 1);
      const float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        const float v =
            (1 - wy) * ((1 - wx) * r0[x0 * 3 + c] + wx * r0[x1 * 3 + c]) +
            wy * ((1 - wx) * r1[x0 * 3 + c] + wx * r1[x1 * 3 + c]);
        drow[x * 3 + c] = uint8_t(std::lround(v));
      }
    }
  }
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* g_pool = nullptr;
int g_pool_size = 0;
std::mutex g_pool_mu;

ThreadPool* pool(int n) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (!g_pool || g_pool_size != n) {
    delete g_pool;
    g_pool = new ThreadPool(n);
    g_pool_size = n;
  }
  return g_pool;
}

}  // namespace

extern "C" {

// Decode + letterbox a batch of images into out (B*S*S*3 uint8, caller-
// allocated) and ratio_pad (B*3 float: gain, padw, padh). paths is a
// NUL-separated concatenation of n paths. Returns number of failures.
int yolodata_load_batch(const char* paths, int n, int imgsz, int workers,
                        uint8_t* out, float* ratio_pad) {
  std::vector<const char*> ps;
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ps.push_back(p);
    p += std::strlen(p) + 1;
  }
  std::memset(out, 114, size_t(n) * imgsz * imgsz * 3);
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex done_mu;
  std::condition_variable done_cv;
  ThreadPool* tp = pool(workers);
  for (int i = 0; i < n; ++i) {
    tp->submit([&, i] {
      Image img;
      if (decode(ps[i], &img)) {
        letterbox_into(img, out + size_t(i) * imgsz * imgsz * 3, imgsz,
                       &ratio_pad[i * 3], &ratio_pad[i * 3 + 1], &ratio_pad[i * 3 + 2]);
      } else {
        failures.fetch_add(1);
        ratio_pad[i * 3] = 1.0f;
        ratio_pad[i * 3 + 1] = 0.0f;
        ratio_pad[i * 3 + 2] = 0.0f;
      }
      {
        // notify while HOLDING the lock: notifying after unlock races with
        // the waiter waking (from a spurious wakeup), seeing done==n, and
        // returning — destroying the stack-allocated cv under our feet.
        std::lock_guard<std::mutex> lk(done_mu);
        done.fetch_add(1);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

// Decode one image; returns 0 on success. Caller frees via yolodata_free.
int yolodata_decode(const char* path, uint8_t** data, int* h, int* w) {
  auto* img = new Image();
  if (!decode(path, img)) {
    delete img;
    return 1;
  }
  *h = img->h;
  *w = img->w;
  *data = static_cast<uint8_t*>(std::malloc(img->data.size()));
  if (!*data) {
    delete img;
    return 1;
  }
  std::memcpy(*data, img->data.data(), img->data.size());
  delete img;
  return 0;
}

void yolodata_free(uint8_t* data) { std::free(data); }

// Decode one image from an in-memory JPEG/PNG buffer (format sniffed from
// magic bytes); returns 0 on success. Caller frees via yolodata_free. This
// is the HTTP serving hot path (serve.py receives bytes, not files), so the
// input is UNTRUSTED: header-declared dimensions are capped before any
// allocation, and no C++ exception may cross the extern "C" boundary.
int yolodata_decode_buffer(const uint8_t* buf, long len, uint8_t** data, int* h, int* w) {
  constexpr int64_t kMaxPixels = 64LL * 1024 * 1024;  // 64 MP ≈ 192 MB RGB
  try {
    Image img;
    if (len <= 0 || !decode_mem(buf, size_t(len), &img)) return 1;
    if (img.h <= 0 || img.w <= 0 || int64_t(img.h) * img.w > kMaxPixels) return 1;
    *h = img.h;
    *w = img.w;
    *data = static_cast<uint8_t*>(std::malloc(img.data.size()));
    if (!*data) return 1;
    std::memcpy(*data, img.data.data(), img.data.size());
    return 0;
  } catch (...) {  // bad_alloc from a forged 100000x100000 header, etc.
    return 1;
  }
}

}  // extern "C"
