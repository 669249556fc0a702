// slideio — native slide-decoding runtime for acmil_tpu.
//
// TPU-native replacement for the reference's native slide stack
// (SURVEY.md §2.6): libkfbslide (ctypes at wsi_core/KfbSlide/kfb_lowlevel.py),
// the vendored OpenSlide build (wsi_core/OtherSlide/openslidec/) and the
// openslide-python _convert extension.
//
// Backends:
//  * SPY   — our own single-file tiled pyramid container (JPEG/PNG/raw
//            tiles + offset tables). Reader assembles read_region() from
//            tiles with a std::thread decode pool writing into the
//            caller's pinned buffer; writer is used by the Python-side
//            converter and the synthetic-slide generator.
//  * OPENSLIDE — dlopen() passthrough to a system libopenslide when
//            present (.svs/.tif/.ndpi/...), with BGRA→RGB conversion
//            (the _convert.pyd equivalent) done here in C++.
//  * KFB   — dlopen() of the proprietary libkfbslide; read_region is
//            re-assembled from its JPEG tiles, porting the DeepZoom tile
//            math of wsi_core/KfbSlide/kfbslide.py:82-120.
//
// C ABI (mirrors the openslide vocabulary the Python layer expects):
//   sio_open / sio_close / sio_level_count / sio_level_dimensions /
//   sio_level_downsample / sio_best_level_for_downsample /
//   sio_read_region / sio_get_error / sio_create / sio_write_tile /
//   sio_finish
//
// Build: g++ -O3 -fPIC -shared -std=c++17 slideio.cpp -o libslideio.so
//        -ljpeg -lpng -ldl -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dlfcn.h>
#include <functional>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

// ---------------------------------------------------------------------------
// error plumbing
// ---------------------------------------------------------------------------
static thread_local std::string g_error;
static void set_error(const std::string &e) { g_error = e; }

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
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
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto &w : workers_) w.join();
  }
  void submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

static ThreadPool &pool() {
  static ThreadPool p(std::max(2u, std::thread::hardware_concurrency()));
  return p;
}

// simple latch for fan-out/fan-in
struct Latch {
  explicit Latch(int n) : count(n) {}
  void done() {
    std::unique_lock<std::mutex> lk(mu);
    if (--count == 0) cv.notify_all();
  }
  void wait() {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [this] { return count == 0; });
  }
  int count;
  std::mutex mu;
  std::condition_variable cv;
};

// ---------------------------------------------------------------------------
// JPEG / PNG codecs (libjpeg / libpng)
// ---------------------------------------------------------------------------
struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};
static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr *e = reinterpret_cast<JpegErr *>(cinfo->err);
  longjmp(e->jb, 1);
}

// decode JPEG bytes into RGB; returns false on failure
static bool decode_jpeg(const uint8_t *data, size_t len, std::vector<uint8_t> &rgb,
                        uint32_t &w, uint32_t &h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t *>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(size_t(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = rgb.data() + size_t(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

static bool encode_jpeg(const uint8_t *rgb, uint32_t w, uint32_t h, int quality,
                        std::vector<uint8_t> &out) {
  jpeg_compress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  uint8_t *buf = nullptr;
  unsigned long buflen = 0;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_compress(&cinfo);
    if (buf) free(buf);
    return false;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &buf, &buflen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    const uint8_t *row = rgb + size_t(cinfo.next_scanline) * w * 3;
    jpeg_write_scanlines(&cinfo, const_cast<uint8_t **>(&row), 1);
  }
  jpeg_finish_compress(&cinfo);
  out.assign(buf, buf + buflen);
  free(buf);
  jpeg_destroy_compress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// Slide interface
// ---------------------------------------------------------------------------
struct SlideImpl {
  virtual ~SlideImpl() = default;
  virtual int level_count() const = 0;
  virtual void level_dimensions(int level, int64_t *w, int64_t *h) const = 0;
  virtual double level_downsample(int level) const = 0;
  // read RGB region; location in level-0 coords; out is w*h*3, pre-filled
  // white by the caller
  virtual bool read_region(int64_t x, int64_t y, int level, int64_t w,
                           int64_t h, uint8_t *out) = 0;
};

// ---------------------------------------------------------------------------
// SPY container
//
// layout (little endian):
//   magic "SPY1" | u32 n_levels | u32 tile_size | u32 codec
//   per level: u32 w | u32 h
//   per level: tile table (u64 offset | u32 byte_size) x (tx*ty)
//   tile payloads
// codec: 0 = raw RGB, 1 = JPEG
// ---------------------------------------------------------------------------
struct SpyLevel {
  uint32_t w = 0, h = 0;
  uint32_t tx = 0, ty = 0;
  std::vector<std::pair<uint64_t, uint32_t>> tiles;
};

class SpySlide : public SlideImpl {
 public:
  static SpySlide *open(const std::string &path) {
    FILE *f = fopen(path.c_str(), "rb");
    if (!f) {
      set_error("cannot open " + path);
      return nullptr;
    }
    auto s = std::make_unique<SpySlide>();
    char magic[4];
    uint32_t n_levels = 0;
    if (fread(magic, 1, 4, f) != 4 || memcmp(magic, "SPY1", 4) != 0) {
      set_error("bad SPY magic");
      fclose(f);
      return nullptr;
    }
    // every header read is checked: a truncated file (e.g. a writer that
    // died before finish()) must surface "truncated SPY" through
    // sio_get_error, not feed garbage dims into resize()
    auto rd = [&](void *dst, size_t sz) { return fread(dst, sz, 1, f) == 1; };
    bool ok = rd(&n_levels, 4) && rd(&s->tile_size_, 4) && rd(&s->codec_, 4);
    // sanity bounds: dims below are trusted for allocation sizes
    ok = ok && n_levels >= 1 && n_levels <= 64 && s->tile_size_ >= 16 &&
         s->tile_size_ <= 16384 && s->codec_ <= 1;
    if (ok) {
      s->levels_.resize(n_levels);
      for (auto &lv : s->levels_) {
        ok = ok && rd(&lv.w, 4) && rd(&lv.h, 4) && lv.w > 0 && lv.h > 0 &&
             lv.w <= (1u << 30) && lv.h <= (1u << 30);
        if (!ok) break;
        lv.tx = (lv.w + s->tile_size_ - 1) / s->tile_size_;
        lv.ty = (lv.h + s->tile_size_ - 1) / s->tile_size_;
      }
    }
    if (ok) {
      for (auto &lv : s->levels_) {
        lv.tiles.resize(size_t(lv.tx) * lv.ty);
        for (auto &t : lv.tiles) {
          uint64_t off;
          uint32_t sz;
          if (!(rd(&off, 8) && rd(&sz, 4))) {
            ok = false;
            break;
          }
          t = {off, sz};
        }
        if (!ok) break;
      }
    }
    if (!ok) {
      set_error("truncated or corrupt SPY header in " + path);
      fclose(f);
      return nullptr;
    }
    s->file_ = f;
    return s.release();
  }

  ~SpySlide() override {
    if (file_) fclose(file_);
  }

  int level_count() const override { return (int)levels_.size(); }
  void level_dimensions(int level, int64_t *w, int64_t *h) const override {
    *w = levels_[level].w;
    *h = levels_[level].h;
  }
  double level_downsample(int level) const override {
    return double(levels_[0].w) / levels_[level].w;
  }

  bool read_region(int64_t x0, int64_t y0, int level, int64_t w, int64_t h,
                   uint8_t *out) override {
    if (level < 0 || level >= (int)levels_.size()) {
      set_error("bad level");
      return false;
    }
    const SpyLevel &lv = levels_[level];
    const double ds = level_downsample(level);
    const int64_t lx0 = (int64_t)(x0 / ds), ly0 = (int64_t)(y0 / ds);
    const uint32_t T = tile_size_;
    int64_t tx0 = std::max<int64_t>(0, lx0 / T);
    int64_t ty0 = std::max<int64_t>(0, ly0 / T);
    int64_t tx1 = std::min<int64_t>(lv.tx - 1, (lx0 + w - 1) / T);
    int64_t ty1 = std::min<int64_t>(lv.ty - 1, (ly0 + h - 1) / T);
    if (tx1 < tx0 || ty1 < ty0) return true;  // fully outside: stays white

    std::atomic<bool> ok(true);
    Latch latch(int((tx1 - tx0 + 1) * (ty1 - ty0 + 1)));
    for (int64_t ty = ty0; ty <= ty1; ++ty) {
      for (int64_t tx = tx0; tx <= tx1; ++tx) {
        pool().submit([&, tx, ty] {
          std::vector<uint8_t> payload;
          {
            auto [off, sz] = lv.tiles[ty * lv.tx + tx];
            std::lock_guard<std::mutex> lk(io_mu_);
            payload.resize(sz);
            if (sz) {
              fseek(file_, (long)off, SEEK_SET);
              if (fread(payload.data(), 1, sz, file_) != sz) {
                ok = false;
                latch.done();
                return;
              }
            }
          }
          std::vector<uint8_t> rgb;
          uint32_t tw = std::min<uint32_t>(T, lv.w - tx * T);
          uint32_t th = std::min<uint32_t>(T, lv.h - ty * T);
          if (payload.empty()) {
            rgb.assign(size_t(tw) * th * 3, 255);
          } else if (codec_ == 1) {
            uint32_t dw, dh;
            if (!decode_jpeg(payload.data(), payload.size(), rgb, dw, dh) ||
                dw != tw || dh != th) {
              ok = false;
              latch.done();
              return;
            }
          } else {
            rgb = std::move(payload);
            if (rgb.size() != size_t(tw) * th * 3) {
              ok = false;
              latch.done();
              return;
            }
          }
          // blit the intersection of this tile with the request window
          int64_t gx0 = tx * T, gy0 = ty * T;          // tile origin (level)
          int64_t ix0 = std::max(gx0, lx0), iy0 = std::max(gy0, ly0);
          int64_t ix1 = std::min<int64_t>(gx0 + tw, lx0 + w);
          int64_t iy1 = std::min<int64_t>(gy0 + th, ly0 + h);
          for (int64_t yy = iy0; yy < iy1; ++yy) {
            const uint8_t *src = rgb.data() + ((yy - gy0) * tw + (ix0 - gx0)) * 3;
            uint8_t *dst = out + ((yy - ly0) * w + (ix0 - lx0)) * 3;
            memcpy(dst, src, size_t(ix1 - ix0) * 3);
          }
          latch.done();
        });
      }
    }
    latch.wait();
    if (!ok) set_error("tile decode failed");
    return ok;
  }

  FILE *file_ = nullptr;
  uint32_t tile_size_ = 256, codec_ = 1;
  std::vector<SpyLevel> levels_;
  std::mutex io_mu_;
};

// ---------------------------------------------------------------------------
// SPY writer
// ---------------------------------------------------------------------------
class SpyWriter {
 public:
  SpyWriter(const std::string &path, uint32_t tile_size, uint32_t codec,
            const std::vector<std::pair<uint32_t, uint32_t>> &dims)
      : codec_(codec), tile_size_(tile_size) {
    f_ = fopen(path.c_str(), "wb");
    if (!f_) {
      set_error("cannot create " + path);
      return;
    }
    levels_.resize(dims.size());
    for (size_t i = 0; i < dims.size(); ++i) {
      levels_[i].w = dims[i].first;
      levels_[i].h = dims[i].second;
      levels_[i].tx = (levels_[i].w + tile_size - 1) / tile_size;
      levels_[i].ty = (levels_[i].h + tile_size - 1) / tile_size;
      levels_[i].tiles.assign(size_t(levels_[i].tx) * levels_[i].ty, {0, 0});
    }
    // header + table placeholder
    fwrite("SPY1", 1, 4, f_);
    uint32_t n = (uint32_t)levels_.size();
    fwrite(&n, 4, 1, f_);
    fwrite(&tile_size_, 4, 1, f_);
    fwrite(&codec_, 4, 1, f_);
    for (auto &lv : levels_) {
      fwrite(&lv.w, 4, 1, f_);
      fwrite(&lv.h, 4, 1, f_);
    }
    table_pos_ = ftell(f_);
    for (auto &lv : levels_)
      for (size_t i = 0; i < lv.tiles.size(); ++i) {
        uint64_t z64 = 0;
        uint32_t z32 = 0;
        fwrite(&z64, 8, 1, f_);
        fwrite(&z32, 4, 1, f_);
      }
  }

  bool write_tile(int level, uint32_t tx, uint32_t ty, const uint8_t *rgb) {
    if (!f_) return false;
    SpyLevel &lv = levels_[level];
    uint32_t tw = std::min<uint32_t>(tile_size_, lv.w - tx * tile_size_);
    uint32_t th = std::min<uint32_t>(tile_size_, lv.h - ty * tile_size_);
    std::vector<uint8_t> payload;
    if (codec_ == 1) {
      if (!encode_jpeg(rgb, tw, th, 90, payload)) {
        set_error("jpeg encode failed");
        return false;
      }
    } else {
      payload.assign(rgb, rgb + size_t(tw) * th * 3);
    }
    fseek(f_, 0, SEEK_END);
    uint64_t off = ftell(f_);
    fwrite(payload.data(), 1, payload.size(), f_);
    lv.tiles[ty * lv.tx + tx] = {off, (uint32_t)payload.size()};
    return true;
  }

  bool finish() {
    if (!f_) return false;
    fseek(f_, (long)table_pos_, SEEK_SET);
    for (auto &lv : levels_)
      for (auto &t : lv.tiles) {
        fwrite(&t.first, 8, 1, f_);
        fwrite(&t.second, 4, 1, f_);
      }
    fclose(f_);
    f_ = nullptr;
    return true;
  }

  ~SpyWriter() {
    if (f_) finish();
  }

  FILE *f_ = nullptr;
  uint32_t codec_, tile_size_;
  uint64_t table_pos_ = 0;
  std::vector<SpyLevel> levels_;
};

// ---------------------------------------------------------------------------
// OpenSlide passthrough (dlopen)
// ---------------------------------------------------------------------------
class OpenSlidePass : public SlideImpl {
 public:
  static OpenSlidePass *open(const std::string &path) {
    void *lib = lib_handle();
    if (!lib) {
      set_error("libopenslide not available on this system");
      return nullptr;
    }
    auto s = std::make_unique<OpenSlidePass>();
    s->osr_ = fn<void *(*)(const char *)>("openslide_open")(path.c_str());
    if (!s->osr_) {
      set_error("openslide_open failed for " + path);
      return nullptr;
    }
    const char *err = fn<const char *(*)(void *)>("openslide_get_error")(s->osr_);
    if (err) {
      set_error(err);
      return nullptr;
    }
    return s.release();
  }
  ~OpenSlidePass() override {
    if (osr_) fn<void (*)(void *)>("openslide_close")(osr_);
  }
  int level_count() const override {
    return fn<int32_t (*)(void *)>("openslide_get_level_count")(osr_);
  }
  void level_dimensions(int level, int64_t *w, int64_t *h) const override {
    fn<void (*)(void *, int32_t, int64_t *, int64_t *)>(
        "openslide_get_level_dimensions")(osr_, level, w, h);
  }
  double level_downsample(int level) const override {
    return fn<double (*)(void *, int32_t)>(
        "openslide_get_level_downsample")(osr_, level);
  }
  bool read_region(int64_t x, int64_t y, int level, int64_t w, int64_t h,
                   uint8_t *out) override {
    std::vector<uint32_t> argb(size_t(w) * h);
    fn<void (*)(void *, uint32_t *, int64_t, int64_t, int32_t, int64_t,
                int64_t)>("openslide_read_region")(osr_, argb.data(), x, y,
                                                   level, w, h);
    // premultiplied BGRA -> RGB over white (the _convert.pyd equivalent)
    for (size_t i = 0; i < argb.size(); ++i) {
      uint32_t px = argb[i];
      uint32_t a = px >> 24, r = (px >> 16) & 0xff, g = (px >> 8) & 0xff,
               b = px & 0xff;
      uint8_t *o = out + i * 3;
      if (a == 255) {
        o[0] = r; o[1] = g; o[2] = b;
      } else if (a == 0) {
        o[0] = o[1] = o[2] = 255;
      } else {
        o[0] = (uint8_t)std::min<uint32_t>(255, r * 255 / a);
        o[1] = (uint8_t)std::min<uint32_t>(255, g * 255 / a);
        o[2] = (uint8_t)std::min<uint32_t>(255, b * 255 / a);
      }
    }
    return true;
  }

 private:
  static void *lib_handle() {
    static void *lib = [] {
      for (const char *n : {"libopenslide.so.1", "libopenslide.so.0",
                            "libopenslide.so"}) {
        if (void *h = dlopen(n, RTLD_NOW | RTLD_GLOBAL)) return h;
      }
      return (void *)nullptr;
    }();
    return lib;
  }
  template <typename F>
  static F fn(const char *name) {
    return reinterpret_cast<F>(dlsym(lib_handle(), name));
  }
  void *osr_ = nullptr;
};

// ---------------------------------------------------------------------------
// KFB backend (dlopen libkfbslide; tile assembly per kfbslide.py:82-120)
// ---------------------------------------------------------------------------
class KfbSlideNative : public SlideImpl {
 public:
  static KfbSlideNative *open(const std::string &path) {
    void *lib = lib_handle();
    if (!lib) {
      set_error("libkfbslide not available on this system");
      return nullptr;
    }
    auto s = std::make_unique<KfbSlideNative>();
    s->osr_ = fn<void *(*)(const char *)>("kfbslide_open")(path.c_str());
    if (!s->osr_) {
      set_error("kfbslide_open failed for " + path);
      return nullptr;
    }
    return s.release();
  }
  ~KfbSlideNative() override {
    if (osr_) fn<void (*)(void *)>("kfbslide_close")(osr_);
  }
  int level_count() const override {
    return fn<int32_t (*)(void *)>("kfbslide_get_level_count")(osr_);
  }
  void level_dimensions(int level, int64_t *w, int64_t *h) const override {
    fn<void (*)(void *, int32_t, int64_t *, int64_t *)>(
        "kfbslide_get_level_dimensions")(osr_, level, w, h);
  }
  double level_downsample(int level) const override {
    return fn<double (*)(void *, int32_t)>(
        "kfbslide_get_level_downsample")(osr_, level);
  }
  bool read_region(int64_t x0, int64_t y0, int level, int64_t w, int64_t h,
                   uint8_t *out) override {
    // kfbslide_read_region returns one JPEG tile anchored at a
    // tile-aligned position (tile grid of 256, kfbslide.py:96-118);
    // assemble the request from the covering tiles.
    const int64_t T = 256;
    const double ds = level_downsample(level);
    const int64_t lx0 = (int64_t)(x0 / ds), ly0 = (int64_t)(y0 / ds);
    for (int64_t ty = ly0 / T; ty * T < ly0 + h; ++ty) {
      for (int64_t tx = lx0 / T; tx * T < lx0 + w; ++tx) {
        int data_len = 0;
        uint8_t *pix = nullptr;
        bool okc = fn<bool (*)(void *, int32_t, int64_t, int64_t, int *,
                               uint8_t **)>("kfbslide_read_region")(
            osr_, level, tx * T, ty * T, &data_len, &pix);
        if (!okc || data_len <= 0) continue;  // outside / missing tile
        std::vector<uint8_t> rgb;
        uint32_t tw, th;
        bool dec = decode_jpeg(pix, (size_t)data_len, rgb, tw, th);
        fn<bool (*)(uint8_t *)>("kfb_delete_imagedata")(pix);
        if (!dec) continue;
        int64_t gx0 = tx * T, gy0 = ty * T;
        int64_t ix0 = std::max(gx0, lx0), iy0 = std::max(gy0, ly0);
        int64_t ix1 = std::min<int64_t>(gx0 + tw, lx0 + w);
        int64_t iy1 = std::min<int64_t>(gy0 + th, ly0 + h);
        for (int64_t yy = iy0; yy < iy1; ++yy) {
          const uint8_t *src = rgb.data() + ((yy - gy0) * tw + (ix0 - gx0)) * 3;
          uint8_t *dst = out + ((yy - ly0) * w + (ix0 - lx0)) * 3;
          memcpy(dst, src, size_t(ix1 - ix0) * 3);
        }
      }
    }
    return true;
  }

 private:
  static void *lib_handle() {
    static void *lib = [] {
      for (const char *n : {"libkfbslide.so"}) {
        if (void *h = dlopen(n, RTLD_NOW | RTLD_GLOBAL)) return h;
      }
      return (void *)nullptr;
    }();
    return lib;
  }
  template <typename F>
  static F fn(const char *name) {
    return reinterpret_cast<F>(dlsym(lib_handle(), name));
  }
  void *osr_ = nullptr;
};

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------
static bool ends_with(const std::string &s, const std::string &suf) {
  return s.size() >= suf.size() &&
         s.compare(s.size() - suf.size(), suf.size(), suf) == 0;
}

extern "C" {

// Runtime CPU identity for the XLA:CPU AOT-cache fingerprint
// (acmil_tpu/__init__.py). /proc/cpuinfo is a boot-time snapshot: after
// a VM live-migration the kernel keeps reporting the old host's flags
// while LLVM re-detects features via CPUID at JIT/AOT time, so stale
// cache entries can SIGILL/SIGABRT (observed r4/r5). Executing CPUID
// here sees exactly what LLVM sees. Returns bytes written, or 0 on
// non-x86 builds (caller falls back to the cpuinfo hash alone).
int32_t sio_cpu_identity(char *out, int32_t cap) {
#if defined(__x86_64__) || defined(__i386__)
  uint32_t regs[4];
  std::string s;
  auto leaf = [&](uint32_t eax, uint32_t ecx) {
    __asm__ volatile("cpuid"
                     : "=a"(regs[0]), "=b"(regs[1]), "=c"(regs[2]),
                       "=d"(regs[3])
                     : "a"(eax), "c"(ecx));
    char buf[64];
    snprintf(buf, sizeof buf, "%08x.%08x.%08x.%08x;", regs[0], regs[1],
             regs[2], regs[3]);
    s += buf;
  };
  leaf(0, 0);           // vendor
  leaf(1, 0);           // family/model/stepping + base features
  leaf(7, 0);           // AVX2/AVX-512/AMX feature words
  leaf(7, 1);           // AVX-VNNI / AMX-FP16 extensions
  leaf(0x0d, 1);        // XSAVE features (AMX state)
  leaf(0x80000001u, 0); // extended features
  int32_t n = (int32_t)std::min<size_t>(s.size(), (size_t)cap - 1);
  memcpy(out, s.data(), n);
  out[n] = '\0';
  return n;
#else
  (void)out;
  (void)cap;
  return 0;
#endif
}

void *sio_open(const char *path) {
  std::string p(path);
  std::string lower = p;
  for (auto &c : lower) c = (char)tolower(c);
  if (ends_with(lower, ".spy")) return SpySlide::open(p);
  if (ends_with(lower, ".kfb")) return KfbSlideNative::open(p);
  return OpenSlidePass::open(p);
}

void sio_close(void *h) { delete static_cast<SlideImpl *>(h); }

int32_t sio_level_count(void *h) {
  return static_cast<SlideImpl *>(h)->level_count();
}

void sio_level_dimensions(void *h, int32_t level, int64_t *w, int64_t *h_out) {
  static_cast<SlideImpl *>(h)->level_dimensions(level, w, h_out);
}

double sio_level_downsample(void *h, int32_t level) {
  return static_cast<SlideImpl *>(h)->level_downsample(level);
}

int32_t sio_best_level_for_downsample(void *h, double ds) {
  SlideImpl *s = static_cast<SlideImpl *>(h);
  int best = 0;
  for (int i = 0; i < s->level_count(); ++i)
    if (s->level_downsample(i) <= ds + 0.01) best = i;
  return best;
}

// out must hold w*h*3 bytes; filled white first (edge semantics)
int32_t sio_read_region(void *h, uint8_t *out, int64_t x, int64_t y,
                        int32_t level, int64_t w, int64_t hgt) {
  memset(out, 255, size_t(w) * hgt * 3);
  return static_cast<SlideImpl *>(h)->read_region(x, y, level, w, hgt, out)
             ? 1
             : 0;
}

const char *sio_get_error() { return g_error.c_str(); }

// writer API
void *sio_create(const char *path, int32_t n_levels, const uint32_t *ws,
                 const uint32_t *hs, uint32_t tile_size, uint32_t codec) {
  std::vector<std::pair<uint32_t, uint32_t>> dims;
  for (int i = 0; i < n_levels; ++i) dims.push_back({ws[i], hs[i]});
  auto *w = new SpyWriter(path, tile_size, codec, dims);
  if (!w->f_) {
    delete w;
    return nullptr;
  }
  return w;
}

int32_t sio_write_tile(void *w, int32_t level, uint32_t tx, uint32_t ty,
                       const uint8_t *rgb) {
  return static_cast<SpyWriter *>(w)->write_tile(level, tx, ty, rgb) ? 1 : 0;
}

int32_t sio_finish(void *w) {
  SpyWriter *sw = static_cast<SpyWriter *>(w);
  bool ok = sw->finish();
  delete sw;
  return ok ? 1 : 0;
}

}  // extern "C"
