// Native scene decoder + async prefetcher for the data layer.
//
// The reference decodes every scene on the Python hot path with PIL
// (reference dataset.py:200-218 — SURVEY §3.1 flags chunk construction as
// the I/O hot spot). This library moves decoding to C++ (libpng, no Python
// object churn) and adds a background prefetch thread so the *next*
// chunk's scenes decode while the accelerator trains on the current one —
// the runtime tier the reference delegates entirely to PyTorch.
//
// Exposed C ABI (consumed by cvcs_tpu/native/__init__.py via ctypes):
//   tr_decode_png(path, out_buf, buf_len, &w, &h, &c) -> 0 on success
//   tr_png_info(path, &w, &h, &c)                     -> 0 on success
//   tr_decode_tiff / tr_tiff_info                     same, for TIFF
//   tr_info / tr_decode        extension-dispatched (.tif/.tiff -> TIFF,
//                               else PNG) — the generic entry points
//   tr_prefetch(path)          enqueue background decode into the cache
//   tr_take(path, out, len, &w, &h, &c)  blocking fetch (decodes inline on
//                               miss), removes the entry from the cache
//   tr_cache_size()            entries currently cached
//   tr_encode_png(path, buf, w, h, c)    synchronous PNG write
//   tr_write_async(path, buf, w, h, c)   enqueue background PNG write
//   tr_flush_writes()          block until the write queue drains; returns
//                               the number of failed writes since last flush
//
// Single worker thread by design: the box is 1-core, the win is overlap
// with device compute, not parallel decode.

#include <png.h>
#include <tiffio.h>

#include <algorithm>
#include <cctype>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  uint32_t w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;
  bool ok = false;
};

// Supported = formats this decoder reads BYTE-IDENTICALLY to the PIL
// fallback (`np.asarray(Image.open(p))`): 8-bit gray / gray+alpha /
// RGB / RGBA, no palette, no tRNS. Palette PNGs decode to *indices* in
// PIL but would need expansion here (and tr_png_info used to report the
// pre-expansion channel count, so every palette load over-ran the
// caller's buffer and silently killed the native tier); 16-bit PNGs
// decode to >8-bit arrays in PIL. Both classes are REJECTED up front —
// tr_png_info fails fast and callers fall back to PIL before wasting a
// prefetch decode.
bool png_supported(int bit_depth, int color_type, bool has_trns) {
  if (bit_depth != 8 || has_trns) return false;
  return color_type == PNG_COLOR_TYPE_GRAY ||
         color_type == PNG_COLOR_TYPE_GRAY_ALPHA ||
         color_type == PNG_COLOR_TYPE_RGB ||
         color_type == PNG_COLOR_TYPE_RGB_ALPHA;
}

Image decode_png_file(const char* path) {
  Image img;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return img;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(fp);
    return img;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (!png_supported(bit_depth, color_type,
                     png_get_valid(png, info, PNG_INFO_tRNS) != 0)) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return img;  // ok=false -> caller falls back to PIL
  }
  png_read_update_info(png, info);

  const size_t rowbytes = png_get_rowbytes(png, info);
  const uint32_t channels = png_get_channels(png, info);
  img.w = w;
  img.h = h;
  img.c = channels;
  img.data.resize(rowbytes * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 r = 0; r < h; ++r) rows[r] = img.data.data() + r * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  img.ok = true;
  return img;
}

// ---------------------------------------------------------------------------
// TIFF tier. The reference's color masks are .tif (reference
// dataset.py:217, :99) and real GID15 NirRGB scenes ship as TIFF, so
// without this the decode hot path fell back to single-core PIL for the
// exact files the tier was built for (round-3 verdict, Missing #3).
//
// Same strict-format contract as PNG: decode BYTE-IDENTICALLY to
// `np.asarray(Image.open(p))` for 8-bit gray / gray+alpha / RGB / RGBA,
// contiguous planar layout, top-left orientation, stripped or tiled, any
// strip/tile compression libtiff handles losslessly (none / LZW / Deflate
// / PackBits), either byte order (libtiff normalises headers; 8-bit
// samples have no payload endianness). Everything else — palette,
// 16-bit/float, separate planes, YCbCr/JPEG, inverted gray — is REJECTED
// up front by tr_tiff_info so callers fall back to PIL before wasting a
// prefetch decode.

// libtiff's default handlers print to stderr; decode failures are an
// expected fallback signal here, so silence them once at load time.
struct TiffSilencer {
  TiffSilencer() {
    TIFFSetErrorHandler(nullptr);
    TIFFSetWarningHandler(nullptr);
  }
};
const TiffSilencer tiff_silencer;

bool tiff_supported(TIFF* tif) {
  uint16_t bits = 0, spp = 0, photo = 0, planar = 0, fmt = 0, comp = 0,
           orient = 0;
  TIFFGetFieldDefaulted(tif, TIFFTAG_BITSPERSAMPLE, &bits);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &spp);
  TIFFGetFieldDefaulted(tif, TIFFTAG_PLANARCONFIG, &planar);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLEFORMAT, &fmt);
  TIFFGetFieldDefaulted(tif, TIFFTAG_COMPRESSION, &comp);
  TIFFGetFieldDefaulted(tif, TIFFTAG_ORIENTATION, &orient);
  if (!TIFFGetField(tif, TIFFTAG_PHOTOMETRIC, &photo)) return false;
  if (bits != 8 || fmt != SAMPLEFORMAT_UINT) return false;
  if (orient != ORIENTATION_TOPLEFT) return false;
  if (planar != PLANARCONFIG_CONTIG && spp != 1) return false;
  if (comp == COMPRESSION_JPEG || comp == COMPRESSION_OJPEG) return false;
  if (!TIFFIsCODECConfigured(comp)) return false;
  if (photo == PHOTOMETRIC_MINISBLACK) return spp == 1 || spp == 2;
  if (photo == PHOTOMETRIC_RGB) return spp == 3 || spp == 4;
  return false;
}

Image decode_tiff_file(const char* path) {
  Image img;
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return img;
  if (!tiff_supported(tif)) {
    TIFFClose(tif);
    return img;  // ok=false -> caller falls back to PIL
  }
  uint32_t w = 0, h = 0;
  uint16_t spp = 0;
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &spp);
  if (w == 0 || h == 0) {
    TIFFClose(tif);
    return img;
  }
  const size_t rowbytes = static_cast<size_t>(w) * spp;
  img.data.resize(rowbytes * h);

  bool ok = true;
  if (TIFFIsTiled(tif)) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif, TIFFTAG_TILELENGTH, &th);
    if (tw == 0 || th == 0) {
      ok = false;
    } else {
      std::vector<uint8_t> tile(TIFFTileSize(tif));
      for (uint32_t y0 = 0; ok && y0 < h; y0 += th) {
        for (uint32_t x0 = 0; ok && x0 < w; x0 += tw) {
          if (TIFFReadTile(tif, tile.data(), x0, y0, 0, 0) < 0) {
            ok = false;
            break;
          }
          const uint32_t rows = std::min(th, h - y0);
          const size_t copy = static_cast<size_t>(std::min(tw, w - x0)) * spp;
          for (uint32_t r = 0; r < rows; ++r)
            std::memcpy(img.data.data() + (y0 + r) * rowbytes +
                            static_cast<size_t>(x0) * spp,
                        tile.data() + static_cast<size_t>(r) * tw * spp, copy);
        }
      }
    }
  } else {
    uint32_t rps = 0;
    TIFFGetFieldDefaulted(tif, TIFFTAG_ROWSPERSTRIP, &rps);
    if (rps == 0 || rps > h) rps = h;
    const tstrip_t nstrips = TIFFNumberOfStrips(tif);
    for (tstrip_t s = 0; s < nstrips; ++s) {
      const uint32_t row0 = static_cast<uint32_t>(s) * rps;
      if (row0 >= h) break;
      const uint32_t rows = std::min(rps, h - row0);
      const tmsize_t want = static_cast<tmsize_t>(rows) * rowbytes;
      if (TIFFReadEncodedStrip(tif, s, img.data.data() + row0 * rowbytes,
                               want) != want) {
        ok = false;
        break;
      }
    }
  }
  TIFFClose(tif);
  if (!ok) return Image{};
  img.w = w;
  img.h = h;
  img.c = spp;
  img.ok = true;
  return img;
}

int tiff_info(const char* path, uint32_t* w, uint32_t* h, uint32_t* c) {
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return -1;
  if (!tiff_supported(tif)) {
    TIFFClose(tif);
    return -1;
  }
  uint32_t iw = 0, ih = 0;
  uint16_t spp = 0;
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &iw);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &ih);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &spp);
  TIFFClose(tif);
  if (iw == 0 || ih == 0) return -1;
  *w = iw;
  *h = ih;
  *c = spp;
  return 0;
}

// Extension dispatch (.tif/.tiff -> TIFF, everything else -> PNG): lets
// tr_prefetch / tr_take stay path-keyed with one cache across formats.
bool is_tiff_path(const char* path) {
  const std::string p(path);
  const size_t dot = p.rfind('.');
  if (dot == std::string::npos) return false;
  std::string ext = p.substr(dot + 1);
  for (auto& ch : ext) ch = static_cast<char>(std::tolower(ch));
  return ext == "tif" || ext == "tiff";
}

Image decode_file(const char* path) {
  return is_tiff_path(path) ? decode_tiff_file(path) : decode_png_file(path);
}

class Prefetcher {
 public:
  Prefetcher() : worker_(&Prefetcher::run, this) {}

  void prefetch(const std::string& path) {
    std::lock_guard<std::mutex> lk(mu_);
    if (cache_.count(path) || pending_.count(path)) return;
    pending_.insert({path, true});
    queue_.push_back(path);
    cv_.notify_one();
  }

  Image take(const std::string& path) {
    std::unique_lock<std::mutex> lk(mu_);
    if (!cache_.count(path) && !pending_.count(path)) {
      lk.unlock();
      return decode_file(path.c_str());  // cold miss: decode inline
    }
    // wait for "cached OR no longer pending": a concurrent take() of the
    // same path can move+erase the entry first, and a cache_-only
    // predicate would then block forever (ctypes releases the GIL here,
    // so multi-threaded callers are real)
    cv_done_.wait(lk, [&] {
      return cache_.count(path) > 0 || pending_.count(path) == 0;
    });
    auto it = cache_.find(path);
    if (it == cache_.end()) {
      lk.unlock();
      return decode_file(path.c_str());  // lost the race: decode inline
    }
    Image img = std::move(it->second);
    cache_.erase(it);
    return img;
  }

  size_t size() {
    std::lock_guard<std::mutex> lk(mu_);
    return cache_.size();
  }

 private:
  void run() {
    for (;;) {
      std::string path;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return !queue_.empty(); });
        path = queue_.front();
        queue_.pop_front();
      }
      Image img = decode_file(path.c_str());
      {
        std::lock_guard<std::mutex> lk(mu_);
        cache_[path] = std::move(img);
        pending_.erase(path);
      }
      cv_done_.notify_all();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_, cv_done_;
  std::deque<std::string> queue_;
  std::map<std::string, Image> cache_;
  std::map<std::string, bool> pending_;
  std::thread worker_;
};

Prefetcher& prefetcher() {
  static Prefetcher* p = new Prefetcher();  // leaked on purpose: detached
  return *p;
}

bool encode_png_file(const char* path, const uint8_t* buf, uint32_t w,
                     uint32_t h, uint32_t c) {
  if (c != 1 && c != 3 && c != 4) return false;
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return false;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  const int color = c == 1   ? PNG_COLOR_TYPE_GRAY
                    : c == 3 ? PNG_COLOR_TYPE_RGB
                             : PNG_COLOR_TYPE_RGBA;
  png_set_IHDR(png, info, w, h, 8, color, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  // masks are flat-colored: fastest filter + light compression
  png_set_compression_level(png, 1);
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (uint32_t r = 0; r < h; ++r)
    rows[r] = const_cast<png_bytep>(buf + static_cast<size_t>(r) * w * c);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return true;
}

struct WriteJob {
  std::string path;
  std::vector<uint8_t> data;
  uint32_t w, h, c;
};

class Writer {
 public:
  Writer() : worker_(&Writer::run, this) {}

  void enqueue(WriteJob job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      queue_.push_back(std::move(job));
      ++outstanding_;
    }
    cv_.notify_one();
  }

  int64_t flush() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_done_.wait(lk, [&] { return outstanding_ == 0; });
    int64_t f = failures_;
    failures_ = 0;
    return f;
  }

 private:
  void run() {
    for (;;) {
      WriteJob job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return !queue_.empty(); });
        job = std::move(queue_.front());
        queue_.pop_front();
      }
      bool ok = encode_png_file(job.path.c_str(), job.data.data(), job.w,
                                job.h, job.c);
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (!ok) ++failures_;
        --outstanding_;
      }
      cv_done_.notify_all();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_, cv_done_;
  std::deque<WriteJob> queue_;
  int64_t outstanding_ = 0;
  int64_t failures_ = 0;
  std::thread worker_;
};

Writer& writer() {
  static Writer* w = new Writer();
  return *w;
}

int copy_out(const Image& img, uint8_t* out, int64_t out_len, uint32_t* w,
             uint32_t* h, uint32_t* c) {
  if (!img.ok) return -1;
  *w = img.w;
  *h = img.h;
  *c = img.c;
  const int64_t need = static_cast<int64_t>(img.data.size());
  if (out_len < need) return static_cast<int>(need > 0 ? -2 : -1);
  std::memcpy(out, img.data.data(), need);
  return 0;
}

}  // namespace

extern "C" {

int tr_png_info(const char* path, uint32_t* w, uint32_t* h, uint32_t* c) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(fp);
    return -1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 iw, ih;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &iw, &ih, &bit_depth, &color_type, nullptr,
               nullptr, nullptr);
  // reject what decode_png_file rejects, so the reported channel count
  // always matches the decode and unsupported files fall back to PIL
  // BEFORE any buffer allocation or prefetch decode
  if (!png_supported(bit_depth, color_type,
                     png_get_valid(png, info, PNG_INFO_tRNS) != 0)) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -1;
  }
  *w = iw;
  *h = ih;
  *c = png_get_channels(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

int tr_decode_png(const char* path, uint8_t* out, int64_t out_len,
                  uint32_t* w, uint32_t* h, uint32_t* c) {
  return copy_out(decode_png_file(path), out, out_len, w, h, c);
}

int tr_tiff_info(const char* path, uint32_t* w, uint32_t* h, uint32_t* c) {
  return tiff_info(path, w, h, c);
}

int tr_decode_tiff(const char* path, uint8_t* out, int64_t out_len,
                   uint32_t* w, uint32_t* h, uint32_t* c) {
  return copy_out(decode_tiff_file(path), out, out_len, w, h, c);
}

// Generic, extension-dispatched entry points — what the Python tier calls.
int tr_info(const char* path, uint32_t* w, uint32_t* h, uint32_t* c) {
  return is_tiff_path(path) ? tiff_info(path, w, h, c)
                            : tr_png_info(path, w, h, c);
}

int tr_decode(const char* path, uint8_t* out, int64_t out_len, uint32_t* w,
              uint32_t* h, uint32_t* c) {
  return copy_out(decode_file(path), out, out_len, w, h, c);
}

void tr_prefetch(const char* path) { prefetcher().prefetch(path); }

int tr_take(const char* path, uint8_t* out, int64_t out_len, uint32_t* w,
            uint32_t* h, uint32_t* c) {
  return copy_out(prefetcher().take(path), out, out_len, w, h, c);
}

int64_t tr_cache_size() {
  return static_cast<int64_t>(prefetcher().size());
}

int tr_encode_png(const char* path, const uint8_t* buf, uint32_t w,
                  uint32_t h, uint32_t c) {
  return encode_png_file(path, buf, w, h, c) ? 0 : -1;
}

void tr_write_async(const char* path, const uint8_t* buf, uint32_t w,
                    uint32_t h, uint32_t c) {
  WriteJob job;
  job.path = path;
  job.data.assign(buf, buf + static_cast<size_t>(w) * h * c);
  job.w = w;
  job.h = h;
  job.c = c;
  writer().enqueue(std::move(job));
}

int64_t tr_flush_writes() { return writer().flush(); }

}  // extern "C"
