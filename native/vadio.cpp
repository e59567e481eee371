// vadio: native frame-decode + prefetch runtime for vec_vad_tpu.
//
// The reference pipeline decodes every frame on the Python hot path with
// cv2.imread inside Dataset.__getitem__ (vad_datasets.py:18-25,356-402) —
// the #1 host bottleneck feeding the accelerator. This library provides:
//
//   * decode-to-preallocated-buffer JPEG/PNG/TIFF decoding (BGR uint8,
//     matching cv2.imread's channel convention — TIFF covers UCSDped2's
//     .tif frames) with zero Python-side allocation,
//   * a std::thread pool that decodes a batch of files in parallel into one
//     contiguous (N, H, W, 3) buffer, and
//   * a background prefetcher that pipelines chunk N+1's disk+decode work
//     under chunk N's device compute.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC vadio.cpp -ljpeg -lpng -ltiff)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <tiffio.h>
#include <csetjmp>

namespace {

// libtiff reports recoverable oddities (unknown tags etc.) to stderr by
// default — spam on threaded batch decode; errors still surface as rc
const bool tiff_quiet = [] {
  TIFFSetWarningHandler(nullptr);
  return true;
}();

// ---------------------------------------------------------------------------
// Decoders: file -> BGR uint8 into caller buffer (h*w*3). Returns 0 on
// success, negative error codes otherwise. If (h, w) mismatch the file,
// returns -2 so callers can detect inconsistent datasets.
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

int decode_jpeg_file(const char* path, uint8_t* out, int h, int w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale sources expand to RGB
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != h || (int)cinfo.output_width != w) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  std::vector<uint8_t> row(w * 3);
  uint8_t* rp = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = out + (size_t)y * w * 3;
    for (int x = 0; x < w; ++x) {  // RGB -> BGR (cv2 convention)
      dst[x * 3 + 0] = rp[x * 3 + 2];
      dst[x * 3 + 1] = rp[x * 3 + 1];
      dst[x * 3 + 2] = rp[x * 3 + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

int decode_png_file(const char* path, uint8_t* out, int h, int w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(f);
    return -5;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(f);
    return -5;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -3;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int width = png_get_image_width(png, info);
  int height = png_get_image_height(png, info);
  if (height != h || width != w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_bgr(png);  // emit BGR directly
  png_read_update_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + (size_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

int decode_tiff_file(const char* path, uint8_t* out, int h, int w) {
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return -1;
  uint32_t width = 0, height = 0;
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &width);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &height);
  if ((int)height != h || (int)width != w) {
    TIFFClose(tif);
    return -2;
  }
  // RGBA raster path: libtiff normalizes every photometric layout
  // (grayscale expands to R=G=B, like cv2.imread's IMREAD_COLOR on the
  // UCSDped2 .tif frames); TOPLEFT orientation = top-down rows
  std::vector<uint32_t> raster((size_t)w * h);
  if (!TIFFReadRGBAImageOriented(tif, width, height, raster.data(),
                                 ORIENTATION_TOPLEFT, 0)) {
    TIFFClose(tif);
    return -3;
  }
  TIFFClose(tif);
  for (int y = 0; y < h; ++y) {
    uint8_t* dst = out + (size_t)y * w * 3;
    const uint32_t* src = raster.data() + (size_t)y * w;
    for (int x = 0; x < w; ++x) {  // ABGR word -> BGR bytes (cv2 convention)
      uint32_t px = src[x];
      dst[x * 3 + 0] = TIFFGetB(px);
      dst[x * 3 + 1] = TIFFGetG(px);
      dst[x * 3 + 2] = TIFFGetR(px);
    }
  }
  return 0;
}

int decode_file(const char* path, uint8_t* out, int h, int w) {
  const char* dot = strrchr(path, '.');
  if (!dot) return -4;
  std::string ext(dot + 1);
  for (auto& c : ext) c = tolower(c);
  if (ext == "jpg" || ext == "jpeg") return decode_jpeg_file(path, out, h, w);
  if (ext == "png") return decode_png_file(path, out, h, w);
  if (ext == "tif" || ext == "tiff") return decode_tiff_file(path, out, h, w);
  return -4;  // unsupported extension — Python falls back to cv2
}

// ---------------------------------------------------------------------------
// Thread-pool batch decode
// ---------------------------------------------------------------------------

struct Pool {
  std::vector<std::thread> threads;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  // current batch (generation-stamped so sleeping workers never miss or
  // double-join a batch)
  const char* const* paths = nullptr;
  uint8_t* out = nullptr;
  int n = 0, h = 0, w = 0;
  uint64_t gen = 0;
  bool batch_done = true;
  std::atomic<int> next{0};
  std::atomic<int> done{0};
  std::atomic<int> errors{0};
  std::atomic<int> in_flight{0};  // workers still inside a batch's loop
  bool stop = false;

  explicit Pool(int n_threads) {
    for (int i = 0; i < n_threads; ++i)
      threads.emplace_back([this] { worker(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_work.notify_all();
    for (auto& t : threads) t.join();
  }

  void worker() {
    uint64_t seen = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || gen != seen; });
        if (stop) return;
        seen = gen;
        in_flight.fetch_add(1);
      }
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= n) break;
        int rc = decode_file(paths[i], out + (size_t)i * h * w * 3, h, w);
        if (rc != 0) errors.fetch_add(1);
        if (done.fetch_add(1) + 1 == n) {
          std::lock_guard<std::mutex> lk(mu);
          batch_done = true;
          // don't notify yet: run() also waits for stragglers to leave
        }
      }
      {
        // a worker may reach here AFTER batch_done (its fetch_add lost the
        // race for the final item); run() must not reset batch state until
        // every worker has left this loop, or the straggler's fetch_add
        // would index the NEXT batch's arrays
        std::lock_guard<std::mutex> lk(mu);
        in_flight.fetch_sub(1);
        cv_done.notify_all();
      }
    }
  }

  int run(const char* const* p, int count, uint8_t* o, int hh, int ww) {
    if (count == 0) return 0;
    {
      std::unique_lock<std::mutex> lk(mu);
      // wait out stragglers from the previous batch before mutating state
      cv_done.wait(lk, [this] { return in_flight.load() == 0; });
      paths = p;
      out = o;
      n = count;
      h = hh;
      w = ww;
      next = 0;
      done = 0;
      errors = 0;
      batch_done = false;
      ++gen;
    }
    cv_work.notify_all();
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_done.wait(lk, [this] {
        return batch_done && in_flight.load() == 0;
      });
    }
    return errors.load();
  }
};

}  // namespace

extern "C" {

// Single-file decode (BGR uint8 into out, which must hold h*w*3 bytes).
int vadio_decode(const char* path, uint8_t* out, int h, int w) {
  return decode_file(path, out, h, w);
}

void* vadio_pool_create(int n_threads) { return new Pool(n_threads); }
void vadio_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Decode n files in parallel into out (n*h*w*3 bytes). Returns the number
// of files that failed to decode (0 == all good).
int vadio_pool_decode_batch(void* pool, const char* const* paths, int n,
                            uint8_t* out, int h, int w) {
  return static_cast<Pool*>(pool)->run(paths, n, out, h, w);
}

// ---------------------------------------------------------------------------
// Background prefetcher: double-buffered chunk pipeline over a file list.
// ---------------------------------------------------------------------------

struct Prefetcher {
  std::vector<std::string> paths;
  Pool pool;
  int chunk, h, w;
  size_t pos = 0;
  std::vector<uint8_t> buf_next;
  std::thread th;
  bool pending = false;
  int pending_count = 0;
  std::atomic<int> pending_errors{0};

  Prefetcher(const char* const* p, int n, int chunk_, int h_, int w_,
             int threads)
      : pool(threads), chunk(chunk_), h(h_), w(w_) {
    paths.reserve(n);
    for (int i = 0; i < n; ++i) paths.emplace_back(p[i]);
    buf_next.resize((size_t)chunk * h * w * 3);
    kick();
  }
  ~Prefetcher() {
    if (th.joinable()) th.join();
  }

  void kick() {
    int count = (int)std::min((size_t)chunk, paths.size() - pos);
    pending_count = count;
    if (count == 0) {
      pending = false;
      return;
    }
    pending = true;
    std::vector<const char*> ptrs(count);
    for (int i = 0; i < count; ++i) ptrs[i] = paths[pos + i].c_str();
    pos += count;
    th = std::thread([this, ptrs = std::move(ptrs), count]() mutable {
      pending_errors.store(
          pool.run(ptrs.data(), count, buf_next.data(), h, w));
    });
  }

  // Wait for the in-flight chunk, copy into out, start the next one.
  // Returns the chunk size, 0 at end of stream, or -errors when any frame
  // in the chunk failed to decode (buffer contents are then unreliable).
  int next(uint8_t* out) {
    if (!pending) return 0;
    th.join();
    int count = pending_count;
    int errs = pending_errors.load();
    memcpy(out, buf_next.data(), (size_t)count * h * w * 3);
    kick();
    return errs > 0 ? -errs : count;
  }
};

void* vadio_prefetcher_create(const char* const* paths, int n, int chunk,
                              int h, int w, int threads) {
  return new Prefetcher(paths, n, chunk, h, w, threads);
}
void vadio_prefetcher_destroy(void* pf) { delete static_cast<Prefetcher*>(pf); }
int vadio_prefetcher_next(void* pf, uint8_t* out) {
  return static_cast<Prefetcher*>(pf)->next(out);
}

}  // extern "C"
