// Native prefetching image loader: thread-pool JPEG/PNG/PNM decode to float32.
//
// The TPU-native runtime counterpart of the reference's synchronous
// cv::imread loop (aerial_mapper_io/src/aerial-mapper-io.cc:207-249): a pool
// of worker threads decodes the sequence ahead of consumption so host decode
// overlaps device compute. Exposed through a minimal C API consumed by
// ctypes (aerial_mapper_tpu/io/native_loader.py).
//
// Gray conversion uses PIL's exact integer ITU-R BT.601 formula
// L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16 so PNG/PNM decodes are
// bit-identical to the PIL fallback; JPEG lumas may differ by ~1 gray level
// (IDCT/chroma-upsample variants between decoders).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

namespace {

inline float rgb_to_gray(unsigned r, unsigned g, unsigned b) {
  return static_cast<float>((r * 19595u + g * 38470u + b * 7471u + 0x8000u) >>
                            16);
}

struct DecodedImage {
  std::vector<float> data;  // h*w or h*w*3
  long h = 0, w = 0;
  int status = 0;  // 0 pending, 1 done, <0 error
};

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

int decode_jpeg(FILE* fp, bool color, DecodedImage* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  // Always decode to RGB, then convert gray with the PIL integer luma, so
  // results are bit-identical to the PIL fallback (libjpeg's own grayscale
  // output is the Y channel, which differs from L-of-clamped-RGB on
  // chroma-saturated pixels).
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const long w = cinfo.output_width, h = cinfo.output_height;
  const int c = cinfo.output_components;  // 3
  out->h = h;
  out->w = w;
  out->data.resize(static_cast<size_t>(h) * w * (color ? 3 : 1));
  std::vector<JSAMPLE> row(static_cast<size_t>(w) * c);
  JSAMPROW rowp = row.data();
  for (long y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    float* dst = out->data.data() + static_cast<size_t>(y) * w * (color ? 3 : 1);
    if (color) {
      for (long x = 0; x < w * 3; ++x) dst[x] = static_cast<float>(row[x]);
    } else {
      for (long x = 0; x < w; ++x)
        dst[x] = rgb_to_gray(row[3 * x], row[3 * x + 1], row[3 * x + 2]);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

int decode_png(FILE* fp, bool color, DecodedImage* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  // normalize everything to 8-bit RGB; interlace handling makes Adam7
  // files decode correctly (npasses row sweeps into a full-image buffer
  // instead of misreading interlace-pass rows as scanlines)
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  const int npasses = png_set_interlace_handling(png);
  png_read_update_info(png, info);
  const long w = png_get_image_width(png, info);
  const long h = png_get_image_height(png, info);
  out->h = h;
  out->w = w;
  out->data.resize(static_cast<size_t>(h) * w * (color ? 3 : 1));
  std::vector<png_byte> rgb(static_cast<size_t>(h) * w * 3);
  for (int pass = 0; pass < npasses; ++pass) {
    for (long y = 0; y < h; ++y) {
      png_read_row(png, rgb.data() + static_cast<size_t>(y) * w * 3,
                   nullptr);
    }
  }
  for (long y = 0; y < h; ++y) {
    const png_byte* row = rgb.data() + static_cast<size_t>(y) * w * 3;
    float* dst = out->data.data() + static_cast<size_t>(y) * w * (color ? 3 : 1);
    if (color) {
      for (long x = 0; x < w * 3; ++x) dst[x] = static_cast<float>(row[x]);
    } else {
      for (long x = 0; x < w; ++x)
        dst[x] = rgb_to_gray(row[3 * x], row[3 * x + 1], row[3 * x + 2]);
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ---------------------------------------------------------------------------
// PNM (P5 gray / P6 rgb, binary, maxval <= 255)
// ---------------------------------------------------------------------------

int pnm_token(FILE* fp, long* value) {
  int ch;
  // skip whitespace and comments
  for (;;) {
    ch = fgetc(fp);
    if (ch == '#') {
      while (ch != '\n' && ch != EOF) ch = fgetc(fp);
    } else if (!isspace(ch)) {
      break;
    }
  }
  long v = 0;
  bool any = false;
  while (ch >= '0' && ch <= '9') {
    v = v * 10 + (ch - '0');
    any = true;
    ch = fgetc(fp);
  }
  if (!any) return -2;
  *value = v;
  return 0;
}

int decode_pnm(FILE* fp, bool color, DecodedImage* out, char kind) {
  long w, h, maxval;
  if (pnm_token(fp, &w) || pnm_token(fp, &h) || pnm_token(fp, &maxval))
    return -2;
  if (maxval <= 0 || maxval > 255) return -2;
  const int src_c = (kind == '6') ? 3 : 1;
  out->h = h;
  out->w = w;
  out->data.resize(static_cast<size_t>(h) * w * (color ? 3 : 1));
  std::vector<unsigned char> row(static_cast<size_t>(w) * src_c);
  for (long y = 0; y < h; ++y) {
    if (fread(row.data(), 1, row.size(), fp) != row.size()) return -2;
    float* dst = out->data.data() + static_cast<size_t>(y) * w * (color ? 3 : 1);
    for (long x = 0; x < w; ++x) {
      unsigned r = row[src_c * x];
      unsigned g = src_c == 3 ? row[src_c * x + 1] : r;
      unsigned b = src_c == 3 ? row[src_c * x + 2] : r;
      if (color) {
        dst[3 * x] = static_cast<float>(r);
        dst[3 * x + 1] = static_cast<float>(g);
        dst[3 * x + 2] = static_cast<float>(b);
      } else {
        dst[x] = src_c == 1 ? static_cast<float>(r) : rgb_to_gray(r, g, b);
      }
    }
  }
  return 0;
}

int decode_file(const std::string& path, bool color, DecodedImage* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return -1;
  unsigned char magic[2] = {0, 0};
  if (fread(magic, 1, 2, fp) != 2) {
    fclose(fp);
    return -2;
  }
  rewind(fp);
  int rc;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(fp, color, out);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    rc = decode_png(fp, color, out);
  } else if (magic[0] == 'P' && (magic[1] == '5' || magic[1] == '6')) {
    fgetc(fp);
    char kind = static_cast<char>(fgetc(fp));
    rc = decode_pnm(fp, color, out, kind);
  } else {
    rc = -3;  // unsupported format
  }
  fclose(fp);
  return rc;
}

// ---------------------------------------------------------------------------
// Loader: thread pool + per-image completion states
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  bool color = false;
  std::vector<DecodedImage> images;
  std::vector<std::thread> workers;
  std::atomic<long> next{0};
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      if (stop.load(std::memory_order_relaxed)) return;
      const long i = next.fetch_add(1);
      if (i >= static_cast<long>(paths.size())) return;
      DecodedImage tmp;
      const int rc = decode_file(paths[i], color, &tmp);
      {
        std::lock_guard<std::mutex> lock(mu);
        images[i].data = std::move(tmp.data);
        images[i].h = tmp.h;
        images[i].w = tmp.w;
        images[i].status = rc == 0 ? 1 : rc;
      }
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* am_loader_create(const char* const* paths, long n, int color,
                       int num_threads) {
  if (n <= 0) return nullptr;
  Loader* ld = new Loader();
  ld->color = color != 0;
  ld->paths.reserve(n);
  for (long i = 0; i < n; ++i) ld->paths.emplace_back(paths[i]);
  ld->images.resize(n);
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  if (num_threads > n) num_threads = static_cast<int>(n);
  for (int t = 0; t < num_threads; ++t)
    ld->workers.emplace_back([ld] { ld->worker(); });
  return ld;
}

// Block until image i is decoded. Returns 0 and fills (h, w) on success,
// <0 on decode failure (-1 open, -2 corrupt, -3 unsupported format).
int am_loader_wait(void* handle, long i, long* h, long* w) {
  Loader* ld = static_cast<Loader*>(handle);
  if (!ld || i < 0 || i >= static_cast<long>(ld->images.size())) return -4;
  std::unique_lock<std::mutex> lock(ld->mu);
  ld->cv.wait(lock, [&] { return ld->images[i].status != 0; });
  if (ld->images[i].status < 0) return ld->images[i].status;
  *h = ld->images[i].h;
  *w = ld->images[i].w;
  return 0;
}

// Copy image i (h*w or h*w*3 floats) into out. Must follow a successful wait.
int am_loader_copy(void* handle, long i, float* out) {
  Loader* ld = static_cast<Loader*>(handle);
  if (!ld || i < 0 || i >= static_cast<long>(ld->images.size())) return -4;
  std::lock_guard<std::mutex> lock(ld->mu);
  if (ld->images[i].status != 1) return -5;
  std::memcpy(out, ld->images[i].data.data(),
              ld->images[i].data.size() * sizeof(float));
  return 0;
}

// Free image i's decode buffer (bounds peak host memory during streaming).
void am_loader_release(void* handle, long i) {
  Loader* ld = static_cast<Loader*>(handle);
  if (!ld || i < 0 || i >= static_cast<long>(ld->images.size())) return;
  std::lock_guard<std::mutex> lock(ld->mu);
  ld->images[i].data.clear();
  ld->images[i].data.shrink_to_fit();
}

void am_loader_destroy(void* handle) {
  Loader* ld = static_cast<Loader*>(handle);
  if (!ld) return;
  ld->stop.store(true);
  ld->next.store(static_cast<long>(ld->paths.size()));
  for (auto& t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
