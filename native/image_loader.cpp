// Native batch image loader: threaded JPEG/PNG decode + bilinear resize +
// [-1, 1] NCHW float32 normalization.
//
// Role: the reference's visual-slider trainer does PIL decode + resize on
// the Python main thread EVERY step (reference
// trainscripts/imagesliders/train_lora-scale.py:216-220). Here dataset
// images are decoded once into the device-resident bank
// (train/imageslider.build_image_bank); this loader parallelizes that
// decode across host threads (the single-core Python path is the
// bottleneck when banks are built from hundreds of pairs) and is reusable
// as a generic host-side input pipeline primitive.
//
// C ABI:
//   il_load_batch(paths, n_paths, resolution, out)  -> 0 ok / -1 error
//     out: float32 [n, 3, resolution, resolution], [-1, 1]
//   il_error() -> last error string
//
// Decode: libjpeg (baseline+progressive) & libpng (8-bit RGB/RGBA/gray).
// Resize: bilinear to (resolution, resolution) — matching PIL
// Image.resize((r, r)) semantics used by the reference.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

std::mutex g_err_mutex;
std::string g_error;

void set_error(const std::string &e) {
  std::lock_guard<std::mutex> lk(g_err_mutex);
  if (g_error.empty())
    g_error = e;
}

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> pixels; // interleaved
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(((JpegErr *)cinfo->err)->jb, 1);
}

bool decode_jpeg(const uint8_t *data, size_t n, Image &out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.c = 3;
  out.pixels.resize((size_t)out.w * out.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = out.pixels.data() + (size_t)cinfo.output_scanline * out.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const uint8_t *data, size_t n, Image &out) {
  png_image img;
  memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, data, n))
    return false;
  img.format = PNG_FORMAT_RGB;
  out.w = img.width;
  out.h = img.height;
  out.c = 3;
  out.pixels.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out.pixels.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  return true;
}

bool read_file(const char *path, std::vector<uint8_t> &buf) {
  FILE *f = fopen(path, "rb");
  if (!f)
    return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf.resize(n);
  size_t got = fread(buf.data(), 1, n, f);
  fclose(f);
  return got == (size_t)n;
}

// bilinear resize + normalize to [-1,1] CHW
void resize_normalize(const Image &img, int res, float *out) {
  const float sx = (float)img.w / res;
  const float sy = (float)img.h / res;
  for (int y = 0; y < res; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (y0 < 0) y0 = 0;
    int y1 = y0 + 1 < img.h ? y0 + 1 : img.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < res; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (x0 < 0) x0 = 0;
      int x1 = x0 + 1 < img.w ? x0 + 1 : img.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int ch = 0; ch < 3; ch++) {
        float p00 = img.pixels[((size_t)y0 * img.w + x0) * 3 + ch];
        float p01 = img.pixels[((size_t)y0 * img.w + x1) * 3 + ch];
        float p10 = img.pixels[((size_t)y1 * img.w + x0) * 3 + ch];
        float p11 = img.pixels[((size_t)y1 * img.w + x1) * 3 + ch];
        float v = p00 * (1 - wx) * (1 - wy) + p01 * wx * (1 - wy) +
                  p10 * (1 - wx) * wy + p11 * wx * wy;
        out[(size_t)ch * res * res + (size_t)y * res + x] = v / 127.5f - 1.0f;
      }
    }
  }
}

bool load_one(const char *path, int res, float *out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) {
    set_error(std::string("read failed: ") + path);
    return false;
  }
  Image img;
  bool ok = false;
  if (buf.size() > 3 && buf[0] == 0xFF && buf[1] == 0xD8)
    ok = decode_jpeg(buf.data(), buf.size(), img);
  else if (buf.size() > 8 && buf[1] == 'P' && buf[2] == 'N' && buf[3] == 'G')
    ok = decode_png(buf.data(), buf.size(), img);
  else {
    // try both
    ok = decode_jpeg(buf.data(), buf.size(), img) || decode_png(buf.data(), buf.size(), img);
  }
  if (!ok) {
    set_error(std::string("decode failed: ") + path);
    return false;
  }
  resize_normalize(img, res, out);
  return true;
}

} // namespace

extern "C" {

const char *il_error() {
  std::lock_guard<std::mutex> lk(g_err_mutex);
  return g_error.c_str();
}

int il_load_batch(const char **paths, int64_t n, int resolution, float *out) {
  {
    std::lock_guard<std::mutex> lk(g_err_mutex);
    g_error.clear();
  }
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = hw > 0 ? (int)hw : 1;
  if (n_threads > n)
    n_threads = (int)n;
  std::vector<std::thread> workers;
  std::vector<int> ok(n, 1);
  const size_t stride = (size_t)3 * resolution * resolution;
  for (int t = 0; t < n_threads; t++) {
    workers.emplace_back([&, t]() {
      for (int64_t i = t; i < n; i += n_threads)
        ok[i] = load_one(paths[i], resolution, out + (size_t)i * stride) ? 1 : 0;
    });
  }
  for (auto &w : workers)
    w.join();
  for (int64_t i = 0; i < n; i++)
    if (!ok[i])
      return -1;
  return 0;
}

} // extern "C"
