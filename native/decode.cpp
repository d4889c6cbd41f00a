// Native data-loading core: threaded JPEG/PNG decode + PIL-compatible
// bicubic resampling.
//
// TPU-native counterpart of the reference's host-side decode path
// (PIL Image.open().resize() inside 9 torch DataLoader workers —
// /root/reference/datasets/ava_frame.py:192-195).  The hot loop of a video
// dataset is frame decode, so it lives in C++: libjpeg/libpng decode, a
// bit-exact reimplementation of Pillow's convolution resampler (fixed-point
// 8.22 coefficients, horizontal-then-vertical uint8 passes, BICUBIC a=-0.5),
// and a pthread pool filling caller-provided batch buffers.
//
// C ABI (used from Python via ctypes — datasets/native_decode.py):
//   cq_decode_resize(path, out_w, out_h, out_rgb)   -> 0 on success
//   cq_decode_batch(paths, n, out_w, out_h, out, n_threads)
//
// Build: make -C native   (produces libcqvad_decode.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------------
// Pillow-compatible resampling (mirrors Pillow's Resample.c int path)
// ---------------------------------------------------------------------------

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow PRECISION_BITS

static inline uint8_t clip8(int in) {
  if (in >= (1 << kPrecisionBits << 8)) return 255;
  if (in <= 0) return 0;
  return (uint8_t)(in >> kPrecisionBits);
}

static double bicubic_filter(double x) {
  constexpr double a = -0.5;
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1;
  if (x < 2.0) return (((x - 5) * x + 8) * x - 4) * a;
  return 0.0;
}

// Precompute normalized fixed-point coefficients for one axis.
static int precompute_coeffs(int in_size, int out_size, int* bounds,
                             std::vector<std::vector<int>>& kk,
                             int* ksize_out) {
  constexpr double support0 = 2.0;  // bicubic
  double scale = (double)in_size / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = support0 * filterscale;
  int ksize = (int)ceil(support) * 2 + 1;
  *ksize_out = ksize;
  std::vector<double> w(ksize);
  kk.assign(out_size, std::vector<int>(ksize, 0));
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; x++) {
      double v = bicubic_filter((x + xmin - center + 0.5) * ss);
      w[x] = v;
      ww += v;
    }
    for (int x = 0; x < xmax; x++) {
      if (ww != 0.0) w[x] /= ww;
      kk[xx][x] = (int)(w[x] < 0 ? w[x] * (1 << kPrecisionBits) - 0.5
                                 : w[x] * (1 << kPrecisionBits) + 0.5);
    }
    bounds[xx * 2 + 0] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  return 0;
}

// Horizontal pass: [h, in_w, 3] -> [h, out_w, 3], uint8.
static void resample_horiz(const uint8_t* in, int h, int in_w, uint8_t* out,
                           int out_w, const int* bounds,
                           const std::vector<std::vector<int>>& kk) {
  for (int yy = 0; yy < h; yy++) {
    const uint8_t* row = in + (size_t)yy * in_w * 3;
    uint8_t* orow = out + (size_t)yy * out_w * 3;
    for (int xx = 0; xx < out_w; xx++) {
      int xmin = bounds[xx * 2 + 0];
      int xmax = bounds[xx * 2 + 1];
      const std::vector<int>& k = kk[xx];
      for (int c = 0; c < 3; c++) {
        int ss = 1 << (kPrecisionBits - 1);
        for (int x = 0; x < xmax; x++)
          ss += row[(xmin + x) * 3 + c] * k[x];
        orow[xx * 3 + c] = clip8(ss);
      }
    }
  }
}

// Vertical pass: [in_h, w, 3] -> [out_h, w, 3], uint8.
static void resample_vert(const uint8_t* in, int in_h, int w, uint8_t* out,
                          int out_h, const int* bounds,
                          const std::vector<std::vector<int>>& kk) {
  for (int yy = 0; yy < out_h; yy++) {
    int ymin = bounds[yy * 2 + 0];
    int ymax = bounds[yy * 2 + 1];
    const std::vector<int>& k = kk[yy];
    uint8_t* orow = out + (size_t)yy * w * 3;
    for (int xx = 0; xx < w * 3; xx++) {
      int ss = 1 << (kPrecisionBits - 1);
      for (int y = 0; y < ymax; y++)
        ss += in[(size_t)(ymin + y) * w * 3 + xx] * k[y];
      orow[xx] = clip8(ss);
    }
  }
}

// Full resize [in_h, in_w, 3] -> [out_h, out_w, 3] (Pillow order:
// horizontal into a temp image, then vertical).
static void pil_resize(const uint8_t* in, int in_h, int in_w, uint8_t* out,
                       int out_h, int out_w) {
  if (in_h == out_h && in_w == out_w) {
    memcpy(out, in, (size_t)in_h * in_w * 3);
    return;
  }
  std::vector<int> hbounds(out_w * 2), vbounds(out_h * 2);
  std::vector<std::vector<int>> hk, vk;
  int ks;
  precompute_coeffs(in_w, out_w, hbounds.data(), hk, &ks);
  precompute_coeffs(in_h, out_h, vbounds.data(), vk, &ks);
  std::vector<uint8_t> tmp((size_t)in_h * out_w * 3);
  resample_horiz(in, in_h, in_w, tmp.data(), out_w, hbounds.data(), hk);
  resample_vert(tmp.data(), in_h, out_w, out, out_h, vbounds.data(), vk);
}

// ---------------------------------------------------------------------------
// JPEG / PNG decode
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = (JpegErr*)cinfo->err;
  longjmp(err->jb, 1);
}

static int decode_jpeg_file(FILE* f, std::vector<uint8_t>& rgb, int* w,
                            int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb.resize((size_t)(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = rgb.data() + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

static int decode_png_file(FILE* f, std::vector<uint8_t>& rgb, int* w,
                           int* h) {
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
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);
  rgb.resize((size_t)(*w) * (*h) * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; y++) rows[y] = rgb.data() + (size_t)y * (*w) * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

static int decode_file(const char* path, std::vector<uint8_t>& rgb, int* w,
                       int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  int rc = -3;
  if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg_file(f, rgb, w, h);
  } else if (n >= 8 && magic[0] == 0x89 && magic[1] == 'P') {
    rc = decode_png_file(f, rgb, w, h);
  }
  fclose(f);
  return rc;
}

}  // namespace

extern "C" {

// Decode one image and resize to (out_h, out_w); out_rgb must hold
// out_h*out_w*3 bytes.  Returns 0 on success.
int cq_decode_resize(const char* path, int out_w, int out_h,
                     uint8_t* out_rgb) {
  std::vector<uint8_t> rgb;
  int w, h;
  int rc = decode_file(path, rgb, &w, &h);
  if (rc != 0) return rc;
  pil_resize(rgb.data(), h, w, out_rgb, out_h, out_w);
  return 0;
}

// Decode n images in a thread pool into out (n * out_h * out_w * 3 bytes,
// C-contiguous).  Returns 0 if all succeeded, else the first error code.
int cq_decode_batch(const char** paths, int n, int out_w, int out_h,
                    uint8_t* out, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  size_t frame_bytes = (size_t)out_w * out_h * 3;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = cq_decode_resize(paths[i], out_w, out_h, out + frame_bytes * i);
      if (rc != 0) {
        int expected = 0;
        err.compare_exchange_strong(expected, rc);
      }
    }
  };
  int nt = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return err.load();
}

// Resize-only entry (uint8 HWC RGB), exposed for tests.
int cq_resize(const uint8_t* in, int in_h, int in_w, uint8_t* out, int out_h,
              int out_w) {
  pil_resize(in, in_h, in_w, out, out_h, out_w);
  return 0;
}

}  // extern "C"
