// Native data-loader hot path: JPEG decode + Pillow-compatible resize.
//
// The reference's input pipeline leans on torch DataLoader worker
// *processes* (reference train.py:554-563) to hide host-side decode
// cost; our TPU pipeline uses threads (data/loader.py) because the hot
// loop releases the GIL.  This translation unit is that hot loop: decode
// a JPEG with libjpeg and resize with the same triangle (bilinear)
// filter Pillow uses, in one C++ call with no intermediate Python
// objects.  Exposed through ctypes (lavt_rs_tpu/native/__init__.py);
// everything degrades to PIL when the shared object is missing.
//
// The resize implements Pillow's `precompute_coeffs` + two-pass
// separable resampling (triangle filter, support 1.0, scaled for
// downsampling = antialiased) in double precision.  Pillow evaluates the
// same weights but accumulates in fixed point, so outputs can differ by
// at most 1 uint8 LSB — asserted in tests/test_native_loader.py; 1 LSB
// (0.0039) is below bf16 resolution at the post-normalize magnitudes the
// model sees, so routing through either path is model-equivalent.

#include <cstddef>  // size_t — jpeglib.h assumes stdio.h came first
#include <cstdio>   // FILE

#include <jpeglib.h>

#include <csetjmp>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Pillow-style separable resample coefficients for one axis
// (triangle filter == Image.BILINEAR).
void triangle_coeffs(int in_size, int out_size, std::vector<int>& bounds,
                     std::vector<double>& kk, int& ksize) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle support = 1.0
  ksize = static_cast<int>(ceil(support)) * 2 + 1;
  kk.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  bounds.assign(static_cast<size_t>(out_size) * 2, 0);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    double ww = 0.0;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &kk[static_cast<size_t>(xx) * ksize];
    for (int x = 0; x < xmax; ++x) {
      double w = (x + xmin - center + 0.5) * ss;
      w = w < 0 ? -w : w;           // triangle filter
      w = w < 1.0 ? 1.0 - w : 0.0;  // f(x) = max(1 - |x|, 0)
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
}

inline uint8_t clip8(float v) {
  const int r = static_cast<int>(v + 0.5f);  // v >= 0 after clamp below
  if (r < 0) return 0;
  if (r > 255) return 255;
  return static_cast<uint8_t>(r);
}

// Shared two-pass separable resample, float accumulation.  The passes are
// laid out to stream: horizontal per-row, vertical accumulating whole
// rows (out_w*3 contiguous floats) so -O3 vectorizes the inner loops.
void resample_rgb(const uint8_t* src, int in_h, int in_w, int out_h,
                  int out_w, uint8_t* out) {
  std::vector<int> hb, vb;
  std::vector<double> hk, vk;
  int hks, vks;
  triangle_coeffs(in_w, out_w, hb, hk, hks);
  triangle_coeffs(in_h, out_h, vb, vk, vks);

  const size_t W3 = static_cast<size_t>(out_w) * 3;
  std::vector<float> tmp(static_cast<size_t>(in_h) * W3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * in_w * 3;
    float* dst = tmp.data() + static_cast<size_t>(y) * W3;
    for (int xx = 0; xx < out_w; ++xx) {
      const int xmin = hb[xx * 2], xmax = hb[xx * 2 + 1];
      const double* k = &hk[static_cast<size_t>(xx) * hks];
      float r = 0, g = 0, b = 0;
      const uint8_t* p = srow + static_cast<size_t>(xmin) * 3;
      for (int x = 0; x < xmax; ++x, p += 3) {
        const float w = static_cast<float>(k[x]);
        r += p[0] * w;
        g += p[1] * w;
        b += p[2] * w;
      }
      dst[xx * 3 + 0] = r;
      dst[xx * 3 + 1] = g;
      dst[xx * 3 + 2] = b;
    }
  }

  std::vector<float> acc(W3);
  for (int yy = 0; yy < out_h; ++yy) {
    const int ymin = vb[yy * 2], ymax = vb[yy * 2 + 1];
    const double* k = &vk[static_cast<size_t>(yy) * vks];
    float* a = acc.data();
    {
      const float w0 = static_cast<float>(k[0]);
      const float* row = tmp.data() + static_cast<size_t>(ymin) * W3;
      for (size_t i = 0; i < W3; ++i) a[i] = w0 * row[i];
    }
    for (int y = 1; y < ymax; ++y) {
      const float w = static_cast<float>(k[y]);
      const float* row = tmp.data() + static_cast<size_t>(ymin + y) * W3;
      for (size_t i = 0; i < W3; ++i) a[i] += w * row[i];
    }
    uint8_t* dst = out + static_cast<size_t>(yy) * W3;
    for (size_t i = 0; i < W3; ++i) dst[i] = clip8(a[i]);
  }
}

}  // namespace

extern "C" {

// Decode `size` bytes of JPEG into RGB and resize to (out_h, out_w).
// `out` must hold out_h * out_w * 3 bytes.  Returns 0 on success,
// negative on decode error.
int lavt_decode_resize_jpeg(const uint8_t* data, long size, int out_h,
                            int out_w, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int in_w = cinfo.output_width;
  const int in_h = cinfo.output_height;
  std::vector<uint8_t> rgb(static_cast<size_t>(in_w) * in_h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) *
                                    in_w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // identity fast path
  if (in_w == out_w && in_h == out_h) {
    memcpy(out, rgb.data(), rgb.size());
    return 0;
  }

  resample_rgb(rgb.data(), in_h, in_w, out_h, out_w, out);
  return 0;
}

// Resize an already-decoded uint8 HWC image with the same Pillow-style
// triangle filter (for the video path, where cv2 owns the mp4 decode).
int lavt_resize_rgb(const uint8_t* src, int in_h, int in_w, int out_h,
                    int out_w, uint8_t* out) {
  if (in_w == out_w && in_h == out_h) {
    memcpy(out, src, static_cast<size_t>(in_h) * in_w * 3);
    return 0;
  }
  resample_rgb(src, in_h, in_w, out_h, out_w, out);
  return 0;
}

// Dimensions of a JPEG without a full decode (header parse only).
int lavt_jpeg_dims(const uint8_t* data, long size, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
