// gom_loader: native end-to-end frame loading for gomavatar_tpu.
//
// One C call decodes an image + mask from disk (libpng / libjpeg) and runs
// the fused undistort/resize/composite pipeline (gom_host.cpp) without ever
// touching the Python heap or the GIL — the TPU-era replacement for the
// reference's PIL + cv2 multi-pass host loop (dataset/train.py:125-172).
//
// Build: make -C native   (links against system libpng16 / libjpeg)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>

#include <png.h>
#include <jpeglib.h>

extern "C" void undistort_resize_composite(const uint8_t*, const uint8_t*, int,
                                           int, const double*, const double*,
                                           int, const float*, float*, float*,
                                           int, int);

namespace {

bool has_suffix(const char* path, const char* suf) {
  const size_t lp = std::strlen(path), ls = std::strlen(suf);
  return lp >= ls && std::strcmp(path + lp - ls, suf) == 0;
}

// Decode PNG via the libpng simplified API into RGB8 or G8.
uint8_t* decode_png(const char* path, int want_channels, int* H, int* W) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return nullptr;
  image.format = (want_channels == 3) ? PNG_FORMAT_RGB : PNG_FORMAT_GRAY;
  const size_t stride = PNG_IMAGE_ROW_STRIDE(image);
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(PNG_IMAGE_SIZE(image)));
  if (!buf) {
    png_image_free(&image);
    return nullptr;
  }
  if (!png_image_finish_read(&image, nullptr, buf, int(stride), nullptr)) {
    std::free(buf);
    png_image_free(&image);
    return nullptr;
  }
  *H = int(image.height);
  *W = int(image.width);
  return buf;
}

// Decode JPEG via libjpeg into RGB8 or G8.
uint8_t* decode_jpeg(const char* path, int want_channels, int* H, int* W) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return nullptr;
  }
  cinfo.out_color_space = (want_channels == 3) ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height, w = cinfo.output_width;
  const int c = cinfo.output_components;
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(size_t(h) * w * c));
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + size_t(cinfo.output_scanline) * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  *H = h;
  *W = w;
  return buf;
}

uint8_t* decode_any(const char* path, int want_channels, int* H, int* W) {
  if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg"))
    return decode_jpeg(path, want_channels, H, W);
  return decode_png(path, want_channels, H, W);
}

}  // namespace

extern "C" {

// Decode image (RGB) + mask (gray) from disk and run the fused
// undistort/resize/composite pass.  Returns 0 on success, negative on error.
// Output buffers must be (outH, outW, 3) f32 and (outH, outW) f32.
int load_frame(const char* img_path, const char* mask_path, const double* K,
               const double* D, int n_d, const float* bgcolor, float* out_img,
               float* out_mask, int outH, int outW) {
  int H = 0, W = 0, mH = 0, mW = 0;
  uint8_t* img = decode_any(img_path, 3, &H, &W);
  if (!img) return -1;
  uint8_t* mask = decode_any(mask_path, 1, &mH, &mW);
  if (!mask) {
    std::free(img);
    return -2;
  }
  if (mH != H || mW != W) {
    std::free(img);
    std::free(mask);
    return -3;
  }
  undistort_resize_composite(img, mask, H, W, K, D, n_d, bgcolor, out_img,
                             out_mask, outH, outW);
  std::free(img);
  std::free(mask);
  return 0;
}

// Probe an image's dimensions without a full decode (PNG) or with header
// read only (JPEG).  Returns 0 on success.
int probe_image(const char* path, int* H, int* W) {
  if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg")) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
      jpeg_destroy_decompress(&cinfo);
      std::fclose(f);
      return -2;
    }
    *H = cinfo.image_height;
    *W = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 0;
  }
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return -1;
  *H = int(image.height);
  *W = int(image.width);
  png_image_free(&image);
  return 0;
}

}  // extern "C"
