// csu_dataio — native host-side data loader for cswin_simam_unet_tpu.
//
// TPU-native replacement for the reference's native data path (OpenCV JPEG
// decode + bilinear resize invoked from torch DataLoader worker processes,
// train_unet_segmentation.py:127-172,464-478).  Provides:
//   * csu_decode_resize : JPEG/whatever-libjpeg-decodes -> RGB/gray uint8,
//     bilinear resize with cv2 INTER_LINEAR half-pixel semantics.
//   * csu_load_batch    : thread-pooled batch assembly straight into a
//     caller-provided pinned buffer (one H2D transfer per batch), with the
//     reference's missing/unreadable-mask -> zero-mask fallback.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: native/build.sh (g++ -O3 -shared -ljpeg).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto *err = reinterpret_cast<JpegErrorMgr *>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes into an owned buffer. Returns true on success and fills
// width/height; output is RGB (3ch) or grayscale (1ch).
bool decode_jpeg(const uint8_t *data, size_t len, int want_gray,
                 std::vector<uint8_t> &out, int &w, int &h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t *>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = want_gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  const int ch = cinfo.output_components;
  out.resize(static_cast<size_t>(w) * h * ch);
  const size_t stride = static_cast<size_t>(w) * ch;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t *row = out.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resize, cv2 INTER_LINEAR half-pixel convention:
//   src = (dst + 0.5) * (in / out) - 0.5, edge-clamped.
void resize_bilinear(const uint8_t *src, int ih, int iw, int ch, uint8_t *dst,
                     int oh, int ow) {
  if (ih == oh && iw == ow) {
    std::memcpy(dst, src, static_cast<size_t>(ih) * iw * ch);
    return;
  }
  const float sy = static_cast<float>(ih) / oh;
  const float sx = static_cast<float>(iw) / ow;
  std::vector<int> x0s(ow), x1s(ow);
  std::vector<float> wxs(ow);
  for (int x = 0; x < ow; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    fx = std::min(std::max(fx, 0.0f), static_cast<float>(iw - 1));
    int x0 = static_cast<int>(fx);
    x0s[x] = x0;
    x1s[x] = std::min(x0 + 1, iw - 1);
    wxs[x] = fx - x0;
  }
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::min(std::max(fy, 0.0f), static_cast<float>(ih - 1));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, ih - 1);
    float wy = fy - y0;
    const uint8_t *r0 = src + static_cast<size_t>(y0) * iw * ch;
    const uint8_t *r1 = src + static_cast<size_t>(y1) * iw * ch;
    uint8_t *out_row = dst + static_cast<size_t>(y) * ow * ch;
    for (int x = 0; x < ow; ++x) {
      const int x0 = x0s[x] * ch, x1 = x1s[x] * ch;
      const float wx = wxs[x];
      for (int c = 0; c < ch; ++c) {
        const float top = r0[x0 + c] * (1 - wx) + r0[x1 + c] * wx;
        const float bot = r1[x0 + c] * (1 - wx) + r1[x1 + c] * wx;
        const float v = top * (1 - wy) + bot * wy;
        out_row[x * ch + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

bool read_file(const char *path, std::vector<uint8_t> &buf) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  buf.resize(static_cast<size_t>(n));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return got == buf.size();
}

bool decode_resize_into(const uint8_t *data, size_t len, int oh, int ow,
                        int gray, uint8_t *out) {
  std::vector<uint8_t> raw;
  int w = 0, h = 0;
  if (!decode_jpeg(data, len, gray, raw, w, h)) return false;
  resize_bilinear(raw.data(), h, w, gray ? 1 : 3, out, oh, ow);
  return true;
}

}  // namespace

extern "C" {

// Decode encoded image bytes and resize to (out_h, out_w).
// `out` must hold out_h*out_w*(gray?1:3) bytes. Returns 0 on success.
int csu_decode_resize(const uint8_t *data, size_t len, int out_h, int out_w,
                      int gray, uint8_t *out) {
  return decode_resize_into(data, len, out_h, out_w, gray, out) ? 0 : 1;
}

// Load a batch of (image, mask) pairs in parallel.
//   img_paths / mask_paths : n C-strings (mask_paths[i] may be NULL)
//   images : n * out_h * out_w * 3 bytes (RGB)
//   masks  : n * out_h * out_w bytes (grayscale; zero-filled on missing or
//            undecodable mask — the reference's fallback, ref :145-154)
//   status : n bytes; per sample: 0 ok, 1 bad image, 2 zero-filled mask
// Returns the number of failed IMAGES (masks never fail the batch).
int csu_load_batch(const char **img_paths, const char **mask_paths, int n,
                   int out_h, int out_w, int threads, uint8_t *images,
                   uint8_t *masks, uint8_t *status) {
  const size_t img_sz = static_cast<size_t>(out_h) * out_w * 3;
  const size_t mask_sz = static_cast<size_t>(out_h) * out_w;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    std::vector<uint8_t> buf;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = 0;
      if (!read_file(img_paths[i], buf) ||
          !decode_resize_into(buf.data(), buf.size(), out_h, out_w, 0,
                              images + i * img_sz)) {
        std::memset(images + i * img_sz, 0, img_sz);
        status[i] = 1;
        failures.fetch_add(1);
      }
      uint8_t *mask_out = masks + i * mask_sz;
      bool mask_ok = false;
      if (mask_paths[i] != nullptr && read_file(mask_paths[i], buf)) {
        mask_ok = decode_resize_into(buf.data(), buf.size(), out_h, out_w, 1,
                                     mask_out);
      }
      if (!mask_ok) {
        std::memset(mask_out, 0, mask_sz);
        if (status[i] == 0) status[i] = 2;
      }
    }
  };
  int t = std::max(1, threads);
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto &th : pool) th.join();
  return failures.load();
}

}  // extern "C"
