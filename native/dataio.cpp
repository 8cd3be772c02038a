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
  // IFAST integer IDCT: ~10-15% faster decode than the ISLOW default for
  // a bounded pixel difference (+-1..3/sample typ.) — within the loader's
  // cv2-parity band (tests/test_native.py: mean < 2, p99 <= 6), and the
  // step that finally puts the native loader ahead of cv2's bundled
  // libjpeg-turbo 3.x on decode-bound content (VERDICT r03 #8).  The
  // default Python cv2 path remains the bit-exact reference pipeline.
  cinfo.dct_method = JDCT_IFAST;
  jpeg_start_decompress(&cinfo);
  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  const int ch = cinfo.output_components;
  out.resize(static_cast<size_t>(w) * h * ch);
  const size_t stride = static_cast<size_t>(w) * ch;
  // hand libjpeg a window of row pointers per call (it reads up to
  // rec_outbuf_height rows at once) instead of one call per scanline
  JSAMPROW rows[8];
  while (cinfo.output_scanline < cinfo.output_height) {
    const unsigned remaining = cinfo.output_height - cinfo.output_scanline;
    const unsigned want = std::min(remaining, 8u);
    for (unsigned i = 0; i < want; ++i)
      rows[i] = out.data() +
          (static_cast<size_t>(cinfo.output_scanline) + i) * stride;
    jpeg_read_scanlines(&cinfo, rows, want);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resize, cv2 INTER_LINEAR half-pixel convention:
//   src = (dst + 0.5) * (in / out) - 0.5, edge-clamped.
//
// Separable fixed-point two-pass (the cv2 scheme): the horizontal pass
// interpolates each NEEDED source row once into an int32 row buffer
// (cached — consecutive output rows share source rows), and the vertical
// pass is one contiguous multiply-add over ow*ch elements that the
// compiler auto-vectorises.  The original per-output-pixel scalar float
// loop was the reason the native loader lost to cv2's SIMD resize
// (BASELINE.md round-3 loader table, VERDICT r03 #8).
constexpr int kFix = 11;              // weight fixed-point bits (cv2 uses 11)
constexpr int kHalf = 1 << (2 * kFix - 1);

void hinterp_row(const uint8_t *row, int ch, int ow, const int *x0s,
                 const int *x1s, const int *wxs, int32_t *out) {
  for (int x = 0; x < ow; ++x) {
    const int x0 = x0s[x], x1 = x1s[x], w = wxs[x];
    const int iw0 = (1 << kFix) - w;
    for (int c = 0; c < ch; ++c)
      out[x * ch + c] = row[x0 + c] * iw0 + row[x1 + c] * w;
  }
}

void resize_bilinear(const uint8_t *src, int ih, int iw, int ch, uint8_t *dst,
                     int oh, int ow) {
  if (ih == oh && iw == ow) {
    std::memcpy(dst, src, static_cast<size_t>(ih) * iw * ch);
    return;
  }
  const double sy = static_cast<double>(ih) / oh;
  const double sx = static_cast<double>(iw) / ow;
  std::vector<int> x0s(ow), x1s(ow), wxs(ow);
  for (int x = 0; x < ow; ++x) {
    double fx = (x + 0.5) * sx - 0.5;
    fx = std::min(std::max(fx, 0.0), static_cast<double>(iw - 1));
    const int x0 = static_cast<int>(fx);
    x0s[x] = x0 * ch;
    x1s[x] = std::min(x0 + 1, iw - 1) * ch;
    wxs[x] = static_cast<int>((fx - x0) * (1 << kFix) + 0.5);
  }
  const int row_elems = ow * ch;
  std::vector<int32_t> h0(row_elems), h1(row_elems);
  int cached0 = -1, cached1 = -1;
  for (int y = 0; y < oh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    fy = std::min(std::max(fy, 0.0), static_cast<double>(ih - 1));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, ih - 1);
    const int wy = static_cast<int>((fy - y0) * (1 << kFix) + 0.5);
    // roll the cache forward: h1 frequently becomes the next h0
    if (y0 != cached0) {
      if (y0 == cached1) { h0.swap(h1); cached0 = y0; cached1 = -1; }
      else {
        hinterp_row(src + static_cast<size_t>(y0) * iw * ch, ch, ow,
                    x0s.data(), x1s.data(), wxs.data(), h0.data());
        cached0 = y0;
        cached1 = -1;
      }
    }
    if (y1 != cached1) {
      if (y1 == y0) { std::memcpy(h1.data(), h0.data(),
                                  row_elems * sizeof(int32_t)); }
      else hinterp_row(src + static_cast<size_t>(y1) * iw * ch, ch, ow,
                       x0s.data(), x1s.data(), wxs.data(), h1.data());
      cached1 = y1;
    }
    const int iwy = (1 << kFix) - wy;
    const int32_t *a = h0.data();
    const int32_t *b = h1.data();
    uint8_t *out_row = dst + static_cast<size_t>(y) * row_elems;
    for (int i = 0; i < row_elems; ++i)  // contiguous: auto-vectorises
      out_row[i] = static_cast<uint8_t>(
          (a[i] * iwy + b[i] * wy + kHalf) >> (2 * kFix));
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
