// rsfd_native: host-side native runtime for the TPU face pipeline.
//
// TPU-native counterpart of the reference's native components: the vendored
// CUDA bitmask NMS (reference src/rcnn/nms_kernel.cu + gpu_nms.cpp — never
// built there) becomes a live mask-based greedy NMS here, and the gRPC/OpenCV
// ingest path becomes a multithreaded JPEG decode + letterbox batch loader
// feeding pinned host buffers for device transfer.
//
// Exposed as a C ABI consumed via ctypes (runtime/native.py).  Everything is
// a fresh implementation against the documented semantics:
//   - NMS: stable descending score order, "+1" box areas, suppress when
//     IoU > threshold (keep rule ovr <= thresh), 64-bit suppression masks.
//   - Letterbox: aspect-preserving bilinear (half-pixel) resize, zero pad
//     bottom/right, det_scale = new_h / src_h.
//
// Build: make -C native  (g++ -O3 -fPIC -shared, links libjpeg).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <numeric>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Greedy NMS with 64-bit suppression masks.
//
// dets: (n, 5) [x1, y1, x2, y2, score] rows, any order.
// keep_out: caller-allocated buffer of >= n ints; receives kept row indices
// in descending score order.  Returns the number kept.
// ---------------------------------------------------------------------------
int rsfd_nms(const float* dets, int n, float thresh, int* keep_out) {
  if (n <= 0) return 0;

  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    // NaN-safe strict weak order (a plain `>` with NaN present is UB in
    // std::stable_sort): NaN rows sort LAST, matching the numpy oracle's
    // argsort(-scores) placement (ops/nms.py).
    const float sa = dets[a * 5 + 4], sb = dets[b * 5 + 4];
    const bool na = std::isnan(sa), nb = std::isnan(sb);
    if (na != nb) return nb;
    return sa > sb;
  });

  std::vector<float> x1(n), y1(n), x2(n), y2(n), area(n);
  for (int i = 0; i < n; ++i) {
    const float* r = dets + order[i] * 5;
    x1[i] = r[0];
    y1[i] = r[1];
    x2[i] = r[2];
    y2[i] = r[3];
    area[i] = (r[2] - r[0] + 1.0f) * (r[3] - r[1] + 1.0f);
  }

  const int blocks = (n + 63) / 64;
  std::vector<uint64_t> suppressed(blocks, 0);

  int num_keep = 0;
  for (int i = 0; i < n; ++i) {
    if (suppressed[i >> 6] & (1ULL << (i & 63))) continue;
    keep_out[num_keep++] = order[i];
    // Suppress all later boxes overlapping i beyond the threshold.
    for (int j = i + 1; j < n; ++j) {
      if (suppressed[j >> 6] & (1ULL << (j & 63))) continue;
      const float iw =
          std::min(x2[i], x2[j]) - std::max(x1[i], x1[j]) + 1.0f;
      if (iw <= 0.0f) continue;
      const float ih =
          std::min(y2[i], y2[j]) - std::max(y1[i], y1[j]) + 1.0f;
      if (ih <= 0.0f) continue;
      const float inter = iw * ih;
      const float ovr = inter / (area[i] + area[j] - inter);
      if (ovr > thresh) suppressed[j >> 6] |= (1ULL << (j & 63));
    }
  }
  return num_keep;
}

// ---------------------------------------------------------------------------
// JPEG decode + letterbox.
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode JPEG bytes to BGR u8.  Returns 0 on success.
static int decode_jpeg_bgr(const uint8_t* data, size_t len,
                           std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = JCS_EXT_BGR;  // decode straight to OpenCV order
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  // Header-declared dimensions are attacker-controlled: cap them before
  // allocating (a 65500x65500 header would ask for ~13 GB, and the
  // bad_alloc would escape the extern "C" boundary / std::thread worker
  // and abort the serving process).  16384^2 x 3 = 768 MB worst case.
  if (*w <= 0 || *h <= 0 || *w > 16384 || *h > 16384) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  try {
    out->resize(static_cast<size_t>(*w) * (*h) * 3);
  } catch (const std::bad_alloc&) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  const int stride = *w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Half-pixel bilinear resize of BGR u8 (matches OpenCV INTER_LINEAR).
static void resize_bilinear_u8(const uint8_t* src, int sw, int sh,
                               uint8_t* dst, int dw, int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), sh - 1);
    int y1c = std::min(std::max(y0 + 1, 0), sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), sw - 1);
      int x1c = std::min(std::max(x0 + 1, 0), sw - 1);
      const uint8_t* p00 = src + (static_cast<size_t>(y0c) * sw + x0c) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0c) * sw + x1c) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1c) * sw + x0c) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1c) * sw + x1c) * 3;
      uint8_t* o = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] * (1.0f - wx) + p01[c] * wx;
        float bot = p10[c] * (1.0f - wx) + p11[c] * wx;
        o[c] = static_cast<uint8_t>(std::lround(top * (1.0f - wy) + bot * wy));
      }
    }
  }
}

// Decode JPEG bytes and letterbox into a (dst_h, dst_w, 3) BGR u8 buffer
// (zero-padded bottom/right).  det_scale receives new_h / src_h.
// Returns 0 on success, nonzero on decode failure.
int rsfd_decode_letterbox(const uint8_t* data, size_t len, int dst_w,
                          int dst_h, uint8_t* out, float* det_scale) {
  std::vector<uint8_t> img;
  int sw = 0, sh = 0;
  if (decode_jpeg_bgr(data, len, &img, &sw, &sh)) return 1;

  const float im_ratio = static_cast<float>(sh) / sw;
  const float model_ratio = static_cast<float>(dst_h) / dst_w;
  int new_w, new_h;
  if (im_ratio > model_ratio) {
    new_h = dst_h;
    new_w = static_cast<int>(new_h / im_ratio);
  } else {
    new_w = dst_w;
    new_h = static_cast<int>(new_w * im_ratio);
  }
  // Degenerate aspect ratios truncate to 0 -> det_scale 0 and a float
  // division by zero in the resize; clamp to one row/column instead
  // (ops/image.letterbox_geometry clamps identically).
  if (new_w < 1) new_w = 1;
  if (new_h < 1) new_h = 1;
  *det_scale = static_cast<float>(new_h) / sh;

  std::memset(out, 0, static_cast<size_t>(dst_w) * dst_h * 3);
  std::vector<uint8_t> resized(static_cast<size_t>(new_w) * new_h * 3);
  resize_bilinear_u8(img.data(), sw, sh, resized.data(), new_w, new_h);
  for (int y = 0; y < new_h; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * dst_w * 3,
                resized.data() + static_cast<size_t>(y) * new_w * 3,
                static_cast<size_t>(new_w) * 3);
  }
  return 0;
}

// Multithreaded batch decode+letterbox.
// datas/lens: n encoded images; out: (n, dst_h, dst_w, 3) u8;
// det_scales: (n,); status: (n,) 0 = ok.  num_threads <= 0 -> hardware.
void rsfd_decode_letterbox_batch(const uint8_t** datas, const size_t* lens,
                                 int n, int dst_w, int dst_h, uint8_t* out,
                                 float* det_scales, int* status,
                                 int num_threads) {
  if (n <= 0) return;
  int workers = num_threads > 0
                    ? num_threads
                    : static_cast<int>(std::thread::hardware_concurrency());
  workers = std::max(1, std::min(workers, n));
  std::atomic<int> next(0);
  const size_t frame = static_cast<size_t>(dst_w) * dst_h * 3;

  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = rsfd_decode_letterbox(datas[i], lens[i], dst_w, dst_h,
                                        out + frame * i, det_scales + i);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < workers; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
}

// 2x2 space-to-depth reshuffle: (n, h, w, 3) u8 -> (n, h/2, w/2, 12) u8 with
// output channel k = (bi*2 + bj)*3 + c (bi/bj = row/col within the 2x2
// block, c = source channel order).  This is the MXU-ready stem layout the
// serving path feeds to space-to-depth backbones (ops/image.py
// s2d_layout_host is the numpy reference; pipeline/detection.py
// make_batched_fn(pre_s2d=True) consumes it).  Done here because the
// reshuffle is memcpy-speed on host but costs ~1.4 ms of relayout copies
// per R50 batch-8 step if left to the TPU.  Threaded over images.
void rsfd_s2d_batch(const uint8_t* src, int n, int h, int w, uint8_t* dst,
                    int num_threads) {
  if (n <= 0 || h % 2 || w % 2) return;
  int workers = num_threads > 0
                    ? num_threads
                    : static_cast<int>(std::thread::hardware_concurrency());
  workers = std::max(1, std::min(workers, n));
  const int h2 = h / 2, w2 = w / 2;
  const size_t in_frame = static_cast<size_t>(h) * w * 3;
  const size_t out_frame = static_cast<size_t>(h2) * w2 * 12;
  std::atomic<int> next(0);
  auto work = [&]() {
    for (;;) {
      int img = next.fetch_add(1);
      if (img >= n) return;
      const uint8_t* s = src + in_frame * img;
      uint8_t* d = dst + out_frame * img;
      for (int i = 0; i < h2; ++i) {
        const uint8_t* r0 = s + static_cast<size_t>(2 * i) * w * 3;
        const uint8_t* r1 = r0 + static_cast<size_t>(w) * 3;
        uint8_t* o = d + static_cast<size_t>(i) * w2 * 12;
        for (int j = 0; j < w2; ++j) {
          std::memcpy(o, r0 + j * 6, 6);      // (bi=0, bj=0..1)
          std::memcpy(o + 6, r1 + j * 6, 6);  // (bi=1, bj=0..1)
          o += 12;
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < workers; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
}

// 4x4 space-to-depth reshuffle: (n, h, w, 3) u8 -> (n, h/4, w/4, 48) u8 with
// output channel (ry*4 + rx)*3 + c (ry/rx = row/col within the 4x4 block).
// This is the dense-stem layout (ops/stem_s4d.py: the whole R50 stem chain as
// one MXU-shaped 3x3x48->256 conv; ops/image.s4d_layout_host is the numpy
// reference, detection.make_batched_fn(stem="s4d") consumes it).
void rsfd_s4d_batch(const uint8_t* src, int n, int h, int w, uint8_t* dst,
                    int num_threads) {
  if (n <= 0 || h % 4 || w % 4) return;
  int workers = num_threads > 0
                    ? num_threads
                    : static_cast<int>(std::thread::hardware_concurrency());
  workers = std::max(1, std::min(workers, n));
  const int h4 = h / 4, w4 = w / 4;
  const size_t in_frame = static_cast<size_t>(h) * w * 3;
  const size_t out_frame = static_cast<size_t>(h4) * w4 * 48;
  std::atomic<int> next(0);
  auto work = [&]() {
    for (;;) {
      int img = next.fetch_add(1);
      if (img >= n) return;
      const uint8_t* s = src + in_frame * img;
      uint8_t* d = dst + out_frame * img;
      for (int i = 0; i < h4; ++i) {
        const uint8_t* rows[4];
        for (int ry = 0; ry < 4; ++ry)
          rows[ry] = s + static_cast<size_t>(4 * i + ry) * w * 3;
        uint8_t* o = d + static_cast<size_t>(i) * w4 * 48;
        for (int j = 0; j < w4; ++j) {
          for (int ry = 0; ry < 4; ++ry)
            std::memcpy(o + ry * 12, rows[ry] + j * 12, 12);
          o += 48;
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < workers; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
}

// Version tag for the ctypes wrapper to sanity-check the ABI.
int rsfd_abi_version() { return 4; }

}  // extern "C"
