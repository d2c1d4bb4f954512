// ChronoEdit-TPU native data-path: multithreaded JPEG decode + resize/crop.
//
// Fills the role the reference delegates to decord/PyAV/ffmpeg + torchvision
// transforms (SURVEY §2.9 "decord/PyAV/ffmpeg — host-side video decode"):
// the host-side hot loop of the input pipeline. Python's PIL path is
// GIL-bound; this library decodes a batch of JPEG files on a std::thread
// pool and writes normalized float32 CHW tensors straight into a
// caller-provided buffer (zero Python-side copies).
//
// C API (ctypes-friendly):
//   int ce_decode_jpeg_batch(const char** paths, int n,
//                            int target_h, int target_w,
//                            float* out,       // (n, 3, target_h, target_w)
//                            int num_threads); // 0 => hardware_concurrency
// Per image: decode -> bilinear resize (cover) -> center crop -> [-1, 1].
// Returns 0 on success, else the number of failed images (their slots are
// zero-filled).
//
// Build: make -C native  (g++ -O3 -shared -fPIC image_loader.cpp -ljpeg)

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG (file or memory buffer) to an interleaved RGB8 buffer. When
// the target is much smaller than the source, decode at reduced resolution
// via libjpeg's DCT-domain scaling (scale_num/8) — the classic decode-side
// speed trick. Returns false on error.
bool decode_jpeg_src(bool from_mem, const char* path,
                     const unsigned char* buf, unsigned long buf_len,
                     std::vector<unsigned char>& rgb, int& w, int& h,
                     int target_h, int target_w) {
  FILE* f = nullptr;
  if (!from_mem) {
    f = std::fopen(path, "rb");
    if (!f) return false;
  }

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    if (f) std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  if (from_mem) {
    jpeg_mem_src(&cinfo, buf, buf_len);
  } else {
    jpeg_stdio_src(&cinfo, f);
  }
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (target_h > 0 && target_w > 0) {
    // pick the smallest scale (n/8, n in 1..8) whose output still covers
    // ~1.15x the target on both axes (headroom for the bilinear pass)
    for (int num = 1; num <= 8; ++num) {
      double sw = cinfo.image_width * num / 8.0;
      double sh = cinfo.image_height * num / 8.0;
      double cover = std::fmax(static_cast<double>(target_w) / sw,
                               static_cast<double>(target_h) / sh);
      if (cover <= 1.0 / 1.15 || num == 8) {
        cinfo.scale_num = num;
        cinfo.scale_denom = 8;
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);

  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (f) std::fclose(f);
  return true;
}

bool decode_jpeg(const char* path, std::vector<unsigned char>& rgb, int& w,
                 int& h, int target_h, int target_w) {
  return decode_jpeg_src(false, path, nullptr, 0, rgb, w, h, target_h,
                         target_w);
}

// Separable two-pass bilinear resize-to-cover + center-crop + normalize into
// (3, th, tw) planar floats. Horizontal weights are precomputed once; the
// horizontal pass runs on interleaved RGB rows (cache-friendly), the
// vertical pass blends two intermediate rows per output row.
void resize_crop_normalize(const std::vector<unsigned char>& rgb, int w, int h,
                           int th, int tw, float* out,
                           std::vector<float>& scratch) {
  float scale = std::fmax(static_cast<float>(tw) / w, static_cast<float>(th) / h);
  float x_off = (w - tw / scale) * 0.5f, y_off = (h - th / scale) * 0.5f;

  // precompute horizontal taps
  std::vector<int> x0(tw), x1(tw);
  std::vector<float> fx(tw);
  for (int x = 0; x < tw; ++x) {
    float sx = x_off + (x + 0.5f) / scale - 0.5f;
    sx = std::fmin(std::fmax(sx, 0.0f), static_cast<float>(w - 1));
    x0[x] = static_cast<int>(sx);
    x1[x] = x0[x] + 1 < w ? x0[x] + 1 : w - 1;
    fx[x] = sx - x0[x];
  }

  // intermediate: two horizontally-resized source rows (tw, 3) each
  scratch.resize(static_cast<size_t>(tw) * 3 * 2);
  float* rows[2] = {scratch.data(), scratch.data() + static_cast<size_t>(tw) * 3};
  int cached[2] = {-1, -1};

  auto hresize = [&](int sy, float* dst) {
    const unsigned char* src = rgb.data() + static_cast<size_t>(sy) * w * 3;
    for (int x = 0; x < tw; ++x) {
      const unsigned char* a = src + x0[x] * 3;
      const unsigned char* b = src + x1[x] * 3;
      float f = fx[x];
      dst[x * 3 + 0] = a[0] + (b[0] - a[0]) * f;
      dst[x * 3 + 1] = a[1] + (b[1] - a[1]) * f;
      dst[x * 3 + 2] = a[2] + (b[2] - a[2]) * f;
    }
  };

  float* r = out + 0 * static_cast<size_t>(th) * tw;
  float* g = out + 1 * static_cast<size_t>(th) * tw;
  float* b = out + 2 * static_cast<size_t>(th) * tw;
  for (int y = 0; y < th; ++y) {
    float sy = y_off + (y + 0.5f) / scale - 0.5f;
    sy = std::fmin(std::fmax(sy, 0.0f), static_cast<float>(h - 1));
    int y0 = static_cast<int>(sy);
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float fy = sy - y0;
    for (int s = 0; s < 2; ++s) {
      int want = s == 0 ? y0 : y1;
      if (cached[s] != want) {
        hresize(want, rows[s]);
        cached[s] = want;
      }
    }
    const float* top = rows[0];
    const float* bot = rows[1];
    size_t o = static_cast<size_t>(y) * tw;
    for (int x = 0; x < tw; ++x) {
      float pr = top[x * 3 + 0] + (bot[x * 3 + 0] - top[x * 3 + 0]) * fy;
      float pg = top[x * 3 + 1] + (bot[x * 3 + 1] - top[x * 3 + 1]) * fy;
      float pb = top[x * 3 + 2] + (bot[x * 3 + 2] - top[x * 3 + 2]) * fy;
      r[o + x] = pr / 127.5f - 1.0f;
      g[o + x] = pg / 127.5f - 1.0f;
      b[o + x] = pb / 127.5f - 1.0f;
    }
  }
}

}  // namespace

extern "C" {

int ce_decode_jpeg_batch(const char** paths, int n, int target_h, int target_w,
                         float* out, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  std::atomic<int> next(0), failures(0);
  const size_t stride = static_cast<size_t>(3) * target_h * target_w;

  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    std::vector<float> scratch;
    int w = 0, h = 0;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      float* dst = out + stride * i;
      if (decode_jpeg(paths[i], rgb, w, h, target_h, target_w)) {
        resize_crop_normalize(rgb, w, h, target_h, target_w, dst, scratch);
      } else {
        std::memset(dst, 0, stride * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };

  int t = num_threads < n ? num_threads : n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// In-memory variant for tar-shard members and other non-file sources
// (webdataset decode path): same thread pool + resize/crop/normalize, with
// jpeg_mem_src instead of stdio.
int ce_decode_jpeg_buffers(const unsigned char** bufs,
                           const long* sizes, int n, int target_h,
                           int target_w, float* out, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  std::atomic<int> next(0), failures(0);
  const size_t stride = static_cast<size_t>(3) * target_h * target_w;

  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    std::vector<float> scratch;
    int w = 0, h = 0;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      float* dst = out + stride * i;
      if (decode_jpeg_src(true, nullptr, bufs[i],
                          static_cast<unsigned long>(sizes[i]), rgb, w, h,
                          target_h, target_w)) {
        resize_crop_normalize(rgb, w, h, target_h, target_w, dst, scratch);
      } else {
        std::memset(dst, 0, stride * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };

  int t = num_threads < n ? num_threads : n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Library self-description for the Python wrapper's sanity check.
int ce_loader_abi_version() { return 2; }

}  // extern "C"
