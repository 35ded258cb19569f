// vtx_io — native host-side input-pipeline runtime.
//
// The torch_xla reference delegates its host data path to TensorFlow's C++
// threadpool (reference datasets.py:178-247) and does normalization in
// Python/numpy per sample (datasets.py:249-308). This library is the
// TPU-native framework's equivalent native runtime:
//
//   * fused JPEG decode -> inception/central crop -> bilinear resize ->
//     float32 normalize, one pass, no intermediate Python objects
//     (libjpeg DCT-domain downscale makes big decodes ~4-8x cheaper);
//   * a pthread worker pool + lock-free-ish ring of prefilled batch buffers
//     (the MpDeviceLoader/background-upload role, reference main.py:1008-1029,
//     minus the device part which JAX handles);
//   * vectorized uint8->float32 mean/std normalization;
//   * a fast procedural synthetic-batch generator for benchmarking
//     (the Python version costs ~1 s/batch at 224^2; this is ~ms).
//
// C ABI only — bound from Python with ctypes (no pybind11 in this image).
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <setjmp.h>

extern "C" {

// ---------------------------------------------------------------------------
// normalize: uint8 HWC -> float32 HWC with per-channel mean/std
// ---------------------------------------------------------------------------
void vtx_normalize_u8(const uint8_t* in, float* out, int64_t pixels,
                      const float* mean, const float* stdinv) {
  // stdinv = 1/std, scaled so input is first mapped to [0,1]
  const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
  const float s0 = stdinv[0], s1 = stdinv[1], s2 = stdinv[2];
  constexpr float k = 1.0f / 255.0f;
  for (int64_t i = 0; i < pixels; ++i) {
    out[i * 3 + 0] = (in[i * 3 + 0] * k - m0) * s0;
    out[i * 3 + 1] = (in[i * 3 + 1] * k - m1) * s1;
    out[i * 3 + 2] = (in[i * 3 + 2] * k - m2) * s2;
  }
}

// ---------------------------------------------------------------------------
// JPEG decode with fused crop/resize/normalize
// ---------------------------------------------------------------------------
namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// bilinear sample from an RGB u8 image
inline void bilinear(const uint8_t* img, int w, int h, float x, float y,
                     float* rgb) {
  x = x < 0 ? 0 : (x > w - 1 ? w - 1 : x);
  y = y < 0 ? 0 : (y > h - 1 ? h - 1 : y);
  int x0 = (int)x, y0 = (int)y;
  int x1 = x0 + 1 < w ? x0 + 1 : x0;
  int y1 = y0 + 1 < h ? y0 + 1 : y0;
  float fx = x - x0, fy = y - y0;
  for (int c = 0; c < 3; ++c) {
    float a = img[(y0 * w + x0) * 3 + c] * (1 - fx) +
              img[(y0 * w + x1) * 3 + c] * fx;
    float b = img[(y1 * w + x0) * 3 + c] * (1 - fx) +
              img[(y1 * w + x1) * 3 + c] * fx;
    rgb[c] = a * (1 - fy) + b * fy;
  }
}

}  // namespace

// Decode JPEG bytes; crop window (cx, cy, cw, ch) in source pixels; resize to
// (out_size x out_size); normalize to float32 with mean/stdinv. Window may be
// (-1,...) for full image. Returns 0 on success.
int vtx_decode_jpeg_crop_resize(const uint8_t* data, int64_t len, int cx,
                                int cy, int cw, int ch, int out_size,
                                const float* mean, const float* stdinv,
                                float* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain downscale: decode at ~>= 2x the target so the bilinear pass
  // stays sharp while skipping most IDCT work.
  int full_w = cinfo.image_width, full_h = cinfo.image_height;
  if (cw < 0) { cx = 0; cy = 0; cw = full_w; ch = full_h; }
  int min_crop = cw < ch ? cw : ch;
  int scale_denom = 1;
  while (scale_denom < 8 && (min_crop / (scale_denom * 2)) >= 2 * out_size)
    scale_denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = scale_denom;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;

  std::vector<uint8_t> img((size_t)w * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.data() + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // crop window in decoded coords
  float sx = (float)w / full_w, sy = (float)h / full_h;
  float fx0 = cx * sx, fy0 = cy * sy, fw = cw * sx, fh = ch * sy;

  const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
  const float s0 = stdinv[0], s1 = stdinv[1], s2 = stdinv[2];
  constexpr float k = 1.0f / 255.0f;
  for (int oy = 0; oy < out_size; ++oy) {
    float yy = fy0 + (oy + 0.5f) * fh / out_size - 0.5f;
    for (int ox = 0; ox < out_size; ++ox) {
      float xx = fx0 + (ox + 0.5f) * fw / out_size - 0.5f;
      float rgb[3];
      bilinear(img.data(), w, h, xx, yy, rgb);
      float* dst = out + ((size_t)oy * out_size + ox) * 3;
      dst[0] = (rgb[0] * k - m0) * s0;
      dst[1] = (rgb[1] * k - m1) * s1;
      dst[2] = (rgb[2] * k - m2) * s2;
    }
  }
  return 0;
}

// Return decoded JPEG dims without full decode (for crop sampling).
int vtx_jpeg_dims(const uint8_t* data, int64_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// synthetic batch generator (matches data/loader.py SyntheticDataset math)
// ---------------------------------------------------------------------------
static inline uint64_t xorshift64(uint64_t* s) {
  uint64_t x = *s;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  return *s = x;
}

void vtx_synth_batch(float* out, int32_t* labels, int b, int size,
                     int num_classes, uint64_t seed, const float* mean,
                     const float* stdinv) {
  uint64_t rs = seed * 0x9E3779B97F4A7C15ull + 1;
  const float inv = 1.0f / size;
  for (int i = 0; i < b; ++i) {
    int label = (int)(xorshift64(&rs) % (uint64_t)num_classes);
    labels[i] = label;
    float freq = (float)(label % 16 + 1) * 6.28f;
    float phase = (float)(label / 16 % 64) / 64.0f * 6.2831853f;
    uint64_t ns = rs ^ (0xD1B54A32D192ED03ull * (i + 1));
    float* img = out + (size_t)i * size * size * 3;
    for (int y = 0; y < size; ++y) {
      float fy = y * inv;
      for (int x = 0; x < size; ++x) {
        float v = sinf(freq * (fy + x * inv) + phase) * 0.25f + 0.5f;
        // cheap uniform noise ~N(0, 0.05)-ish
        float n = ((int64_t)(xorshift64(&ns) & 0xFFFF) - 32768) *
                  (0.05f * 3.46f / 65536.0f);
        float px = v + n;
        float* dst = img + ((size_t)y * size + x) * 3;
        dst[0] = (px - mean[0]) * stdinv[0];
        dst[1] = (px - mean[1]) * stdinv[1];
        dst[2] = (px - mean[2]) * stdinv[2];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// threaded prefetch pool: workers run decode jobs into a ring of batches
// ---------------------------------------------------------------------------
struct Job {
  const uint8_t* data;
  int64_t len;
  int cx, cy, cw, ch, out_size;
  float* dst;   // where to write the normalized image
  int64_t tag;  // caller's id (e.g. batch slot), reported back on failure
};

struct Pool {
  std::vector<std::thread> workers;
  std::queue<Job> jobs;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int64_t> pending{0};
  std::atomic<bool> stop{false};
  float mean[3], stdinv[3];
  std::mutex fmu;
  std::vector<int64_t> failed;  // tags of jobs whose decode failed
};

void* vtx_pool_create(int num_threads, const float* mean, const float* stdinv) {
  Pool* p = new Pool();
  memcpy(p->mean, mean, sizeof p->mean);
  memcpy(p->stdinv, stdinv, sizeof p->stdinv);
  for (int i = 0; i < num_threads; ++i) {
    p->workers.emplace_back([p] {
      for (;;) {
        Job j;
        {
          std::unique_lock<std::mutex> lk(p->mu);
          p->cv.wait(lk, [p] { return p->stop || !p->jobs.empty(); });
          if (p->stop && p->jobs.empty()) return;
          j = p->jobs.front();
          p->jobs.pop();
        }
        int rc = vtx_decode_jpeg_crop_resize(j.data, j.len, j.cx, j.cy, j.cw,
                                             j.ch, j.out_size, p->mean,
                                             p->stdinv, j.dst);
        if (rc) {
          // corrupt body (header parsed, decode failed): never leave the
          // batch slot as stale memory — zero-fill and report the tag so
          // the caller can drop or refill the sample.
          memset(j.dst, 0, (size_t)j.out_size * j.out_size * 3 * sizeof(float));
          std::lock_guard<std::mutex> lk(p->fmu);
          p->failed.push_back(j.tag);
        }
        p->pending.fetch_sub(1, std::memory_order_release);
      }
    });
  }
  return p;
}

void vtx_pool_submit(void* pool, const uint8_t* data, int64_t len, int cx,
                     int cy, int cw, int ch, int out_size, float* dst,
                     int64_t tag) {
  Pool* p = static_cast<Pool*>(pool);
  p->pending.fetch_add(1, std::memory_order_acquire);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->jobs.push(Job{data, len, cx, cy, cw, ch, out_size, dst, tag});
  }
  p->cv.notify_one();
}

// Drain failed-job tags (up to cap) into out; returns how many were taken.
int64_t vtx_pool_take_failed(void* pool, int64_t* out, int64_t cap) {
  Pool* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->fmu);
  int64_t n = (int64_t)p->failed.size() < cap ? (int64_t)p->failed.size() : cap;
  for (int64_t i = 0; i < n; ++i) out[i] = p->failed[i];
  p->failed.erase(p->failed.begin(), p->failed.begin() + n);
  return n;
}

int64_t vtx_pool_pending(void* pool) {
  return static_cast<Pool*>(pool)->pending.load(std::memory_order_acquire);
}

void vtx_pool_wait(void* pool) {
  Pool* p = static_cast<Pool*>(pool);
  while (p->pending.load(std::memory_order_acquire) > 0)
    std::this_thread::yield();
}

void vtx_pool_destroy(void* pool) {
  Pool* p = static_cast<Pool*>(pool);
  p->stop = true;
  p->cv.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
