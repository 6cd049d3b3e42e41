// vcg_host: native host-side data loading for the TPU feed path.
//
// The reference fans frame decoding out to DataLoader worker *processes*
// (num_workers=4..16) and shells out to ffmpeg for extraction
// (extract_video_to_frames.py:28). Here a C++ thread pool decodes JPEG
// frames (libjpeg) straight into caller-provided uint8 NHWC buffers —
// no per-item Python, no pickling, no extra copies — feeding the
// double-buffered device_put pipeline.
//
// Exposed C ABI (ctypes):
//   vcg_pool_create(n_threads) -> handle
//   vcg_pool_destroy(handle)
//   vcg_decode_batch(handle, paths, n, out, hw)  // blocking fan-out
//   vcg_decode_file(path, out, hw)               // single image
//   vcg_normalize_f32(src_u8, dst_f32, n, mean3, std3)  // fused affine
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC, links -ljpeg -lpthread).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// minimal thread pool
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) with error recovery
// ---------------------------------------------------------------------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void JpegErrExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// nearest-neighbor resize row mapping (decode-time scaling handles most of
// the work; this covers residual mismatches)
void ResizeNearest(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                   int dw) {
  for (int y = 0; y < dh; ++y) {
    const int sy = static_cast<int>(static_cast<int64_t>(y) * sh / dh);
    for (int x = 0; x < dw; ++x) {
      const int sx = static_cast<int>(static_cast<int64_t>(x) * sw / dw);
      std::memcpy(dst + (y * dw + x) * 3, src + (sy * sw + sx) * 3, 3);
    }
  }
}

// Decode one JPEG file into out[hw*hw*3] uint8 RGB. Returns 0 on success;
// on any failure the buffer is zero-filled (missing frames are zero-padded
// by the Python layer too) and a nonzero code returned.
int DecodeFile(const char* path, uint8_t* out, int hw) {
  std::memset(out, 0, static_cast<size_t>(hw) * hw * 3);
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = JpegErrExit;
  std::vector<uint8_t> tmp;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // decode-time downscale: pick the smallest scale >= target
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 8; denom >= 1; denom /= 2) {
    if (static_cast<int>(cinfo.image_width) / denom >= hw &&
        static_cast<int>(cinfo.image_height) / denom >= hw) {
      cinfo.scale_denom = denom;
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  const int sw = cinfo.output_width;
  const int sh = cinfo.output_height;
  tmp.resize(static_cast<size_t>(sw) * sh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = tmp.data() + static_cast<size_t>(cinfo.output_scanline) * sw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  if (sw == hw && sh == hw) {
    std::memcpy(out, tmp.data(), static_cast<size_t>(hw) * hw * 3);
  } else {
    ResizeNearest(tmp.data(), sh, sw, out, hw, hw);
  }
  return 0;
}

}  // namespace

extern "C" {

void* vcg_pool_create(int n_threads) {
  return new ThreadPool(n_threads > 0 ? n_threads : 1);
}

void vcg_pool_destroy(void* pool) { delete static_cast<ThreadPool*>(pool); }

int vcg_decode_file(const char* path, uint8_t* out, int hw) {
  return DecodeFile(path, out, hw);
}

// Decode n files concurrently into out[n, hw, hw, 3]. Returns the number
// of failed decodes (their slots are zero-filled).
int vcg_decode_batch(void* pool, const char** paths, int n, uint8_t* out,
                     int hw) {
  auto* tp = static_cast<ThreadPool*>(pool);
  std::atomic<int> failures(0);
  std::atomic<int> done(0);
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = static_cast<size_t>(hw) * hw * 3;
  for (int i = 0; i < n; ++i) {
    tp->Submit([&, i] {
      if (DecodeFile(paths[i], out + stride * i, hw) != 0) {
        failures.fetch_add(1);
      }
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

// 4x4 space-to-depth reorder of one decoded frame: the TPU stem kernel
// consumes frames as [hw/4, hw/4, 48] (channel = di*12 + dj*3 + c), and
// emitting that order at decode time is a fixed index permutation —
// effectively free inside the thread pool vs a 2.2ms on-device transpose
// per 512-frame batch (PERF.md round 2).
static void Space2Depth4(const uint8_t* in, uint8_t* out, int hw) {
  const int n4 = hw / 4;
  for (int bi = 0; bi < n4; ++bi) {
    for (int di = 0; di < 4; ++di) {
      const uint8_t* row = in + (static_cast<size_t>(bi) * 4 + di) * hw * 3;
      uint8_t* orow = out + (static_cast<size_t>(bi) * n4) * 48 + di * 12;
      for (int bj = 0; bj < n4; ++bj) {
        std::memcpy(orow + static_cast<size_t>(bj) * 48, row + bj * 12, 12);
      }
    }
  }
}

// Decode n files concurrently into space-to-depth uint8 [n, hw/4, hw/4, 48]
// (hw must be a multiple of 4). Returns the number of failed decodes.
int vcg_decode_batch_s2d(void* pool, const char** paths, int n, uint8_t* out,
                         int hw) {
  auto* tp = static_cast<ThreadPool*>(pool);
  std::atomic<int> failures(0);
  std::atomic<int> done(0);
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = static_cast<size_t>(hw) * hw * 3;
  for (int i = 0; i < n; ++i) {
    tp->Submit([&, i] {
      std::vector<uint8_t> frame(stride);
      if (DecodeFile(paths[i], frame.data(), hw) != 0) {
        failures.fetch_add(1);
        std::memset(out + stride * i, 0, stride);
      } else {
        Space2Depth4(frame.data(), out + stride * i, hw);
      }
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

// Fused uint8 -> normalized float32: dst = src/255*  (1/std) - mean/std.
void vcg_normalize_f32(const uint8_t* src, float* dst, int64_t n_pixels,
                       const float* mean3, const float* std3) {
  float scale[3], bias[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = 1.0f / (255.0f * std3[c]);
    bias[c] = -mean3[c] / std3[c];
  }
  for (int64_t i = 0; i < n_pixels; ++i) {
    const int64_t base = i * 3;
    dst[base + 0] = src[base + 0] * scale[0] + bias[0];
    dst[base + 1] = src[base + 1] * scale[1] + bias[1];
    dst[base + 2] = src[base + 2] * scale[2] + bias[2];
  }
}

}  // extern "C"
