// Native batch image loader: threaded file read + PNG decode + bilinear
// resize into a caller-provided contiguous batch buffer.
//
// TPU-native replacement for the reference's torch DataLoader worker
// processes (src/open_clip_train/data.py) on the host side: one C++ thread
// pool fills [N, H, W, C] uint8 without the GIL; the device-side fused
// augmentation (mrclip_tpu/ops/image_ops.py) takes it from there.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" int mrclip_png_decode(const uint8_t* data, long size, uint8_t* out,
                                 int out_channels, int* width, int* height);

namespace {

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf->resize(size);
  size_t got = std::fread(buf->data(), 1, size, f);
  std::fclose(f);
  return got == (size_t)size;
}

// Bilinear resize uint8 HWC -> out_h x out_w (shortest-edge + center-crop
// semantics are applied by the caller via src window offsets).
void resize_bilinear(const uint8_t* src, int sh, int sw, int c, uint8_t* dst,
                     int dh, int dw) {
  const float ys = (float)sh / dh;
  const float xs = (float)sw / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * ys - 0.5f;
    int y0 = fy < 0 ? 0 : (int)fy;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * xs - 0.5f;
      int x0 = fx < 0 ? 0 : (int)fx;
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int ch = 0; ch < c; ++ch) {
        float top = src[(y0 * sw + x0) * c + ch] * (1 - wx) + src[(y0 * sw + x1) * c + ch] * wx;
        float bot = src[(y1 * sw + x0) * c + ch] * (1 - wx) + src[(y1 * sw + x1) * c + ch] * wx;
        dst[(y * dw + x) * c + ch] = (uint8_t)(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` PNG files into out[N, out_h, out_w, channels] uint8, resizing
// each image (full-image squash; the center-crop eval path and the fused
// train augmentation both start from a fixed-size canvas). `status[i]` gets
// 0 on success, the decoder's error code otherwise (row left zeroed).
void mrclip_load_batch(const char** paths, int n, uint8_t* out, int out_h,
                       int out_w, int channels, int num_threads, int* status) {
  std::atomic<int> next{0};
  const size_t out_stride = (size_t)out_h * out_w * channels;

  auto worker = [&]() {
    std::vector<uint8_t> file_buf;
    std::vector<uint8_t> pixels;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = -100;
      uint8_t* dst = out + (size_t)i * out_stride;
      std::memset(dst, 0, out_stride);
      if (!read_file(paths[i], &file_buf)) continue;

      // Worst-case RGB of a large slice; grown on demand.
      int w = 0, h = 0;
      pixels.resize((size_t)4096 * 4096 * channels);
      int rc = mrclip_png_decode(file_buf.data(), (long)file_buf.size(),
                                 pixels.data(), channels, &w, &h);
      status[i] = rc;
      if (rc != 0) continue;
      resize_bilinear(pixels.data(), h, w, channels, dst, out_h, out_w);
    }
  };

  int t = num_threads > 0 ? num_threads : (int)std::thread::hardware_concurrency();
  if (t > n) t = n;
  if (t <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int k = 0; k < t; ++k) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
