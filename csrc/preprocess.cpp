// Native host-side image preprocessing for the simpb-tpu input pipeline.
//
// The reference delegates its hot per-pixel host work (resize / crop /
// flip / normalise, pipelines/augment.py:86-132 + transform.py:229-265)
// to PIL / torch's C cores inside fork'd DataLoader workers. This module
// is the equivalent native core for the JAX pipeline: one C++ call takes
// a raw HWC uint8 camera image and produces the normalised float32
// network input, fusing resize (bilinear), crop, horizontal flip and
// mean/std normalisation in a single pass over output pixels.
//
// Built with plain g++ via simpb_tpu/data/native_preprocess.py (ctypes
// binding — no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <ctime>

extern "C" {

// Fault injection for the preemption watchdog (utils/watchdog.py):
// block the calling thread in native code for `seconds`, RESTARTING
// after EINTR — exactly the signal-opaque native wait the round-4 soak
// observed in a device-RPC stall (PERF.md "Soak re-examination").
// Python's C-level signal handler still fires (sets the pending flag +
// writes the wakeup fd) but the bytecode loop — and therefore the
// Python-level SIGTERM handler — cannot run until this returns.
// Test-only entry point; never called on the production path.
void native_hang(double seconds) {
  struct timespec deadline;
  clock_gettime(CLOCK_MONOTONIC, &deadline);
  deadline.tv_sec += (time_t)seconds;
  deadline.tv_nsec += (long)((seconds - (time_t)seconds) * 1e9);
  if (deadline.tv_nsec >= 1000000000L) {
    deadline.tv_sec += 1;
    deadline.tv_nsec -= 1000000000L;
  }
  for (;;) {
    struct timespec now;
    clock_gettime(CLOCK_MONOTONIC, &now);
    if (now.tv_sec > deadline.tv_sec ||
        (now.tv_sec == deadline.tv_sec &&
         now.tv_nsec >= deadline.tv_nsec)) {
      return;
    }
    struct timespec chunk = {0, 50000000L};  // 50 ms, EINTR-restarted
    nanosleep(&chunk, nullptr);
  }
}

// in:  [in_h, in_w, 3] uint8 (RGB)
// out: [out_h, out_w, 3] float32, normalised
// resize: scale factor applied to the source before cropping
// crop_x / crop_y: top-left corner of the crop in resized coords
// flip: mirror horizontally after crop
// mean/std: per-channel normalisation
void resize_crop_flip_normalize(
    const uint8_t* in, int in_h, int in_w,
    float* out, int out_h, int out_w,
    float resize, int crop_x, int crop_y, int flip,
    const float* mean, const float* std_) {
  const float inv_scale = 1.0f / resize;
  const float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
  for (int oy = 0; oy < out_h; ++oy) {
    // position in the resized image -> source coords (align_corners=False)
    const float ry = (oy + crop_y + 0.5f) * inv_scale - 0.5f;
    int y0 = (int)std::floor(ry);
    const float ly = ry - y0;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y0 > in_h - 1) y0 = in_h - 1;
    if (y1 < 0) y1 = 0;
    if (y1 > in_h - 1) y1 = in_h - 1;
    for (int ox = 0; ox < out_w; ++ox) {
      const int sx = flip ? (out_w - 1 - ox) : ox;
      const float rx = (sx + crop_x + 0.5f) * inv_scale - 0.5f;
      int x0 = (int)std::floor(rx);
      const float lx = rx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) x0 = 0;
      if (x0 > in_w - 1) x0 = in_w - 1;
      if (x1 < 0) x1 = 0;
      if (x1 > in_w - 1) x1 = in_w - 1;
      const uint8_t* p00 = in + (y0 * in_w + x0) * 3;
      const uint8_t* p01 = in + (y0 * in_w + x1) * 3;
      const uint8_t* p10 = in + (y1 * in_w + x0) * 3;
      const uint8_t* p11 = in + (y1 * in_w + x1) * 3;
      float* o = out + (oy * out_w + ox) * 3;
      const float w00 = (1 - ly) * (1 - lx), w01 = (1 - ly) * lx;
      const float w10 = ly * (1 - lx), w11 = ly * lx;
      for (int ch = 0; ch < 3; ++ch) {
        const float v = w00 * p00[ch] + w01 * p01[ch] + w10 * p10[ch] +
                        w11 * p11[ch];
        o[ch] = (v - mean[ch]) * inv_std[ch];
      }
    }
  }
}

// Sparse depth-map rendering (MultiScaleDepthMapGenerator equivalent,
// reference pipelines/transform.py:34-81): project pre-transformed
// points (u, v, z) into a -1-initialised depth map, nearest-point-wins
// via descending-depth paint order handled by the caller's sort.
void render_depth_map(
    const float* uvz, int n_points,
    float* depth_map, int h, int w, int stride,
    float min_depth, float max_depth) {
  for (int i = 0; i < n_points; ++i) {
    const float u = uvz[i * 3 + 0];
    const float v = uvz[i * 3 + 1];
    float z = uvz[i * 3 + 2];
    if (z < min_depth) continue;
    const int px = (int)std::lround(u);
    const int py = (int)std::lround(v);
    if (px < 0 || py < 0 || px >= w * stride || py >= h * stride) continue;
    if (z > max_depth) z = max_depth;
    depth_map[(py / stride) * w + (px / stride)] = z;
  }
}

}  // extern "C"
