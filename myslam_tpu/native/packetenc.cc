// Native host-side frame-packet encoder.
//
// The SLAM loop ships compact per-frame packets to the device
// (myslam_tpu/utils/datasets.py: build_packet).  Packet construction is
// host CPU work on the critical path of the prefetch thread: color
// uint8 quantization, depth uint16 quantization, and the gather of the
// tracker's random pixel batches.  This translation unit fuses those
// into single passes over the frame (the numpy fallback materializes
// several full-frame temporaries per step).
//
// Replaces (in role) the reference's reliance on torch DataLoader worker
// processes + ATen kernels for host-side frame prep
// (reference src/utils/datasets.py:79-115).
//
// Built on demand by myslam_tpu/native/__init__.py:
//   g++ -O3 -march=native -shared -fPIC packetenc.cc -o libpacketenc.so

#include <cstdint>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// One ray of the procedural benchmark scene (AABB room + spheres); same
// arithmetic as datasets._raycast_analytic so the sparse and dense paths
// agree bit-for-bit with each other (libm sin/cos may differ from
// numpy's vectorized routines by ~1 ulp — harmless for u8 color).
inline void raycast_one(const float* c2w, float px, float py,
                        float fx, float fy, float cx, float cy,
                        const float* room, const float* spheres,
                        int n_spheres, float* color3, float* depth1) {
  const float dir[3] = {(px - cx) / fx, -(py - cy) / fy, -1.0f};
  float d[3], o[3];
  for (int k = 0; k < 3; ++k) {
    d[k] = c2w[k * 4 + 0] * dir[0] + c2w[k * 4 + 1] * dir[1]
         + c2w[k * 4 + 2] * dir[2];
    o[k] = c2w[k * 4 + 3];
  }
  float t_hit = INFINITY;
  for (int k = 0; k < 3; ++k) {
    float t0 = (room[k * 2 + 0] - o[k]) / d[k];
    float t1 = (room[k * 2 + 1] - o[k]) / d[k];
    float tmax = t0 > t1 ? t0 : t1;
    if (tmax < t_hit) t_hit = tmax;
  }
  int obj_id = 0;
  for (int s = 0; s < n_spheres; ++s) {
    const float* sp = spheres + s * 4;
    float oc[3] = {o[0] - sp[0], o[1] - sp[1], o[2] - sp[2]};
    float a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
    float b = 2.0f * (d[0] * oc[0] + d[1] * oc[1] + d[2] * oc[2]);
    float c0 = oc[0] * oc[0] + oc[1] * oc[1] + oc[2] * oc[2]
             - sp[3] * sp[3];
    float disc = b * b - 4.0f * a * c0;
    if (disc > 0.0f) {
      float t_s = (-b - sqrtf(disc)) / (2.0f * a);
      if (t_s > 1e-4f && t_s < t_hit) {
        t_hit = t_s;
        obj_id = s + 1;
      }
    }
  }
  float pts[3] = {o[0] + t_hit * d[0], o[1] + t_hit * d[1],
                  o[2] + t_hit * d[2]};
  const float base_phase[3] = {0.0f, 2.1f, 4.2f};
  const int perm2[3] = {1, 2, 0};
  float freq = 2.0f + 1.5f * (float)obj_id;
  for (int k = 0; k < 3; ++k) {
    float ph = base_phase[k] + 1.3f * (float)obj_id;  // python eval order
    float v = 0.5f + 0.35f * sinf(freq * pts[k] + ph)
            + 0.15f * cosf(3.1f * pts[perm2[k]]);
    color3[k] = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
  }
  *depth1 = t_hit;
}

template <typename Fn>
void parallel_rows(int64_t n, Fn fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = hw ? (int)hw : 2;
  if (n < 4096 || n_threads <= 1) { fn(0, n); return; }
  std::vector<std::thread> ts;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Full-frame procedural raycast: color (H*W*3) f32, depth (H*W) f32.
void render_analytic_frame(const float* c2w, int H, int W,
                           float fx, float fy, float cx, float cy,
                           const float* room, const float* spheres,
                           int n_spheres, float* color, float* depth) {
  parallel_rows((int64_t)H * W, [=](int64_t lo, int64_t hi) {
    for (int64_t p = lo; p < hi; ++p) {
      float py = (float)(p / W), px = (float)(p % W);
      raycast_one(c2w, px, py, fx, fy, cx, cy, room, spheres, n_spheres,
                  color + p * 3, depth + p);
    }
  });
}

// Sparse raycast at m pixel coordinates (i[k], j[k]).
void render_analytic_px(const float* c2w, const int32_t* ii,
                        const int32_t* jj, int64_t m,
                        float fx, float fy, float cx, float cy,
                        const float* room, const float* spheres,
                        int n_spheres, float* color, float* depth) {
  parallel_rows(m, [=](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k)
      raycast_one(c2w, (float)ii[k], (float)jj[k], fx, fy, cx, cy, room,
                  spheres, n_spheres, color + k * 3, depth + k);
  });
}

// color: (H*W*3) float32 in [0,1] -> u8, one pass.
void encode_color_u8(const float* color, int64_t n, uint8_t* out) {
  for (int64_t k = 0; k < n; ++k) {
    float v = color[k] * 255.0f;
    v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
    out[k] = (uint8_t)nearbyintf(v);  // half-to-even, matches np.rint
  }
}

// depth: (H*W) float32 meters -> u16 with scale q; valid (>0) depths
// never quantize to 0 (0 encodes "no depth").  Returns max depth.
float quantize_depth_u16(const float* depth, int64_t n, float q,
                         uint16_t* out) {
  float dmax = 0.0f;
  for (int64_t k = 0; k < n; ++k) {
    float d = depth[k];
    if (d > dmax) dmax = d;
    if (d > 0.0f) {
      float v = nearbyintf(d * q);
      if (v < 1.0f) v = 1.0f;
      if (v > 65535.0f) v = 65535.0f;
      out[k] = (uint16_t)v;
    } else {
      out[k] = 0;
    }
  }
  return dmax;
}

float depth_max(const float* depth, int64_t n) {
  float dmax = 0.0f;
  for (int64_t k = 0; k < n; ++k)
    if (depth[k] > dmax) dmax = depth[k];
  return dmax;
}

// Gather the tracker's pixel batches: for m pixels at (j[k], i[k]),
// write color u8 (m,3) and depth f32 (m,).  Fused single pass.
void gather_pixels(const float* color, const float* depth, int H, int W,
                   const uint16_t* ii, const uint16_t* jj, int64_t m,
                   uint8_t* out_color, float* out_depth,
                   int* has_depthless) {
  int hd = 0;
  for (int64_t k = 0; k < m; ++k) {
    int64_t px = (int64_t)jj[k] * W + ii[k];
    const float* c = color + px * 3;
    for (int t = 0; t < 3; ++t) {
      float v = c[t] * 255.0f;
      v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
      out_color[k * 3 + t] = (uint8_t)nearbyintf(v);
    }
    float d = depth[px];
    out_depth[k] = d;
    if (d <= 0.0f) hd = 1;
  }
  *has_depthless = hd;
}

int has_nonpositive(const float* depth, int64_t n) {
  for (int64_t k = 0; k < n; ++k)
    if (depth[k] <= 0.0f) return 1;
  return 0;
}

}  // extern "C"
