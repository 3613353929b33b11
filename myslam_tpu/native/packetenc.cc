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

extern "C" {

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
