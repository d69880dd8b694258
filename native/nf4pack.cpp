// Host-side NF4 blockwise quantizer — the native runtime piece of the
// checkpoint converter (quantize-on-load, SURVEY.md N4).
//
// Implements exactly the storage format of qlora_tpu.quant.blockwise:
//   * blocks of `block` elements along K per output column:
//       absmax[K/block, N], codes = nearest NF4 entry of w/absmax
//   * global split-half packing: byte(r, n) = code(r, n) | code(K/2+r, n)<<4
//   * column-aligned double quantization of absmax: int8 with one f32 scale
//     per meta-block of 256 scales along K, plus a global f32 mean offset.
//
// Large imports (65B = hundreds of tensors) are CPU-bound in pure
// numpy/jax; this translation unit is compiled with -O3 -march=native and
// threads across output columns.  Python binding via ctypes (no pybind11
// in the image).

#include <cstdint>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

// NF4 codebook (see qlora_tpu/quant/codebooks.py; pinned + tested there).
const float kNf4[16] = {
    -1.0f, -0.6961928009986877f, -0.5250730514526367f, -0.39491748809814453f,
    -0.28444138169288635f, -0.18477343022823334f, -0.09105003625154495f, 0.0f,
    0.07958029955625534f, 0.16093020141124725f, 0.24611230194568634f,
    0.33791524171829224f, 0.4407098352909088f, 0.5626170039176941f,
    0.7229568362236023f, 1.0f};

const float kFp4[16] = {
    -1.0f, -2.f/3.f, -0.5f, -1.f/3.f, -0.25f, -1.f/6.f, -1.f/12.f, -0.0f,
    0.0f, 1.f/12.f, 1.f/6.f, 0.25f, 1.f/3.f, 0.5f, 2.f/3.f, 1.0f};

inline uint8_t encode(float v, const float* mid) {
  // nearest sorted-codebook entry via 15 midpoint comparisons
  uint8_t idx = 0;
  for (int i = 0; i < 15; ++i) idx += (v > mid[i]);
  return idx;
}

}  // namespace

extern "C" {

// w: row-major [K, N] f32.  Outputs:
//   packed  [K/2, N] u8, absmax [K/block, N] f32.
// Returns 0 on success, nonzero on invalid arguments.
int nf4_quantize(const float* w, int64_t K, int64_t N, int block,
                 int fp4, uint8_t* packed, float* absmax, int n_threads) {
  if (K % (2 * block) != 0 || block <= 0) return 1;
  const float* code = fp4 ? kFp4 : kNf4;
  float mid[15];
  for (int i = 0; i < 15; ++i) mid[i] = 0.5f * (code[i] + code[i + 1]);

  const int64_t nblocks = K / block;
  const int64_t half = K / 2;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min<int>(n_threads, 64));

  std::vector<uint8_t> codes;  // per-thread scratch handled inside lambda

  auto work = [&](int64_t n0, int64_t n1) {
    std::vector<uint8_t> col(K);
    for (int64_t n = n0; n < n1; ++n) {
      // per-block absmax + encode for this column
      for (int64_t b = 0; b < nblocks; ++b) {
        float am = 0.f;
        const int64_t r0 = b * block;
        for (int64_t r = r0; r < r0 + block; ++r)
          am = std::max(am, std::fabs(w[r * N + n]));
        absmax[b * N + n] = am;
        const float inv = am > 0.f ? 1.0f / am : 0.f;
        for (int64_t r = r0; r < r0 + block; ++r)
          col[r] = encode(w[r * N + n] * inv, mid);
      }
      for (int64_t r = 0; r < half; ++r)
        packed[r * N + n] = (uint8_t)(col[r] | (col[half + r] << 4));
    }
  };

  std::vector<std::thread> threads;
  const int64_t per = (N + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t n0 = t * per, n1 = std::min<int64_t>(N, n0 + per);
    if (n0 >= n1) break;
    threads.emplace_back(work, n0, n1);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// Double-quantize absmax [R, N] into int8 q [R, N] + f32 scales
// [ceil(R/256), N] + global mean offset (written to *offset).
int nf4_double_quant_absmax(const float* absmax, int64_t R, int64_t N,
                            int8_t* q, float* scales, float* offset) {
  const int MB = 256;
  const int64_t nmb = (R + MB - 1) / MB;
  double sum = 0.0;
  for (int64_t i = 0; i < R * N; ++i) sum += absmax[i];
  const float off = (float)(sum / (double)(R * N));
  *offset = off;
  for (int64_t mb = 0; mb < nmb; ++mb) {
    const int64_t r0 = mb * MB, r1 = std::min<int64_t>(R, r0 + MB);
    for (int64_t n = 0; n < N; ++n) {
      float s = 0.f;
      for (int64_t r = r0; r < r1; ++r)
        s = std::max(s, std::fabs(absmax[r * N + n] - off));
      scales[mb * N + n] = s;
      const float inv = s > 0.f ? 127.0f / s : 0.f;
      for (int64_t r = r0; r < r1; ++r) {
        float v = std::nearbyint((absmax[r * N + n] - off) * inv);
        v = std::max(-127.f, std::min(127.f, v));
        q[r * N + n] = (int8_t)v;
      }
    }
  }
  return 0;
}

}  // extern "C"
