// Native host-side array kernels for the ingest wire path.
//
// Role: the reference does its quantization in Rust with SIMD intrinsics
// (/root/reference/src/quantization/scalar.rs:9-58 plus the dot-product
// kernels in src/models/dot_product/x86_64.rs); in the TPU build all
// *scoring* runs on the MXU, but the slow-tunnel ingest path quantizes on
// the HOST before shipping 1-byte codes (ops/storage.py `ship_dtype="u8"`),
// and that pass was measured at ~13 s per 131072x768 chunk in numpy on the
// single-core bench host (three full passes + a view). This fused
// single-pass kernel is the native equivalent; it must stay BIT-IDENTICAL
// to the numpy path (differential-tested in tests/test_native_text.py
// style by tests/test_storage.py::TestHostNative).
//
// Build: make -C csrc (g++ -O3 -shared -fPIC, auto-vectorized).

#include <cstdint>
#include <cstring>

extern "C" {

// out[r, c] = int8( floor((clip(x[r,c],lo,hi) - lo) / (hi-lo) * 255) ^ 0x80 )
// for c < d_true; padded lanes (c >= d_true) get code 0 ^ 0x80 = -128.
// Operation order matches the DEVICE kernel (ops/quantize.py quantize_u8,
// jitted with lo/hi traced as f32 scalars): clip first, f32 subtract, f32
// divide by (f32(hi) - f32(lo)), f32 multiply by 255. Truncation toward
// zero == floor on the non-negative range, matching numpy's
// astype(np.uint8) and the device's floor.
void hk_quantize_u8_centered(const float* x, int64_t rows, int64_t cols,
                             int64_t d_true, float lo, float hi,
                             int8_t* out) {
  const float span = (float)((double)hi - (double)lo);
  for (int64_t r = 0; r < rows; ++r) {
    const float* xr = x + r * cols;
    int8_t* orow = out + r * cols;
    int64_t c = 0;
    for (; c < d_true; ++c) {
      float v = xr[c];
      v = v < lo ? lo : (v > hi ? hi : v);
      float s = (v - lo) / span * 255.0f;
      s = s < 0.0f ? 0.0f : (s > 255.0f ? 255.0f : s);
      orow[c] = (int8_t)((uint8_t)s ^ 0x80u);
    }
    for (; c < cols; ++c) orow[c] = (int8_t)0x80u;  // = -128
  }
}

// f32 -> f16 (IEEE binary16, round-to-nearest-even) — the "f16" wire
// format's host pass. Same semantics as numpy astype(np.float16).
static inline uint16_t f32_to_f16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
  uint32_t mant = x & 0x7FFFFFu;
  if (exp >= 31) {  // overflow/inf/nan
    if (((x >> 23) & 0xFF) == 0xFF && mant)
      return (uint16_t)(sign | 0x7E00u);           // nan
    return (uint16_t)(sign | 0x7C00u);             // inf
  }
  if (exp <= 0) {  // subnormal / zero
    if (exp < -10) return (uint16_t)sign;
    mant |= 0x800000u;
    uint32_t shift = (uint32_t)(14 - exp);
    uint32_t half = mant >> shift;
    uint32_t rem = mant & ((1u << shift) - 1u);
    uint32_t halfway = 1u << (shift - 1);
    if (rem > halfway || (rem == halfway && (half & 1u))) half += 1u;
    return (uint16_t)(sign | half);
  }
  uint32_t half = (uint32_t)(exp << 10) | (mant >> 13);
  uint32_t rem = mant & 0x1FFFu;
  if (rem > 0x1000u || (rem == 0x1000u && (half & 1u))) half += 1u;
  return (uint16_t)(sign | half);
}

void hk_f32_to_f16(const float* x, int64_t n, uint16_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = f32_to_f16(x[i]);
}

}  // extern "C"
