// Downlink spectrogram unpack (the host half of the wirepack downlink
// codec; see msv_tpu/parallel/wirepack.py `pack_spec_device` for the
// device half and `unpack_spec_np` for the numpy oracle this must match
// bit-for-bit in the quantized domain).
//
// The stream is b-bit quantized dB values, per-row deltas along frames
// (first frame of each output row absolute), zigzag, packed per
// 1024-value block at that block's max zigzag width.  This pass decodes,
// un-deltas, dequantizes and writes the final (n_frames, n_out) f32 in
// one streaming walk + one cache-blocked transpose — the host core's
// memory bandwidth fluctuates wildly on this VM (CLAUDE.md), so byte
// traffic, not arithmetic, is the budget.

#include <cstdint>
#include <cstring>
#include <cstdlib>

namespace {

constexpr int kBlock = 1024;

// unaligned little-endian 64-bit load (x86/arm64 ok)
static inline uint64_t load_u64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

}  // namespace

extern "C" {

// words: packed u32 stream (little-endian), widths[nb] per-block bit
// widths, out: (n_frames, n_out) f32 row-major.  Returns 0 on success.
int32_t msv_spec_unpack(const uint32_t* words, const int32_t* widths,
                        int64_t nb, int64_t n_out, int64_t f_pad,
                        int64_t n_frames, float lo, float scale,
                        float* out) {
  if (nb * (int64_t)kBlock < n_out * f_pad) return 1;
  // pass 1: decode+cumsum into a (n_out, f_pad) i32 scratch, sequential
  int32_t* q = (int32_t*)std::malloc((size_t)(n_out * f_pad) * 4);
  if (!q) return 2;
  const uint8_t* bytes = (const uint8_t*)words;
  int64_t bit_base = 0;  // blocks are word-aligned; fields bit-addressed
  int64_t idx = 0;       // flat index into (n_out, f_pad)
  const int64_t n_vals = n_out * f_pad;
  int32_t acc = 0;
  for (int64_t b = 0; b < nb; ++b) {
    const int w = widths[b];
    const uint64_t mask = (w == 0) ? 0 : ((~0ULL) >> (64 - w));
    for (int j = 0; j < kBlock; ++j) {
      uint32_t z = 0;
      if (w) {
        const int64_t pos = bit_base + (int64_t)j * w;
        z = (uint32_t)((load_u64(bytes + (pos >> 3)) >> (pos & 7)) & mask);
      }
      // un-zigzag (mod-2^32 safe), then the running row cumsum
      const int32_t d = (int32_t)((z >> 1) ^ (~(z & 1) + 1));
      if (idx < n_vals) {
        if (idx % f_pad == 0) acc = 0;  // first frame of a row is absolute
        acc += d;
        q[idx] = acc;
      }
      ++idx;
    }
    bit_base += (int64_t)kBlock * w;
  }
  // pass 2: blocked transpose + dequant (n_out, f_pad) -> (n_frames, n_out).
  // f32 DIVISION by scale, not multiply-by-reciprocal: the numpy oracle
  // divides, and the bit-exact-vs-oracle contract includes the dequant.
  constexpr int64_t T = 64;
  for (int64_t r0 = 0; r0 < n_out; r0 += T) {
    const int64_t r1 = (r0 + T < n_out) ? r0 + T : n_out;
    for (int64_t c0 = 0; c0 < n_frames; c0 += T) {
      const int64_t c1 = (c0 + T < n_frames) ? c0 + T : n_frames;
      for (int64_t r = r0; r < r1; ++r) {
        const int32_t* qr = q + r * f_pad;
        for (int64_t c = c0; c < c1; ++c) {
          out[c * n_out + r] = (float)qr[c] / scale + lo;
        }
      }
    }
  }
  std::free(q);
  return 0;
}

}  // extern "C"
