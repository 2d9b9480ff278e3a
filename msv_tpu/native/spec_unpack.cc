// Downlink spectrogram unpack (the host half of the wirepack downlink
// codec; see msv_tpu/parallel/wirepack.py `pack_spec_device` for the
// device half and `unpack_spec_np` for the numpy oracle this must match
// bit-for-bit in the quantized domain).
//
// The stream is b-bit quantized dB values (b <= 16), per-row deltas along
// frames (first frame of each output row absolute), zigzag, packed per
// 1024-value block at that block's max zigzag width.
//
// Entry points so the Python side can PIPELINE the relay fetch with
// decoding (the fetch is network wait; decode is CPU — overlapping them
// costs nothing even on this single-core host) and fan the decode out
// over host cores (each output row's first frame is absolute, so any
// row boundary is a safe decode entry point — the cumsum chain never
// crosses rows, making the decode embarrassingly parallel by rows):
//   msv_spec_decode_range   — decode value indices [v0, v1) into a u16
//                             quantized scratch, carrying (col, acc)
//   msv_spec_decode_blocks  — block-granular wrapper (legacy ABI)
//   msv_spec_dequant_transpose_range — transpose + f32 dequant of output
//                             frames [c_lo, c_hi) (disjoint writes, so
//                             also thread-safe by frame ranges)
//   msv_spec_dequant_transpose — full-range wrapper
// plus msv_spec_unpack, the one-shot wrapper.  Threading itself lives in
// Python (threading.Thread over these GIL-releasing calls).
//
// Scratch is uint16 (quantized values are <= 2^16-1 by construction):
// the host memory bandwidth fluctuates 30x between windows on this VM
// (CLAUDE.md), so byte traffic, not arithmetic, is the budget.

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

// Decode value indices [v0, v1) of the packed stream into q (uint16,
// flat (n_out, f_pad) row-major).  ``words`` points at the FULL stream
// base (caller guarantees bytes for these values plus 8 spare are
// present).  ``start_word`` is the per-block word offset (prefix sum of
// widths*32).  carry[0] = col within the current output row, carry[1] =
// running acc; both must be 0 when v0 is a row boundary (multiple of
// f_pad) and preserved between consecutive calls otherwise.
int32_t msv_spec_decode_range(const uint32_t* words, const int32_t* widths,
                              const int64_t* start_word, int64_t v0,
                              int64_t v1, int64_t n_vals, int64_t f_pad,
                              int64_t* carry, uint16_t* q) {
  const uint8_t* bytes = (const uint8_t*)words;
  int64_t col = carry[0];
  int32_t acc = (int32_t)carry[1];
  int64_t idx = v0;
  while (idx < v1) {
    const int64_t b = idx / kBlock;
    const int64_t brem = v1 - b * kBlock;
    const int jend = (int)(brem < kBlock ? brem : kBlock);
    const int w = widths[b];
    const uint64_t mask = (w == 0) ? 0 : ((~0ULL) >> (64 - w));
    const int64_t bit_base = start_word[b] * 32;
    for (int j = (int)(idx - b * kBlock); j < jend; ++j, ++idx) {
      uint32_t z = 0;
      if (w) {
        const int64_t pos = bit_base + (int64_t)j * w;
        z = (uint32_t)((load_u64(bytes + (pos >> 3)) >> (pos & 7)) & mask);
      }
      if (idx >= n_vals) continue;
      // un-zigzag (mod-2^32 safe), then the running row cumsum
      const int32_t d = (int32_t)((z >> 1) ^ (~(z & 1) + 1));
      if (col == f_pad) {  // first frame of a row is absolute
        col = 0;
        acc = 0;
      }
      if (col == 0) acc = 0;
      acc += d;
      q[idx] = (uint16_t)acc;
      ++col;
    }
  }
  carry[0] = col;
  carry[1] = acc;
  return 0;
}

// Block-granular wrapper (kept for the pipelined single-thread path).
int32_t msv_spec_decode_blocks(const uint32_t* words, const int32_t* widths,
                               const int64_t* start_word, int64_t b0,
                               int64_t b1, int64_t n_vals, int64_t f_pad,
                               int64_t* carry, uint16_t* q) {
  return msv_spec_decode_range(words, widths, start_word,
                               b0 * (int64_t)kBlock, b1 * (int64_t)kBlock,
                               n_vals, f_pad, carry, q);
}

// Blocked transpose + dequant: q (n_out, f_pad) u16 -> out (n_frames,
// n_out) f32.  f32 DIVISION by scale, not multiply-by-reciprocal: the
// numpy oracle divides, and the bit-exact-vs-oracle contract includes
// the dequant (built with -ffp-contract=off for the same reason).
// Output-frame range [c_lo, c_hi): each range writes a disjoint
// contiguous slab of ``out``, so frame ranges can run on parallel
// threads with no synchronization.
int32_t msv_spec_dequant_transpose_range(const uint16_t* q, int64_t n_out,
                                         int64_t f_pad, int64_t c_lo,
                                         int64_t c_hi, float lo,
                                         float scale, float* out) {
  constexpr int64_t T = 64;
  for (int64_t r0 = 0; r0 < n_out; r0 += T) {
    const int64_t r1 = (r0 + T < n_out) ? r0 + T : n_out;
    for (int64_t c0 = c_lo; c0 < c_hi; c0 += T) {
      const int64_t c1 = (c0 + T < c_hi) ? c0 + T : c_hi;
      for (int64_t r = r0; r < r1; ++r) {
        const uint16_t* qr = q + r * f_pad;
        for (int64_t c = c0; c < c1; ++c) {
          out[c * n_out + r] = (float)(int32_t)qr[c] / scale + lo;
        }
      }
    }
  }
  return 0;
}

int32_t msv_spec_dequant_transpose(const uint16_t* q, int64_t n_out,
                                   int64_t f_pad, int64_t n_frames,
                                   float lo, float scale, float* out) {
  return msv_spec_dequant_transpose_range(q, n_out, f_pad, 0, n_frames, lo,
                                          scale, out);
}

// One-shot wrapper (non-pipelined path / oracle comparisons).
int32_t msv_spec_unpack(const uint32_t* words, const int32_t* widths,
                        int64_t nb, int64_t n_out, int64_t f_pad,
                        int64_t n_frames, float lo, float scale,
                        float* out) {
  const int64_t n_vals = n_out * f_pad;
  if (nb * (int64_t)kBlock < n_vals) return 1;
  uint16_t* q = (uint16_t*)std::malloc((size_t)n_vals * 2);
  int64_t* sw = (int64_t*)std::malloc((size_t)nb * 8);
  if (!q || !sw) {
    std::free(q);
    std::free(sw);
    return 2;
  }
  int64_t acc = 0;
  for (int64_t b = 0; b < nb; ++b) {
    sw[b] = acc;
    acc += (int64_t)widths[b] * (kBlock / 32);
  }
  int64_t carry[2] = {f_pad, 0};  // col=f_pad => reset at the first field
  msv_spec_decode_blocks(words, widths, sw, 0, nb, n_vals, f_pad, carry, q);
  msv_spec_dequant_transpose(q, n_out, f_pad, n_frames, lo, scale, out);
  std::free(q);
  std::free(sw);
  return 0;
}

}  // extern "C"
