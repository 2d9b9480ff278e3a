// Native wire-codec packer (host side of msv_tpu/parallel/wirepack.py).
//
// The axon relay moves ~25-40 MB/s; the numpy packer peaks at ~36 MB/s on
// this single-core host, which can make packing the bottleneck instead of
// the wire.  This C++ packer produces the IDENTICAL bitstream (same order
// selection, same per-block widths, same little-endian layout — the numpy
// packer remains the test oracle) in one streaming pass per stage at
// memory speed, so the host always outruns the wire.
//
// Format (see wirepack.py): residual = Delta^order(x), zigzag, blocks of
// BLOCK samples, per-block exact bit width, fields packed little-endian,
// each block byte-aligned (BLOCK % 8 == 0 guarantees this).
//
// Build: make -C msv_tpu/native

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

// mod-2^32 safe for the FULL int32 range (v << 1 on INT_MIN would be UB;
// the uint32 form wraps, matching the numpy oracle's uint32 arithmetic)
inline uint32_t zigzag(int32_t v) {
  return ((uint32_t)v << 1) ^ (uint32_t)(v >> 31);
}

// wrapped (mod 2^32) difference — the codec's delta arithmetic
inline int32_t wsub(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a - (uint32_t)b);
}

inline int bit_width(uint32_t v) {
  return v ? 32 - __builtin_clz(v) : 0;
}

}  // namespace

namespace {

// Packs integer PCM (int16 raw samples, or FULL-range int32: channel
// sums, scaled-int carriers, ordered-float transforms — delta arithmetic
// is mod 2^32, widths up to 32 bits).  Returns 0 on success; 1 when the
// raw array is smaller or the input is too small / stream too large
// (caller ships raw).  out_head: room for max_order i32s.
template <typename T>
int32_t wirepack_pack_impl(const T* x, int64_t n, int32_t block,
                           int32_t max_order,
                           uint8_t** out_bytes, int64_t* out_nbytes,
                           int32_t** out_widths, int32_t** out_starts,
                           int64_t* out_nblocks, int32_t* out_order,
                           int32_t* out_head) {
  if (n <= 2 * (int64_t)block || block <= 0 || (block % 8) != 0) return 1;
  if (max_order < 0) max_order = 0;
  if (max_order > 2) max_order = 2;

  // ---- pass 1: per-block max zigzag for each candidate order ----------
  // residuals are generated on the fly: r0 = x[i], r1 = x[i]-x[i-1],
  // r2 = r1[i]-r1[i-1]; each order's residual stream has its own block
  // grid (length n-order), handled by per-order block counters.
  const int n_orders = max_order + 1;
  int64_t nb[3] = {0, 0, 0};
  uint64_t total_bits[3] = {0, 0, 0};
  int32_t* widths_buf[3] = {nullptr, nullptr, nullptr};
  for (int k = 0; k < n_orders; k++) {
    int64_t nr = n - k;
    nb[k] = (nr + block - 1) / block;
    widths_buf[k] = (int32_t*)malloc(sizeof(int32_t) * nb[k]);
    if (!widths_buf[k]) {
      for (int j = 0; j < k; j++) free(widths_buf[j]);
      return 1;
    }
  }

  {
    uint32_t zmax[3] = {0, 0, 0};
    int64_t bidx[3] = {0, 0, 0};
    int64_t bfill[3] = {0, 0, 0};
    int32_t prev1 = 0, prev2 = 0;  // r1[i-1], r1 previous for r2
    for (int64_t i = 0; i < n; i++) {
      int32_t r0 = x[i];
      uint32_t z0 = zigzag(r0);
      if (z0 > zmax[0]) zmax[0] = z0;
      if (++bfill[0] == block) {
        widths_buf[0][bidx[0]++] = bit_width(zmax[0]);
        zmax[0] = 0;
        bfill[0] = 0;
      }
      if (n_orders > 1 && i >= 1) {
        int32_t r1 = wsub(r0, (int32_t)x[i - 1]);
        uint32_t z1 = zigzag(r1);
        if (z1 > zmax[1]) zmax[1] = z1;
        if (++bfill[1] == block) {
          widths_buf[1][bidx[1]++] = bit_width(zmax[1]);
          zmax[1] = 0;
          bfill[1] = 0;
        }
        if (n_orders > 2) {
          if (i >= 2) {
            int32_t r2 = wsub(r1, prev1);
            uint32_t z2 = zigzag(r2);
            if (z2 > zmax[2]) zmax[2] = z2;
            if (++bfill[2] == block) {
              widths_buf[2][bidx[2]++] = bit_width(zmax[2]);
              zmax[2] = 0;
              bfill[2] = 0;
            }
          }
          prev2 = prev1;
          prev1 = r1;
          (void)prev2;
        }
      }
    }
    for (int k = 0; k < n_orders; k++) {
      if (bfill[k] > 0) widths_buf[k][bidx[k]++] = bit_width(zmax[k]);
    }
  }

  // ---- order selection (same cost model as the numpy packer) ----------
  int best = 0;
  uint64_t best_cost = UINT64_MAX;
  for (int k = 0; k < n_orders; k++) {
    uint64_t bits = 0;
    for (int64_t b = 0; b < nb[k]; b++)
      bits += (uint64_t)widths_buf[k][b] * (uint64_t)block;
    total_bits[k] = bits;
    uint64_t cost = bits / 8 + (uint64_t)nb[k] * 8 + 64;
    if (cost < best_cost) {
      best_cost = cost;
      best = k;
    }
  }
  if (best_cost >= (uint64_t)n * sizeof(T) ||
      total_bits[best] >= (1ull << 31)) {
    for (int k = 0; k < n_orders; k++) free(widths_buf[k]);
    return 1;
  }

  const int order = best;
  const int64_t nblocks = nb[order];
  int32_t* widths = widths_buf[order];
  for (int k = 0; k < n_orders; k++)
    if (k != order) free(widths_buf[k]);

  // heads: head[k] = (Delta^k x)[0]
  for (int k = 0; k < order; k++)
    out_head[k] = k == 0 ? (int32_t)x[0]
                         : wsub((int32_t)x[1], (int32_t)x[0]);  // order<=2

  int32_t* starts = (int32_t*)malloc(sizeof(int32_t) * nblocks);
  if (!starts) {
    free(widths);
    return 1;
  }
  {
    int64_t acc = 0;
    for (int64_t b = 0; b < nblocks; b++) {
      starts[b] = (int32_t)acc;
      acc += (int64_t)widths[b] * block;
    }
  }

  // two spare words so the device's hi-word gather stays in bounds
  int64_t nbytes = (int64_t)(total_bits[order] + 7) / 8;
  int64_t alloc = nbytes + ((-nbytes) % 4 + 4) % 4 + 8;
  uint8_t* bytes = (uint8_t*)calloc(1, (size_t)alloc);
  if (!bytes) {
    free(widths);
    free(starts);
    return 1;
  }

  // ---- pass 2: pack the chosen order's residuals ----------------------
  // The field stream is nblocks*block fields long: the tail block is
  // zero-padded to a full block (matching the numpy packer), and those
  // zero fields still occupy w bits each.
  {
    uint64_t acc = 0;  // bit accumulator, flushed bytewise
    int accbits = 0;
    int64_t out_pos = 0;
    int64_t nr = n - order;
    int64_t b = -1;
    int w = 0;
    for (int64_t i = 0; i < nblocks * (int64_t)block; i++) {
      if (i % block == 0) {
        b++;
        w = widths[b];
      }
      uint32_t z = 0;
      if (i < nr) {
        int32_t r;
        if (order == 0) r = x[i];
        else if (order == 1) r = wsub((int32_t)x[i + 1], (int32_t)x[i]);
        else
          r = (int32_t)((uint32_t)x[i + 2] - 2u * (uint32_t)x[i + 1] +
                        (uint32_t)x[i]);
        z = zigzag(r);
      }
      acc |= ((uint64_t)z) << accbits;
      accbits += w;
      while (accbits >= 8) {
        bytes[out_pos++] = (uint8_t)(acc & 0xFF);
        acc >>= 8;
        accbits -= 8;
      }
    }
    // every block is byte-aligned (block % 8 == 0), so nothing remains
  }

  *out_bytes = bytes;
  *out_nbytes = alloc;
  *out_widths = widths;
  *out_starts = starts;
  *out_nblocks = nblocks;
  *out_order = order;
  return 0;
}

}  // namespace

extern "C" {

void msv_free_ptr(void* p) { free(p); }

int32_t msv_wirepack_pack(const int16_t* x, int64_t n, int32_t block,
                          int32_t max_order,
                          uint8_t** out_bytes, int64_t* out_nbytes,
                          int32_t** out_widths, int32_t** out_starts,
                          int64_t* out_nblocks, int32_t* out_order,
                          int32_t* out_head) {
  return wirepack_pack_impl<int16_t>(x, n, block, max_order, out_bytes,
                                     out_nbytes, out_widths, out_starts,
                                     out_nblocks, out_order, out_head);
}

int32_t msv_wirepack_pack_i32(const int32_t* x, int64_t n, int32_t block,
                              int32_t max_order,
                              uint8_t** out_bytes, int64_t* out_nbytes,
                              int32_t** out_widths, int32_t** out_starts,
                              int64_t* out_nblocks, int32_t* out_order,
                              int32_t* out_head) {
  return wirepack_pack_impl<int32_t>(x, n, block, max_order, out_bytes,
                                     out_nbytes, out_widths, out_starts,
                                     out_nblocks, out_order, out_head);
}

}  // extern "C"
