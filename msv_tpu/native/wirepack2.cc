// Native v2 wire-codec packer (host side of wirepack.py::pack_int2).
//
// Same role as wirepack.cc for the v1 stream: the numpy v2 packer is the
// semantics oracle but runs ~3 MB/s on this single-core host (the wire
// moves 25-40 MB/s), so the production path is this C implementation.
// Unlike v1, byte-identity with the numpy packer is NOT contractual: the
// per-block LPC fit runs in float64 whose summation order differs from
// numpy's pairwise sums, so quantized coefficients can differ by 1 ulp.
// Any stream this packer emits decodes bit-exactly through BOTH unpackers
// (unpack2_np / unpack2_device) — encoder freedom, like any lossless
// codec.  Cost planning, the exception-capacity ladder, the candidate
// set, and the container layout all mirror the numpy packer.
//
// Format (see wirepack.py "v2 uplink codec"): per segment, the best of
// {Delta^0..2, block-LPC(P=8)} x {plain-max widths, patched widths with
// (position, high-bits) exceptions}; dense low-bits stream packed
// little-endian in BLOCK-sample blocks, per-block width; exceptions as
// parallel i32/u32 arrays capped by a static ladder.
//
// Build: make -C msv_tpu/native

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

constexpr int kP = 8;        // LPC order       (wirepack.py LPC_P)
constexpr int kPrec = 14;    // coefficient bits (wirepack.py LPC_PREC)
constexpr int kExcBits = 64; // i32 position + u32 payload on the wire

inline uint32_t zigzag2(int32_t v) {
  return ((uint32_t)v << 1) ^ (uint32_t)(v >> 31);
}

inline int32_t wsub2(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a - (uint32_t)b);
}

inline int bit_width2(uint32_t v) {
  return v ? 32 - __builtin_clz(v) : 0;
}

// Per-block width histogram -> (chosen width, #exceptions) minimizing
// L*block + penalty*nexc.  counts[w] = #samples with bit length w (0..32).
inline void plan_block(const int32_t* counts, int block, int64_t penalty,
                       int* out_L, int64_t* out_nexc) {
  // nexc_at[L] = #samples with bit length > L (suffix sums; counts[w]
  // holds the samples needing exactly w bits)
  int64_t nexc_at[33];
  int64_t acc = 0;
  for (int w = 32; w >= 0; w--) {
    nexc_at[w] = acc;
    acc += counts[w];
  }
  int best_L = 32;
  int64_t best_cost = INT64_MAX, best_nexc = 0;
  for (int L = 0; L <= 32; L++) {
    int64_t cost = (int64_t)L * block + penalty * nexc_at[L];
    if (cost < best_cost) {
      best_cost = cost;
      best_L = L;
      best_nexc = nexc_at[L];
    }
  }
  *out_L = best_L;
  *out_nexc = best_nexc;
}

struct Plan {
  uint8_t* L;      // per-block chosen width
  int64_t nexc;    // total exceptions
  int64_t bits;    // sum L*block (dense stream bits)
};

// Choose widths for one candidate from its per-block histograms, walking
// the penalty ladder until the exception total fits a capacity rung.
// Returns the ladder capacity used (0 if the plain plan was forced), or
// -1 if even the top penalty overflows every rung (then plain).
inline int64_t plan_candidate(const int32_t* hist /* nb x 33+1 */,
                              int64_t nb, int block, const int64_t* caps,
                              int ncaps, Plan* plan, bool plain) {
  int64_t total_exc = 0, total_bits = 0;
  if (plain) {
    for (int64_t b = 0; b < nb; b++) {
      int wmax = 0;
      const int32_t* h = hist + b * 34;
      for (int w = 32; w >= 1; w--)
        if (h[w]) { wmax = w; break; }
      plan->L[b] = (uint8_t)wmax;
      total_bits += (int64_t)wmax * block;
    }
    plan->nexc = 0;
    plan->bits = total_bits;
    return 0;
  }
  const int64_t penalties[3] = {kExcBits, 2 * kExcBits, 4 * kExcBits};
  for (int pi = 0; pi < 3; pi++) {
    total_exc = 0;
    total_bits = 0;
    for (int64_t b = 0; b < nb; b++) {
      int L;
      int64_t ne;
      plan_block(hist + b * 34, block, penalties[pi], &L, &ne);
      plan->L[b] = (uint8_t)L;
      total_exc += ne;
      total_bits += (int64_t)L * block;
    }
    for (int c = 0; c < ncaps; c++) {
      if (total_exc <= caps[c]) {
        plan->nexc = total_exc;
        plan->bits = total_bits;
        return caps[c];
      }
    }
  }
  return -1;
}

// Levinson-Durbin on one block (double), FLAC-style quantization.
// Mirrors wirepack.py::_batched_lpc_quant (same regularization/clamps).
inline void lpc_fit_block(const double* xb, int block, int32_t* cq,
                          int32_t* shift_out) {
  double ac[kP + 1];
  for (int k = 0; k <= kP; k++) {
    double s = 0.0;
    for (int i = 0; i + k < block; i++) s += xb[i] * xb[i + k];
    ac[k] = s;
  }
  ac[0] += 1e-3;
  double a[kP + 1] = {0.0};
  a[0] = 1.0;
  double e = ac[0];
  for (int i = 1; i <= kP; i++) {
    double acc = ac[i];
    for (int j = 1; j < i; j++) acc += a[j] * ac[i - j];
    double k = -acc / (e > 1e-9 ? e : 1e-9);
    double a2[kP + 1];
    memcpy(a2, a, sizeof(a2));
    for (int j = 1; j < i; j++) a2[j] = a[j] + k * a[i - j];
    a2[i] = k;
    memcpy(a, a2, sizeof(a));
    e = e * (1.0 - k * k);
    if (e < 1e-12) e = 1e-12;
  }
  double mx = 1e-9;
  for (int j = 1; j <= kP; j++) {
    double v = fabs(-a[j]);
    if (v > mx) mx = v;
  }
  long sh = (long)(kPrec - 1) - (long)ceil(log2(mx));
  if (sh < 0) sh = 0;
  if (sh > 15) sh = 15;
  *shift_out = (int32_t)sh;
  const double scale = (double)(1u << sh);
  const int32_t lim = 1 << (kPrec - 1);
  for (int j = 1; j <= kP; j++) {
    double q = nearbyint(-a[j] * scale);  // round-half-even == np.round
    int32_t qi = (int32_t)q;
    if (qi < -lim) qi = -lim;
    if (qi > lim - 1) qi = lim - 1;
    cq[j - 1] = qi;
  }
}

// LPC residual of one block: t < P -> 0 (warmup ships raw);
// t >= P -> wrap32(x[t] - asr(wrap32(sum cq[k-1]*x[t-k]), shift)).
inline void lpc_residual_block(const int32_t* xb, int block,
                               const int32_t* cq, int32_t shift,
                               int32_t* r) {
  for (int t = 0; t < kP; t++) r[t] = 0;
  for (int t = kP; t < block; t++) {
    int64_t acc = 0;
    for (int k = 1; k <= kP; k++)
      acc += (int64_t)cq[k - 1] * (int64_t)xb[t - k];
    int32_t pred = (int32_t)((uint32_t)(acc & 0xFFFFFFFFll)) >> shift;
    r[t] = wsub2(xb[t], pred);
  }
}

template <typename T>
int32_t wirepack2_impl(const T* x, int64_t n, int32_t block,
                       uint8_t** out_bytes, int64_t* out_nbytes,
                       int32_t** out_widths, int32_t** out_starts,
                       int64_t* out_nblocks,
                       int32_t* out_pred /* 0 delta-plain(v1), 1 delta,
                                            2 lpc */,
                       int32_t* out_order, int32_t* out_head,
                       int32_t** out_exc_idx, uint32_t** out_exc_val,
                       int64_t* out_nexc,
                       int32_t** out_cq /* nb*kP */,
                       int32_t** out_shift /* nb */,
                       int32_t** out_warmup /* nb*kP, carrier values */) {
  if (n <= 2 * (int64_t)block || block <= 0 || (block % 8) != 0 ||
      block <= kP)
    return 1;
  const int64_t nb = (n + block - 1) / block;
  const int64_t nv = nb * block;

  // capacity ladder (wirepack.py::_exc_cap_ladder)
  int64_t caps[4];
  int ncaps = 0;
  int64_t cand[4] = {0, (nv + 4095) / 4096, (nv + 1023) / 1024,
                     (nv + 255) / 256};
  for (int i = 0; i < 4; i++) {
    bool dup = false;
    for (int j = 0; j < ncaps; j++)
      if (caps[j] == cand[i]) dup = true;
    if (!dup) caps[ncaps++] = cand[i];
  }

  // ---- histograms: delta 0/1/2 (single streaming pass) ---------------
  int32_t* hist[4];  // [order 0..2, lpc=3], each nb x 34
  for (int k = 0; k < 4; k++) {
    hist[k] = (int32_t*)calloc((size_t)nb * 34, sizeof(int32_t));
    if (!hist[k]) {
      for (int j = 0; j < k; j++) free(hist[j]);
      return 1;
    }
  }
  {
    int32_t prev1 = 0;
    for (int64_t i = 0; i < nv; i++) {
      int64_t b = i / block;
      int32_t x0 = i < n ? (int32_t)x[i] : 0;
      hist[0][b * 34 + bit_width2(zigzag2(x0))]++;
      int32_t r1;
      if (i == 0 || i >= n) r1 = i == 0 ? 0 : 0;
      else r1 = wsub2(x0, (int32_t)x[i - 1]);
      // order-1/2 streams are length n-1/n-2, zero-padded to nv in the
      // numpy packer's single grid; replicate: sample i of the padded
      // order-k stream is residual[i] for i < n-k else 0
      int32_t rr1 = (i < n - 1) ? wsub2((int32_t)x[i + 1], x0) : 0;
      hist[1][b * 34 + bit_width2(zigzag2(rr1))]++;
      int32_t rr2 =
          (i < n - 2)
              ? (int32_t)((uint32_t)x[i + 2] - 2u * (uint32_t)x[i + 1] +
                          (uint32_t)x[i])
              : 0;
      hist[2][b * 34 + bit_width2(zigzag2(rr2))]++;
      (void)r1;
      (void)prev1;
    }
  }

  // ---- LPC fit + residual histogram (block-local passes) --------------
  int32_t* cq_all = (int32_t*)malloc((size_t)nb * kP * sizeof(int32_t));
  int32_t* sh_all = (int32_t*)malloc((size_t)nb * sizeof(int32_t));
  int32_t* xblk = (int32_t*)malloc((size_t)block * sizeof(int32_t));
  double* xdbl = (double*)malloc((size_t)block * sizeof(double));
  int32_t* rblk = (int32_t*)malloc((size_t)block * sizeof(int32_t));
  if (!cq_all || !sh_all || !xblk || !xdbl || !rblk) {
    for (int k = 0; k < 4; k++) free(hist[k]);
    free(cq_all); free(sh_all); free(xblk); free(xdbl); free(rblk);
    return 1;
  }
  for (int64_t b = 0; b < nb; b++) {
    for (int t = 0; t < block; t++) {
      int64_t i = b * block + t;
      xblk[t] = i < n ? (int32_t)x[i] : 0;
      xdbl[t] = (double)xblk[t];
    }
    lpc_fit_block(xdbl, block, cq_all + b * kP, sh_all + b);
    lpc_residual_block(xblk, block, cq_all + b * kP, sh_all[b], rblk);
    int32_t* h = hist[3] + b * 34;
    for (int t = 0; t < block; t++) h[bit_width2(zigzag2(rblk[t]))]++;
  }

  // ---- candidate costs (mirrors pack_int2) ----------------------------
  const int64_t meta_bits = nb * 8 * 8 + 64 * 8;
  const int64_t wu_bytes = sizeof(T) == 2 ? 2 : 4;
  const int64_t lpc_meta =
      meta_bits + nb * (kP * 2 + kP * wu_bytes + 4) * 8;

  Plan plans[8];
  int64_t used_cap[8];
  int64_t costs[8];
  // layout: [k*2 + plain?] for k=0..2 delta, then 6=lpc-plain, 7=lpc-pfor
  for (int c = 0; c < 8; c++) {
    plans[c].L = (uint8_t*)malloc((size_t)nb);
    if (!plans[c].L) {
      for (int j = 0; j < c; j++) free(plans[j].L);
      for (int k = 0; k < 4; k++) free(hist[k]);
      free(cq_all); free(sh_all); free(xblk); free(xdbl); free(rblk);
      return 1;
    }
  }
  for (int k = 0; k < 3; k++) {
    used_cap[k * 2] =
        plan_candidate(hist[k], nb, block, caps, ncaps, &plans[k * 2], true);
    costs[k * 2] = plans[k * 2].bits + meta_bits;
    used_cap[k * 2 + 1] = plan_candidate(hist[k], nb, block, caps, ncaps,
                                         &plans[k * 2 + 1], false);
    costs[k * 2 + 1] =
        used_cap[k * 2 + 1] < 0
            ? INT64_MAX
            : plans[k * 2 + 1].bits + used_cap[k * 2 + 1] * kExcBits +
                  meta_bits;
  }
  used_cap[6] = plan_candidate(hist[3], nb, block, caps, ncaps, &plans[6],
                               true);
  costs[6] = plans[6].bits + lpc_meta;
  used_cap[7] =
      plan_candidate(hist[3], nb, block, caps, ncaps, &plans[7], false);
  costs[7] = used_cap[7] < 0 ? INT64_MAX
                             : plans[7].bits + used_cap[7] * kExcBits +
                                   lpc_meta;

  int best = 0;
  for (int c = 1; c < 8; c++)
    if (costs[c] < costs[best]) best = c;

  int32_t pred;  // 0 = delta plain (v1-compatible), 1 = delta pfor, 2 = lpc
  int order = 0;
  if (best < 6) {
    order = best / 2;
    pred = (best % 2) ? 1 : 0;
  } else {
    pred = 2;
  }
  const bool lpc = pred == 2;
  Plan* plan = &plans[best];
  const int64_t cap = (best % 2 == 1 || best == 7) ? used_cap[best] : 0;

  int rc = 1;
  if ((uint64_t)(costs[best] / 8) >= (uint64_t)n * sizeof(T) ||
      plan->bits >= (1ll << 31))
    goto cleanup;  // raw is smaller (or stream too large): caller ships raw

  {
    // ---- emit ---------------------------------------------------------
    int32_t* widths = (int32_t*)malloc((size_t)nb * sizeof(int32_t));
    int32_t* starts = (int32_t*)malloc((size_t)nb * sizeof(int32_t));
    int64_t nbytes = (plan->bits + 7) / 8;
    int64_t alloc = nbytes + ((-nbytes) % 4 + 4) % 4 + 8;
    uint8_t* bytes = (uint8_t*)calloc(1, (size_t)alloc);
    int32_t* exc_idx =
        cap ? (int32_t*)calloc((size_t)cap, sizeof(int32_t)) : nullptr;
    uint32_t* exc_val =
        cap ? (uint32_t*)calloc((size_t)cap, sizeof(uint32_t)) : nullptr;
    int32_t* warmup =
        lpc ? (int32_t*)malloc((size_t)nb * kP * sizeof(int32_t)) : nullptr;
    if (!widths || !starts || !bytes || (cap && (!exc_idx || !exc_val)) ||
        (lpc && !warmup)) {
      free(widths); free(starts); free(bytes);
      free(exc_idx); free(exc_val); free(warmup);
      goto cleanup;
    }
    {
      int64_t accbits = 0;
      for (int64_t b = 0; b < nb; b++) {
        widths[b] = plan->L[b];
        starts[b] = (int32_t)accbits;
        accbits += (int64_t)plan->L[b] * block;
      }
    }
    int64_t nexc_written = 0;
    {
      uint64_t acc = 0;
      int accb = 0;
      int64_t out_pos = 0;
      for (int64_t b = 0; b < nb; b++) {
        const int w = plan->L[b];
        const uint64_t mask = w >= 32 ? 0xFFFFFFFFull
                                      : ((1ull << w) - 1ull);
        if (lpc) {
          for (int t = 0; t < block; t++) {
            int64_t i = b * block + t;
            xblk[t] = i < n ? (int32_t)x[i] : 0;
          }
          lpc_residual_block(xblk, block, cq_all + b * kP, sh_all[b],
                             rblk);
          for (int t = 0; t < kP; t++)
            warmup[b * kP + t] = xblk[t];
        }
        for (int t = 0; t < block; t++) {
          int64_t i = b * block + t;
          uint32_t z;
          if (lpc) {
            z = zigzag2(rblk[t]);
          } else {
            int32_t r = 0;
            if (order == 0) r = i < n ? (int32_t)x[i] : 0;
            else if (order == 1)
              r = (i < n - 1) ? wsub2((int32_t)x[i + 1], (int32_t)x[i])
                              : 0;
            else
              r = (i < n - 2)
                      ? (int32_t)((uint32_t)x[i + 2] -
                                  2u * (uint32_t)x[i + 1] +
                                  (uint32_t)x[i])
                      : 0;
            z = zigzag2(r);
          }
          uint32_t lo = (uint32_t)(z & mask);
          uint32_t hi = z - lo;
          if (hi && nexc_written < cap) {
            exc_idx[nexc_written] = (int32_t)i;
            exc_val[nexc_written] = hi;
            nexc_written++;
          } else if (hi) {
            // capacity miscount would corrupt the stream: abort to raw
            free(widths); free(starts); free(bytes);
            free(exc_idx); free(exc_val); free(warmup);
            goto cleanup;
          }
          acc |= ((uint64_t)lo) << accb;
          accb += w;
          while (accb >= 8) {
            bytes[out_pos++] = (uint8_t)(acc & 0xFF);
            acc >>= 8;
            accb -= 8;
          }
        }
      }
    }
    // heads for the delta orders (v1 convention)
    for (int k = 0; k < order; k++)
      out_head[k] = k == 0 ? (int32_t)x[0]
                           : wsub2((int32_t)x[1], (int32_t)x[0]);
    *out_bytes = bytes;
    *out_nbytes = alloc;
    *out_widths = widths;
    *out_starts = starts;
    *out_nblocks = nb;
    *out_pred = pred;
    *out_order = lpc ? 0 : order;
    *out_exc_idx = exc_idx;
    *out_exc_val = exc_val;
    *out_nexc = cap;  // bucketed length (tail zero no-ops), actual <= cap
    if (lpc) {
      *out_cq = cq_all;
      *out_shift = sh_all;
      *out_warmup = warmup;
      cq_all = nullptr;  // ownership moved to caller
      sh_all = nullptr;
    } else {
      *out_cq = nullptr;
      *out_shift = nullptr;
      *out_warmup = nullptr;
    }
    rc = 0;
  }

cleanup:
  for (int c = 0; c < 8; c++) free(plans[c].L);
  for (int k = 0; k < 4; k++) free(hist[k]);
  free(cq_all);
  free(sh_all);
  free(xblk);
  free(xdbl);
  free(rblk);
  return rc;
}

}  // namespace

extern "C" {

int32_t msv_wirepack2_pack(const int16_t* x, int64_t n, int32_t block,
                           uint8_t** out_bytes, int64_t* out_nbytes,
                           int32_t** out_widths, int32_t** out_starts,
                           int64_t* out_nblocks, int32_t* out_pred,
                           int32_t* out_order, int32_t* out_head,
                           int32_t** out_exc_idx, uint32_t** out_exc_val,
                           int64_t* out_nexc, int32_t** out_cq,
                           int32_t** out_shift, int32_t** out_warmup) {
  return wirepack2_impl<int16_t>(x, n, block, out_bytes, out_nbytes,
                                 out_widths, out_starts, out_nblocks,
                                 out_pred, out_order, out_head,
                                 out_exc_idx, out_exc_val, out_nexc,
                                 out_cq, out_shift, out_warmup);
}

int32_t msv_wirepack2_pack_i32(const int32_t* x, int64_t n, int32_t block,
                               uint8_t** out_bytes, int64_t* out_nbytes,
                               int32_t** out_widths, int32_t** out_starts,
                               int64_t* out_nblocks, int32_t* out_pred,
                               int32_t* out_order, int32_t* out_head,
                               int32_t** out_exc_idx,
                               uint32_t** out_exc_val, int64_t* out_nexc,
                               int32_t** out_cq, int32_t** out_shift,
                               int32_t** out_warmup) {
  return wirepack2_impl<int32_t>(x, n, block, out_bytes, out_nbytes,
                                 out_widths, out_starts, out_nblocks,
                                 out_pred, out_order, out_head,
                                 out_exc_idx, out_exc_val, out_nexc,
                                 out_cq, out_shift, out_warmup);
}

}  // extern "C"
