"""Sequence decoding — Viterbi and DTW as device scans.

The reference viewer has no sequence decoding (its roadmap stops at
adaptive STFT, ReadMe.md:12-18); these are the standard decoders the
analysis stack composes with (Viterbi-smoothed pitch contours, DTW
feature alignment) — librosa.sequence equivalents, built TPU-first.

TPU formulations (no gathers, no data-dependent control flow):

* **Viterbi** is one ``lax.scan`` over time whose step is a max-plus
  "matvec": ``delta'[j] = max_i(delta[i] + logA[i, j]) + logB_t[j]`` —
  a (S, S) broadcast + reduction the VPU eats whole.  The argmax table
  streams out of the scan; the O(T) backtrace walk is host numpy
  (sequential, tiny).

* **DTW** runs the classic Sakoe-Chiba recurrence
  ``D[i,j] = C[i,j] + min(D[i-1,j], D[i,j-1], D[i-1,j-1])`` as an outer
  ``lax.scan`` over rows with the in-row dependency solved by ONE
  ``lax.associative_scan`` in the tropical (min, +) semiring: with
  ``b[j] = C[i,j] + min(D[i-1,j], D[i-1,j-1])`` the row satisfies
  ``x[j] = min(b[j], C[i,j] + x[j-1])`` — a linear recurrence over
  (min, +), so it parallelizes exactly like the loudness module's IIR
  scans do over (+, *).  The backtrace again walks on host from the
  device-computed accumulated-cost matrix.

Pinned against from-scratch numpy DP oracles in tests/test_sequence.py
(librosa is not in this image) plus semantic pins (warped tones align
monotonically, octave glitches heal, HMM paths recover).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import round_up_to

_NEG = -1e30  # "minus infinity" that stays finite under f32 adds
_BIG = 1e30


@functools.partial(jax.jit, static_argnames=())
def _viterbi_core(log_obs, log_trans, log_init):
    def step(delta, obs_t):
        m = delta[:, None] + log_trans          # (S, S): i -> j
        best_prev = jnp.argmax(m, axis=0).astype(jnp.int32)
        delta_new = jnp.max(m, axis=0) + obs_t
        return delta_new, (best_prev, delta_new)

    delta0 = log_init + log_obs[0]
    _, (back, deltas) = jax.lax.scan(step, delta0, log_obs[1:])
    return delta0, back, deltas


def viterbi_log(log_obs, log_trans, log_init=None):
    """Most-likely state path: (T, S) frame log-likelihoods, (S, S)
    log-transitions (row = from), optional (S,) log-initial
    (uniform when None).  Returns ``(path (T,) int64, logp float)``.
    """
    log_obs = np.asarray(log_obs, np.float32) if not isinstance(
        log_obs, jax.Array) else jnp.asarray(log_obs, jnp.float32)
    t, s = log_obs.shape
    if t < 1 or s < 2:
        raise ValueError(f"need (T >= 1, S >= 2) observations, got "
                         f"{log_obs.shape}")
    log_trans = np.asarray(log_trans, np.float32)
    if log_trans.shape != (s, s):
        raise ValueError(
            f"log_trans must be ({s}, {s}), got {log_trans.shape}")
    if log_init is None:
        log_init = np.full(s, -np.log(s), np.float32)
    log_init = np.asarray(log_init, np.float32)
    if log_init.shape != (s,):
        raise ValueError(f"log_init must be ({s},), got {log_init.shape}")

    # state padding to the lane bucket: padded states can never win
    s_pad = round_up_to(s, 128)
    if s_pad != s:
        lo = jnp.full((t, s_pad), _NEG, jnp.float32)
        lo = lo.at[:, :s].set(jnp.asarray(log_obs))
        la = np.full((s_pad, s_pad), _NEG, np.float32)
        la[:s, :s] = np.maximum(log_trans, _NEG)
        li = np.full(s_pad, _NEG, np.float32)
        li[:s] = np.maximum(log_init, _NEG)
    else:
        lo = jnp.asarray(log_obs)
        la = np.maximum(log_trans, _NEG)
        li = np.maximum(log_init, _NEG)

    delta0, back, deltas = _viterbi_core(
        lo, jnp.asarray(la), jnp.asarray(li))
    back = np.asarray(back)
    last = np.asarray(deltas[-1]) if t > 1 else np.asarray(delta0)
    path = np.empty(t, np.int64)
    path[-1] = int(np.argmax(last[:s]))
    for i in range(t - 2, -1, -1):  # host backtrace: O(T), sequential
        path[i] = back[i, path[i + 1]]
    return path, float(last[path[-1]])


def viterbi(prob, transition, p_init=None):
    """Probability-domain wrapper (librosa.sequence.viterbi-style):
    ``prob`` (T, S) observation likelihoods in [0, 1], ``transition``
    (S, S) row-stochastic.  Returns ``(path, logp)``."""
    prob = np.asarray(prob, np.float64)
    transition = np.asarray(transition, np.float64)
    if np.any(prob < 0) or np.any(prob > 1):
        raise ValueError("prob must be in [0, 1]")
    if np.any(transition < 0) or not np.allclose(
            transition.sum(axis=1), 1.0, atol=1e-6):
        raise ValueError("transition rows must be nonneg and sum to 1")
    with np.errstate(divide="ignore"):
        lo = np.log(prob)
        la = np.log(transition)
        li = None if p_init is None else np.log(
            np.asarray(p_init, np.float64))
    return viterbi_log(lo, la, li)


def _tropical_combine(a, b):
    """Compose min-plus affine maps x -> min(b, m + x)."""
    m1, b1 = a
    m2, b2 = b
    return m1 + m2, jnp.minimum(b2, m2 + b1)


@functools.partial(jax.jit, static_argnames=("subsequence",))
def _dtw_core(cost, *, subsequence):
    n, m = cost.shape

    def row_step(prev, c_row):
        # prev: D[i-1, :] (padded with +BIG beyond real columns)
        shifted = jnp.concatenate(
            [jnp.full((1,), _BIG, jnp.float32), prev[:-1]])
        a = jnp.minimum(prev, shifted)           # min(D[i-1,j], D[i-1,j-1])
        b = c_row + a
        # x[j] = min(b[j], c[j] + x[j-1]); x[-1] = +BIG
        mm, bb = jax.lax.associative_scan(
            _tropical_combine, (c_row, b))
        del mm
        return bb, bb

    # first row: D[0, j] = cumsum(C[0, :j]) (standard) or C[0, j] (free
    # start along the second sequence for subsequence alignment)
    if subsequence:
        row0 = cost[0]
    else:
        row0 = jnp.cumsum(cost[0])
    _, rows = jax.lax.scan(row_step, row0, cost[1:])
    return jnp.concatenate([row0[None], rows], axis=0)


def dtw(x=None, y=None, *, cost=None, metric: str = "euclidean",
        subsequence: bool = False):
    """Dynamic time warping.

    Either ``x`` (N, D) and ``y`` (M, D) feature sequences (pairwise
    ``metric``: 'euclidean' or 'cosine' distance, computed as one GEMM)
    or an explicit ``cost`` (N, M) matrix.  Steps (1,1), (1,0), (0,1)
    with unit weights.  Returns ``(acc (N, M) accumulated cost, path
    (L, 2) int64 row/col pairs, total float)``.

    ``subsequence=True`` lets the alignment start and end anywhere
    along ``y`` (free bottom row): ``total`` is then the minimum of the
    last row and the path starts at the matched offset.
    """
    if cost is None:
        if x is None or y is None:
            raise ValueError("need x and y, or cost=")
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.float32)
        if x.ndim == 1:
            x = x[:, None]
        if y.ndim == 1:
            y = y[:, None]
        if x.ndim != 2 or y.ndim != 2 or x.shape[1] != y.shape[1]:
            raise ValueError(
                f"x, y must be (N, D), (M, D): got {x.shape}, {y.shape}")
        cost = _pairwise_cost(x, y, metric)
    else:
        if x is not None or y is not None:
            raise ValueError("pass x/y or cost=, not both")
        cost = np.asarray(cost, np.float32) if not isinstance(
            cost, jax.Array) else cost
        if cost.ndim != 2:
            raise ValueError(f"cost must be 2-D, got {np.shape(cost)}")
    n, m = cost.shape
    if n < 1 or m < 1:
        raise ValueError("empty sequences")

    # bucket both axes; +BIG padding never influences the real block
    # (min-plus: a padded cell only feeds cells below/right of it)
    n_pad = round_up_to(n, 128)
    m_pad = round_up_to(m, 128)
    c = jnp.full((n_pad, m_pad), _BIG, jnp.float32)
    c = c.at[:n, :m].set(jnp.asarray(cost, jnp.float32))
    acc = np.asarray(_dtw_core(c, subsequence=bool(subsequence)))[:n, :m]

    j_end = int(np.argmin(acc[-1])) if subsequence else m - 1
    path = [(n - 1, j_end)]
    i, j = n - 1, j_end
    while i > 0 or (j > 0 and not subsequence):  # host backtrace
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            moves = ((i - 1, j - 1), (i - 1, j), (i, j - 1))
            i, j = min(moves, key=lambda ij: acc[ij])
            path.append((i, j))
            continue
        path.append((i, j))
    path = np.asarray(path[::-1], np.int64)
    return acc, path, float(acc[n - 1, j_end])


def _pairwise_cost(x: np.ndarray, y: np.ndarray, metric: str):
    """(N, D) x (M, D) -> (N, M) distance, GEMM-shaped.

    f64 accumulation on host: identical rows must cost ~0 exactly so
    tie-breaks (identity alignments, embedded-copy subsequences) stay
    on the true path — f32 roundoff here would randomize them.
    """
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    if metric == "euclidean":
        xx = (x * x).sum(axis=1)[:, None]
        yy = (y * y).sum(axis=1)[None, :]
        d2 = np.maximum(xx + yy - 2.0 * (x @ y.T), 0.0)
        return np.sqrt(d2).astype(np.float32)
    if metric == "cosine":
        xn = x / np.maximum(
            np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        yn = y / np.maximum(
            np.linalg.norm(y, axis=1, keepdims=True), 1e-12)
        return (1.0 - xn @ yn.T).astype(np.float32)
    raise ValueError(f"unknown metric: {metric!r}")


# ---------------------------------------------------------------- pitch

def smooth_f0_viterbi(f0, aperiodicity, *, fmin: float = 65.0,
                      fmax: float = 2093.0, bins_per_semitone: int = 4,
                      obs_sigma_cents: float = 50.0,
                      trans_sigma_cents: float = 70.0,
                      switch_prob: float = 0.01,
                      voicing_slope: float = 2.0):
    """Viterbi-smoothed pitch contour (pYIN-style decoding over YIN).

    ``f0``/``aperiodicity``: per-frame outputs of
    :func:`msv_tpu.ops.pitch.yin` (``with_aperiodicity=True``).  Two
    decoupled Viterbi decodes (both max-plus device scans):

    * **voicing** — a sticky 2-state HMM on the per-frame voiced
      likelihood ``v_t = clip(1 - voicing_slope * ap_t)`` with
      ``switch_prob`` of toggling (hysteresis: isolated aperiodicity
      blips don't flip the mask);
    * **pitch** — states are a log-spaced grid (``bins_per_semitone``
      over [fmin, fmax]); observations are a Gaussian (width
      ``obs_sigma_cents``) around the YIN candidate mixed with a 5%
      uniform outlier floor, TEMPERED by ``v_t`` so unvoiced frames
      contribute ~nothing and the contour holds its last pitch through
      noise; transitions are Gaussian in cents (width
      ``trans_sigma_cents``).

    Decoupling matters: a joint model with ONE unvoiced state pays the
    pitch-transition spreading entropy (~2 nats/frame on a 25-cent
    grid) only on voiced self-loops, which silently biases every frame
    toward unvoiced (measured: a clean 220 Hz tone decoded fully
    unvoiced).  Returns ``(f0_smooth, voiced)`` — f0 snapped to the
    decoded grid (0 where unvoiced), bool voicing mask.  Octave
    glitches heal because a 12-semitone jump costs
    ``(1200 / trans_sigma_cents)^2 / 2`` nats while contradicting an
    isolated outlier frame costs only ~``log(n_bins / 0.05)``.
    """
    f0 = np.asarray(f0, np.float64).ravel()
    ap = np.asarray(aperiodicity, np.float64).ravel()
    if f0.shape != ap.shape:
        raise ValueError(f"f0/aperiodicity mismatch: {f0.shape} vs "
                         f"{ap.shape}")
    if not (0.0 < fmin < fmax):
        raise ValueError(f"need 0 < fmin < fmax, got {fmin}, {fmax}")
    if bins_per_semitone < 1:
        raise ValueError(
            f"bins_per_semitone must be >= 1, got {bins_per_semitone}")
    t = len(f0)
    if t == 0:
        return np.zeros(0, np.float32), np.zeros(0, bool)

    n_bins = int(np.ceil(12.0 * bins_per_semitone
                         * np.log2(fmax / fmin))) + 1
    cents = np.arange(n_bins) * (100.0 / bins_per_semitone)
    grid = fmin * 2.0 ** (cents / 1200.0)

    v = np.clip(1.0 - voicing_slope * ap, 1e-6, 1.0 - 1e-6)

    # voicing: sticky 2-state decode (state 1 = voiced)
    sp = float(np.clip(switch_prob, 1e-9, 0.5))
    v_obs = np.stack([np.log1p(-v), np.log(v)], axis=1)
    v_trans = np.log(np.array([[1.0 - sp, sp], [sp, 1.0 - sp]]))
    v_path, _ = viterbi_log(v_obs, v_trans)
    voiced = v_path > 0

    # pitch: Gaussian-plus-outlier observation, tempered by voicing
    # confidence.  Without the 5% floor a 2-frame octave error costs
    # (1200/obs_sigma)^2 nats per frame to override — more than the
    # jump itself — and glitches would never heal.
    obs_cents = 1200.0 * np.log2(np.maximum(f0, 1e-6) / fmin)
    z = (cents[None, :] - obs_cents[:, None]) / obs_sigma_cents
    p_outlier = 0.05
    log_obs = v[:, None] * np.log(
        (1.0 - p_outlier) * np.exp(-0.5 * z * z) + p_outlier / n_bins)

    dz = (cents[None, :] - cents[:, None]) / trans_sigma_cents
    tv = np.exp(-0.5 * dz * dz)
    tv /= tv.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore"):  # far tails: log(0), clamped
        log_tv = np.log(tv)
    path, _ = viterbi_log(log_obs, log_tv)
    out = np.where(voiced, grid[path], 0.0)
    return out.astype(np.float32), voiced


def yin_smoothed(wav, sr: int, *, fmin: float = 65.0,
                 fmax: float = 2093.0, **kw):
    """YIN + Viterbi decoding straight from audio: (T,) -> (f0, voiced).

    Device GEMMs produce the per-frame YIN candidates
    (:func:`msv_tpu.ops.pitch.yin`); the max-plus Viterbi scan decodes
    the contour.  Extra keywords split between the two stages
    (:func:`yin`: frame_length/win_length/hop_length/trough_threshold;
    the rest go to :func:`smooth_f0_viterbi`)."""
    from .pitch import yin

    yin_keys = ("frame_length", "win_length", "hop_length",
                "trough_threshold")
    yin_kw = {k: kw.pop(k) for k in list(kw) if k in yin_keys}
    f0, ap = yin(wav, sr, fmin=fmin, fmax=fmax, with_aperiodicity=True,
                 **yin_kw)
    return smooth_f0_viterbi(np.asarray(f0), np.asarray(ap), fmin=fmin,
                             fmax=fmax, **kw)
