"""Linear predictive coding — all-pole spectral envelope + formants.

The reference viewer shows the raw STFT; Praat-class spectral viewers
pair it with the classic complementary view — the LPC spectral envelope
and formant tracks drawn over the spectrogram.  The reference has no
analysis layer at all (its roadmap stops at adaptive STFT, ReadMe.md:18),
so this is a capability extension in the same spirit as the rest of the
analysis stack.

TPU formulation (no scalar loops over frames anywhere):

  * framing is the engine's zero-gather reshape (``frame_device``),
  * the per-frame autocorrelation at lags 0..p is Wiener-Khinchin: one
    end-padded windowed-rDFT GEMM pair -> power -> ONE inverse-rDFT GEMM,
    lags sliced to [0, p] (``n_fft >= win + p`` keeps the linear ACF free
    of circular aliasing),
  * Levinson-Durbin runs as a ``lax.fori_loop`` over the *static* order:
    every step is elementwise across ALL frames at once — the batch axis
    carries the parallelism (order ~10-20, frames ~thousands).  The
    per-step coefficient reversal is a constant-size ``dynamic_slice`` of
    a zero-extended lane axis: no gathers, no per-frame control flow,
  * the envelope |G|^2/|A(e^{jw})|^2 on any frequency grid is one
    (frames, p+1) x (p+1, n_grid) GEMM pair,
  * formant picking is loop-free on the grid envelope: local-max mask,
    +inf-masked ascending sort along the lane axis keeps the K
    lowest-frequency peaks in order (formants are ordered by frequency,
    not magnitude), 3-point parabolic refinement in log-power.

Pinned in tests/test_lpc.py against ``scipy.linalg.solve_toeplitz`` on
the same normal equations, a from-scratch numpy Levinson oracle,
``np.roots`` formant frequencies of the same polynomials, and semantic
pins (AR-coefficient recovery, two-resonator vowel formants).

Grid peak-picking merges formants closer than the grid's resolvable
spacing where a root finder would split them — acceptable for an
overlay, documented here; the root method remains the test oracle.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .dft import end_padded_rdft_matrices, inverse_rdft
from .stft import frame_device
from .windows import hamming
from ..utils import next_pow2, round_up_to


def _levinson(r, order: int):
    """Batched Levinson-Durbin: Toeplitz(r[:order]) a[1:] = -r[1:].

    ``r``: (N, order+1) autocorrelation rows.  Returns ``(a, g2)`` with
    ``a`` (N, order+1), ``a[:, 0] == 1`` (prediction polynomial
    A(z) = 1 + a1 z^-1 + ... + ap z^-p) and ``g2`` (N,) the prediction
    error power (the AR model's white-noise variance estimate).

    All-zero rows (digital silence) return a = [1, 0, ...], g2 = 0.
    """
    n, p1 = r.shape
    assert p1 == order + 1
    # normalize by r0 for conditioning; ridge the zero lag so the system
    # is strictly positive definite even for pure sinusoids
    r0 = jnp.maximum(r[:, :1], jnp.float32(1e-30))
    rn = r / r0
    rn = jnp.concatenate(
        [jnp.full((n, 1), 1.0 + 1e-6, jnp.float32), rn[:, 1:]], axis=1
    )
    rf_ext = jnp.concatenate([rn[:, ::-1], jnp.zeros_like(rn)], axis=1)
    a0 = jnp.zeros((n, p1), jnp.float32).at[:, 0].set(1.0)

    def body(m, st):
        a, err = st
        # v[i] = rn[m - i] (zeros for i > m): slice the reversed lags
        v = jax.lax.dynamic_slice(rf_ext, (0, p1 - 1 - m), (n, p1))
        acc = jnp.sum(a * v, axis=1)  # a_i == 0 for i >= m by induction
        # |reflection| < 1 always holds for an exact PD system; clamping
        # makes f32 rounding on near-singular frames (sustained tones at
        # high order) degrade gracefully instead of driving err negative
        # and the recursion to NaN
        lam = jnp.clip(-acc / err, -0.9999, 0.9999)
        # u[i] = a[m - i] (zeros for i > m): same trick on the coeffs
        a_ext = jnp.concatenate([a[:, ::-1], jnp.zeros_like(a)], axis=1)
        u = jax.lax.dynamic_slice(a_ext, (0, p1 - 1 - m), (n, p1))
        a = a + lam[:, None] * u
        err = jnp.maximum(err * (1.0 - lam * lam), jnp.float32(1e-12))
        return a, err

    a, err = jax.lax.fori_loop(1, order + 1, body, (a0, rn[:, 0]))
    return a, err * r0[:, 0]


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_frames", "n_fft", "order")
)
def _lpc_core(padded, cw, sw, *, win, hop, n_frames, n_fft, order):
    frames = frame_device(padded, win, hop, n_frames)
    prec = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cw, precision=prec,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sw, precision=prec,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im
    # Wiener-Khinchin: irfft(|X|^2) is the (windowed) linear ACF for
    # lags < n_fft - win
    r = inverse_rdft((power, jnp.zeros_like(power)), n_fft)[:, : order + 1]
    return _levinson(r, order)


@functools.partial(jax.jit, static_argnames=("order",))
def _envelope_core(a, g2, cg, sg, *, order):
    prec = jax.lax.Precision.HIGHEST
    are = jnp.dot(a, cg, precision=prec, preferred_element_type=jnp.float32)
    aim = jnp.dot(a, sg, precision=prec, preferred_element_type=jnp.float32)
    denom = jnp.maximum(are * are + aim * aim, jnp.float32(1e-20))
    return g2[:, None] / denom


@functools.lru_cache(maxsize=16)
def _eval_grid_matrices(order: int, n_grid: int, w_max: float):
    """A(e^{jw}) evaluation matrices on ``n_grid`` points of [0, w_max]:
    (order+1, n_grid) cos / -sin of w*k."""
    k = np.arange(order + 1, dtype=np.float64)[:, None]
    w = np.linspace(0.0, w_max, n_grid, dtype=np.float64)[None, :]
    return (np.cos(w * k).astype(np.float32),
            (-np.sin(w * k)).astype(np.float32))


def _prep_signal(wav, preemphasis: float):
    wav = np.asarray(wav, np.float32)
    if wav.ndim != 1:
        raise ValueError(f"wav must be 1-D, got {wav.shape}")
    if len(wav) < 2:
        raise ValueError("signal too short for LPC")
    if preemphasis:
        wav = np.concatenate(
            [wav[:1], wav[1:] - np.float32(preemphasis) * wav[:-1]]
        )
    return wav


def lpc(
    wav,
    *,
    order: int,
    frame_length: int = 1024,
    hop_length: int | None = None,
    preemphasis: float = 0.0,
):
    """Per-frame LPC coefficients by the autocorrelation method.

    Centered Hamming-windowed frames (half-frame zero pad at the edges,
    hop default ``frame_length//4``).  Returns ``(a, g2, hop)`` where
    ``a`` is (n_frames, order+1) float32 with ``a[:, 0] == 1`` and
    ``g2`` (n_frames,) is the prediction-error power.
    """
    if not (0 < order < frame_length):
        raise ValueError(f"need 0 < order < frame_length, got {order}")
    if hop_length is None:
        hop_length = frame_length // 4
    if hop_length < 1:
        raise ValueError(f"hop_length must be >= 1, got {hop_length}")
    wav = _prep_signal(wav, preemphasis)
    half = frame_length // 2
    n = len(wav)
    n_frames = 1 + (n + 2 * half - frame_length) // hop_length
    n_pad = round_up_to(n_frames, 128)
    need = (n_pad - 1) * hop_length + frame_length
    padded = np.zeros(need, np.float32)
    padded[half : half + n] = wav

    n_fft = next_pow2(frame_length + order + 1)
    cw, sw = end_padded_rdft_matrices(frame_length, n_fft)
    win = hamming(frame_length).astype(np.float64)
    cw = (win[:, None] * cw).astype(np.float32)
    sw = (win[:, None] * sw).astype(np.float32)
    a, g2 = _lpc_core(
        jnp.asarray(padded), jnp.asarray(cw), jnp.asarray(sw),
        win=frame_length, hop=hop_length, n_frames=n_pad, n_fft=n_fft,
        order=order,
    )
    return a[:n_frames], g2[:n_frames], hop_length


def lpc_envelope_db(
    wav,
    sr: int,
    *,
    order: int | None = None,
    frame_length: int = 1024,
    hop_length: int | None = None,
    n_grid: int = 513,
    preemphasis: float = 0.0,
    amin: float = 1e-20,
):
    """All-pole spectral envelope in dB on ``n_grid`` points of
    [0, sr/2]: (n_frames, n_grid) float32.

    ``order`` defaults to the classic ``2 + sr/1000`` rule of thumb.
    The absolute scale is the AR-model PSD (prediction-error power over
    |A|^2), i.e. the smooth envelope of the windowed periodogram.
    """
    if order is None:
        order = int(2 + sr / 1000)
    a, g2, hop = lpc(
        wav, order=order, frame_length=frame_length,
        hop_length=hop_length, preemphasis=preemphasis,
    )
    cg, sg = _eval_grid_matrices(order, n_grid, math.pi)
    env = _envelope_core(a, g2, jnp.asarray(cg), jnp.asarray(sg),
                         order=order)
    return 10.0 * jnp.log10(jnp.maximum(env, jnp.float32(amin))), hop


@functools.partial(
    jax.jit, static_argnames=("order", "n_grid", "n_formants")
)
def _formant_core(a, g2, cg, sg, fgrid, fmask, *, order, n_grid,
                  n_formants):
    env = _envelope_core(a, g2, cg, sg, order=order)
    loge = jnp.log(jnp.maximum(env, jnp.float32(1e-30)))
    prev, mid, nxt = loge[:, :-2], loge[:, 1:-1], loge[:, 2:]
    is_peak = (mid > prev) & (mid >= nxt) & fmask[None, 1:-1]
    # keep the K lowest-FREQUENCY peaks, in order: sort +inf-masked bin
    # indices ascending and take the first K
    idx = jnp.arange(1, n_grid - 1, dtype=jnp.float32)
    keys = jnp.where(is_peak, idx[None, :], jnp.float32(np.inf))
    picked = jnp.sort(keys, axis=1)[:, :n_formants]
    valid = jnp.isfinite(picked)
    pick_i = jnp.where(valid, picked, 1.0).astype(jnp.int32)
    take = lambda off: jnp.take_along_axis(  # noqa: E731
        loge, pick_i + off, axis=1)
    va, vb, vc = take(-1), take(0), take(1)
    den = va - 2.0 * vb + vc
    shift = jnp.where(jnp.abs(den) > 1e-12,
                      jnp.clip(0.5 * (va - vc) / den, -0.5, 0.5), 0.0)
    pos = pick_i.astype(jnp.float32) + shift
    step = fgrid[1] - fgrid[0]
    f_hz = pos * step
    return jnp.where(valid, f_hz, jnp.float32(np.nan))


def formant_track(
    wav,
    sr: int,
    *,
    n_formants: int = 5,
    fmax: float = 5500.0,
    order: int | None = None,
    frame_length_s: float = 0.025,
    hop_length_s: float = 0.010,
    preemphasis: float | None = None,
    n_grid: int = 1024,
):
    """Praat-style formant tracking: (n_frames, n_formants) Hz (NaN
    where fewer peaks exist) plus ``(hop_s, t0_s)`` frame timing.

    The Praat recipe (Burg -> here: autocorrelation LPC on the MXU):
    resample to 2*``fmax`` (the analysis bandwidth caps the highest
    formant), pre-emphasize ~50 Hz, order ``2*n_formants``, pick peaks
    in [50, fmax-50] Hz ordered by frequency.  Frames are centered, so
    frame i is at ``t0_s + i*hop_s`` with ``t0_s = 0``.
    """
    if n_formants < 1:
        raise ValueError("n_formants must be >= 1")
    if not (200.0 <= fmax <= sr * 4):
        raise ValueError(f"fmax {fmax} out of range")
    wav = np.asarray(wav, np.float32)
    sr_a = int(round(2 * fmax))
    if sr_a < sr:
        from .resample import resample

        wav = np.asarray(resample(wav, sr, sr_a), np.float32)
    else:
        sr_a = sr
    if preemphasis is None:
        # Praat: +6 dB/oct above 50 Hz
        preemphasis = math.exp(-2.0 * math.pi * 50.0 / sr_a)
    if order is None:
        order = 2 * n_formants
    frame_length = max(int(round(frame_length_s * sr_a)), order + 2)
    hop_length = max(int(round(hop_length_s * sr_a)), 1)
    a, g2, hop = lpc(
        wav, order=order, frame_length=frame_length,
        hop_length=hop_length, preemphasis=preemphasis,
    )
    cg, sg = _eval_grid_matrices(order, n_grid, math.pi)
    fgrid = np.linspace(0.0, sr_a / 2.0, n_grid, dtype=np.float32)
    fmask = (fgrid > 50.0) & (fgrid < min(fmax, sr_a / 2.0) - 50.0)
    f = _formant_core(
        a, g2, jnp.asarray(cg), jnp.asarray(sg), jnp.asarray(fgrid),
        jnp.asarray(fmask), order=order, n_grid=n_grid,
        n_formants=n_formants,
    )
    return f, hop / sr_a, 0.0
