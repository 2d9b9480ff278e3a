"""Stationary-noise reduction — noise-profile Wiener gating.

The classic "RX-editor" denoiser the reference's roadmap gestures at
(`ReadMe.md:18` "sth like iZotope RX Editor") but never builds: profile
the noise, subtract it in the power domain, resynthesize.  One jitted
program (the ops/hpss.py shape): framing -> windowed-rDFT GEMM pair ->
power -> noise-PSD estimate -> spectral-subtraction gain with an
attenuation floor -> short time-median gain smoothing (kills musical
noise; k shifted slices + sort, no gathers) -> masked re/im ->
inverse-rDFT GEMM -> overlap-add.  Phase rides the re/im pair (the
axon relay cannot execute complex64).

Two noise estimators, chosen statically:
* ``noise_span=(a_s, b_s)`` — mean power of the frames inside a span
  the caller knows is noise-only (the usual workflow: select a gap);
* default — per-bin ``percentile`` of power over all frames (noise is
  the floor the signal rides on; 20th percentile of white noise power
  undershoots the mean, which ``oversub`` more than compensates).

Gain math (per frame t, bin k, power P, noise PSD N):
``g = clip(1 - oversub·N_k / P_tk, floor, 1)`` with
``floor = 10^(-reduction_db/20)`` — bounded attenuation, so silence
never pumps to digital zero and artifacts stay ``reduction_db`` down.
Pinned against a from-scratch numpy oracle in tests/test_denoise.py.

Caveat (inherent to blind estimation): a component present at constant
level in EVERY frame — a sustained steady tone, mains hum you want to
KEEP — is statistically indistinguishable from noise and gets gated.
Real program material is non-stationary bin-by-bin, which is what the
percentile rides on; for pathological material pass ``noise_span``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dft import inverse_rdft, n_pad_split, windowed_dft_matrices
from .hpss import _median_axis
from .reconstruct import _ola_constants
from .stft import frame_device
from .windows import default_stft_window

__all__ = ["denoise", "wiener_gain"]


def wiener_gain(power, noise_psd, *, oversub: float, floor: float):
    """Spectral-subtraction gain (amplitude domain): see module doc."""
    g = 1.0 - jnp.float32(oversub) * noise_psd[None, :] / jnp.maximum(
        power, jnp.float32(1e-30))
    return jnp.clip(g, jnp.float32(floor), 1.0)


@functools.partial(
    jax.jit,
    static_argnames=("win", "hop", "n_fft", "n_frames", "kind", "q",
                     "oversub", "floor", "smooth"),
)
def _denoise_core(padded, c, s, syn, idx, wsq, n_valid, f0, f1, *,
                  win, hop, n_fft, n_frames, kind, q, oversub, floor,
                  smooth):
    pl, _ = n_pad_split(n_fft, win)
    total = (n_frames - 1) * hop + win
    frames = frame_device(padded, win, hop, n_frames)
    re = jnp.dot(frames, c, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    rowmask = (jnp.arange(n_frames)[:, None] < n_valid).astype(jnp.float32)
    re = re * rowmask
    im = im * rowmask
    power = re * re + im * im
    if kind == "span":
        inrow = ((jnp.arange(n_frames) >= f0)
                 & (jnp.arange(n_frames) < f1)).astype(jnp.float32)[:, None]
        npsd = jnp.sum(power * inrow, axis=0) / jnp.maximum(
            jnp.sum(inrow), 1.0)
    else:
        # percentile over the TRUE rows only: sort pushes the zeroed pad
        # rows to the bottom, so index past them
        srt = jnp.sort(power, axis=0)
        pos = (n_frames - n_valid) + jnp.int32(
            jnp.floor(jnp.float32(q) / 100.0 * (n_valid - 1)))
        npsd = srt[jnp.clip(pos, 0, n_frames - 1)]
        # bias correction: Gaussian-noise bin power is exponential, whose
        # q-th percentile is -ln(1-q/100) of the mean — undo it so the
        # estimate is the actual noise PSD, not a fraction of it
        npsd = npsd * jnp.float32(1.0 / -np.log1p(-q / 100.0))
    g = wiener_gain(power, npsd, oversub=oversub, floor=floor)
    if smooth > 1:
        # the frame grid is bucket-padded: pad rows have zero power and
        # would enter the tail's medians at the gain floor, ducking the
        # last smooth//2 true frames of every non-bucket-length file.
        # Remap pad rows to their reflection across the last true row
        # first — one tiny row-level take vs the GEMMs — so the median
        # over true rows equals scipy's mode="reflect" at ANY length.
        # ndimage mode="reflect" repeats the edge row: (... c b a | a b c)
        i = jnp.arange(n_frames)
        src = jnp.clip(jnp.where(i < n_valid, i, 2 * n_valid - 1 - i),
                       0, jnp.maximum(n_valid - 1, 0))
        g = _median_axis(jnp.take(g, src, axis=0), smooth, axis=0)
    fr = inverse_rdft((re * g, im * g), n_fft)[:, pl:pl + win]
    sig = jnp.zeros(total, jnp.float32).at[idx].add(
        (fr * syn[None, :]).ravel())
    return sig / wsq


def denoise(
    wav,
    win_length: int,
    hop_length: int,
    n_fft: int,
    *,
    sr: int | None = None,
    noise_span: tuple | None = None,
    percentile: float = 20.0,
    oversub: float = 1.5,
    reduction_db: float = 25.0,
    smooth_time: int = 5,
    window=None,
):
    """Reduce stationary noise in ``wav`` -> same-length float32.

    ``noise_span=(a_s, b_s)`` profiles noise from that span in seconds
    (requires ``sr``); otherwise the per-bin ``percentile`` of power
    profiles it blind.  ``reduction_db`` caps the attenuation (the gain
    floor); ``oversub`` > 1 over-subtracts to push residual noise under
    the floor; ``smooth_time`` (odd) median-smooths the gain across
    frames.  STFT conventions match :func:`~msv_tpu.ops.stft.perform_stft`
    (centered, reflect padding; window scale cancels in the roundtrip).
    """
    wav = np.asarray(wav, np.float32)
    if wav.ndim != 1:
        raise ValueError(f"wav must be 1-D, got {wav.shape}")
    half = win_length // 2
    if len(wav) < half + 1:
        raise ValueError(
            f"signal too short for win_length={win_length}: need at "
            f"least {half + 1} samples, got {len(wav)}")
    if smooth_time < 1 or smooth_time % 2 == 0:
        raise ValueError(f"smooth_time must be odd >= 1, got {smooth_time}")
    if not 0.0 < percentile < 100.0:
        # open interval: the exponential bias correction
        # 1/-log1p(-q/100) is infinite at 0 (NaN/fully-floored output)
        # and zero at 100 (silent no-op)
        raise ValueError(f"percentile outside (0, 100): {percentile}")
    if oversub <= 0:
        raise ValueError(f"oversub must be positive, got {oversub}")
    if reduction_db <= 0:
        raise ValueError(
            f"reduction_db must be positive, got {reduction_db}")
    from ..utils import round_up_to
    from .framing import n_frames_for, reflect_pad_center

    n_frames = n_frames_for(len(wav), win_length, hop_length)
    f0 = f1 = 0
    kind = "pct"
    if noise_span is not None:
        if sr is None:
            raise ValueError("noise_span needs sr")
        a_s, b_s = (float(v) for v in noise_span)
        if not 0.0 <= a_s < b_s:
            raise ValueError(f"bad noise_span {noise_span}")
        f0 = int(a_s * sr / hop_length)
        f1 = min(int(b_s * sr / hop_length), n_frames)
        if f1 - f0 < 3:
            raise ValueError(
                f"noise_span {noise_span} covers {f1 - f0} frames; "
                "need at least 3")
        kind = "span"
    if window is None:
        window = default_stft_window(win_length, n_fft)
    window = np.ascontiguousarray(window, dtype=np.float32)
    c, s = windowed_dft_matrices(window, n_fft)
    n_pad = round_up_to(n_frames, 128)
    need = (n_pad - 1) * hop_length + win_length
    padded = np.pad(
        reflect_pad_center(wav, win_length),
        (0, max(0, need - (len(wav) + 2 * half))))[:need]
    idx, _, total_pad = _ola_constants(n_pad, win_length, hop_length,
                                       window)
    _, wsq, total_true = _ola_constants(n_frames, win_length, hop_length,
                                        window)
    wsq = np.pad(wsq, (0, total_pad - total_true),
                 constant_values=np.float32(1e-24))
    out = _denoise_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        jnp.asarray(window), jnp.asarray(idx), jnp.asarray(wsq),
        jnp.int32(n_frames), jnp.int32(f0), jnp.int32(f1),
        win=win_length, hop=hop_length, n_fft=n_fft, n_frames=n_pad,
        kind=kind, q=float(percentile), oversub=float(oversub),
        floor=float(10.0 ** (-reduction_db / 20.0)),
        smooth=int(smooth_time),
    )
    return np.asarray(out)[half:half + len(wav)]
