"""Rational sample-rate conversion (polyphase Kaiser-windowed sinc).

The reference never resamples — every track computes at its native rate
(audio.rs keeps sr per track) and the session aligns renders in the
frequency DOMAIN (lib.rs:231-248 up_ratio).  msv_tpu keeps that design,
but a resampler is the missing bridge to the ML frontend: Whisper
features are defined at 16 kHz only, so arbitrary-rate session audio
needs a rate conversion before ``whisper_log_mel``.

TPU formulation: the whole upfirdn (zero-stuff by ``up``, FIR lowpass,
keep every ``down``-th sample) is ONE ``lax.conv_general_dilated`` —
``lhs_dilation=up`` expresses the zero-stuffing without materializing
it, ``window_strides=down`` the decimation, so XLA sees the polyphase
structure directly.  For the common integer downsample (48 k -> 16 k:
up=1) this compiles to a plain strided convolution.  The filter matches
``scipy.signal.resample_poly``'s default design bit-for-bit in f64
(windowed sinc, kaiser beta 5.0, 10 taps per phase, unit DC gain —
pinned against scipy in tests/test_resample.py), so outputs agree with
the scipy oracle to f32 conv rounding.

Each distinct (length, up, down) pair is its own compiled program —
pad/bucket lengths upstream in pipelines (same convention as the
feature frontend's fixed 30 s chunks).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _poly_filter(up: int, down: int, beta: float) -> np.ndarray:
    """scipy.signal.resample_poly's default filter, from scratch.

    Windowed-sinc lowpass at 1/max(up, down) x Nyquist, 10 taps per
    phase (half_len = 10 * max_rate), kaiser(beta) window, normalized to
    unit DC gain, scaled by ``up`` to preserve amplitude through the
    zero-stuffing.  f64 throughout (the design is host-side, one-time).
    """
    max_rate = max(up, down)
    half_len = 10 * max_rate
    n = 2 * half_len + 1
    m = np.arange(n, dtype=np.float64) - half_len
    h = np.sinc(m / max_rate) / max_rate * np.kaiser(n, beta)
    h /= h.sum()  # firwin's unit passband (DC) gain
    return (h * up).astype(np.float64)


def _output_len(in_len: int, up: int, down: int, flen: int) -> int:
    return (-(-((in_len - 1) * up + flen) // down))


@functools.partial(jax.jit, static_argnames=("up", "down", "pre", "n_out"))
def _upfirdn_conv(x, h, *, up, down, pre, n_out):
    lead = x.shape[:-1]
    flen = h.shape[0]
    y = jax.lax.conv_general_dilated(
        x.reshape(-1, 1, x.shape[-1]),
        h[::-1].reshape(1, 1, flen),  # true convolution (lax correlates)
        window_strides=(down,),
        padding=((flen - 1, flen - 1),),
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )[:, 0, pre:pre + n_out]
    return y.reshape(*lead, n_out)


def resample_poly(x, up: int, down: int, *, beta: float = 5.0):
    """Resample the last axis by the rational factor ``up / down``.

    Mirrors ``scipy.signal.resample_poly(x, up, down)`` (default kaiser
    design, zero edge handling): output length ``ceil(n * up / down)``,
    filter centered so sample 0 maps to sample 0.  Accepts host or
    device arrays of shape (..., n); returns float32 on device.
    """
    up, down = int(up), int(down)
    if up < 1 or down < 1:
        raise ValueError(f"up/down must be positive, got {up}/{down}")
    g = math.gcd(up, down)
    up //= g
    down //= g
    x = jnp.asarray(x, jnp.float32)
    if x.shape[-1] < 2:
        raise ValueError(f"need at least 2 samples, got {x.shape}")
    if up == 1 and down == 1:
        return x
    n_in = x.shape[-1]
    n_out = n_in * up // down + bool(n_in * up % down)

    h = _poly_filter(up, down, beta)
    half_len = (len(h) - 1) // 2
    # center the filter on the decimation grid (scipy's h zero-padding,
    # folded into index arithmetic: keep full-conv positions
    # half_len + j*down, i.e. pre-pad h by (-half_len) % down and start
    # the strided output at (half_len + pre_pad) // down)
    pre_pad = (-half_len) % down
    n_pre_remove = (half_len + pre_pad) // down
    hp = h if pre_pad == 0 else np.concatenate([np.zeros(pre_pad), h])
    # guarantee the trimmed window exists even for tiny inputs
    short = n_pre_remove + n_out - _output_len(n_in, up, down, len(hp))
    if short > 0:
        hp = np.concatenate([hp, np.zeros(short * down)])
    return _upfirdn_conv(
        x, jnp.asarray(hp, jnp.float32),
        up=up, down=down, pre=n_pre_remove, n_out=n_out,
    )


def resample(x, sr_in: int, sr_out: int, *, beta: float = 5.0):
    """Convert the last axis from ``sr_in`` to ``sr_out`` Hz.

    ``resample(wav, 48000, 16000)`` is the bridge from session-native
    audio to the 16 kHz ML frontend (``whisper_log_mel``).
    """
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError(f"rates must be positive, got {sr_in}->{sr_out}")
    g = math.gcd(int(sr_in), int(sr_out))
    return resample_poly(x, int(sr_out) // g, int(sr_in) // g, beta=beta)


def resample_streamed(x, sr_in: int, sr_out: int, *, seg_s: float = 30.0,
                      beta: float = 5.0) -> np.ndarray:
    """:func:`resample`, segment-at-a-time: same values, bounded memory.

    Splits the input into fixed ``seg_s``-second segments plus filter
    context on both sides and runs each through :func:`resample_poly`.
    The FIR's input reach from any output sample is bounded by
    ``half_len / up`` and upfirdn is shift-invariant under input shifts
    of ``down`` (output shifts of ``up``), so each segment sees exactly
    the samples the one-shot computation would use; edge segments see
    the same zero extension scipy assumes.  Agreement with the one-shot
    op is bit-for-bit when XLA compiles the same dot order (measured:
    every pure-downsample ratio) and within a few f32 ulp otherwise —
    different conv lengths may reassociate the per-tap sums (pinned in
    tests/test_resample.py).  Every segment has the identical padded length, so
    the whole file runs through ONE compiled conv program with O(seg)
    device memory — the hour-scale converter behind ``msv_tpu
    resample``.  Returns host float32 (..., ceil(n * up / down)).
    """
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError(f"rates must be positive, got {sr_in}->{sr_out}")
    if seg_s <= 0:
        raise ValueError(f"seg_s must be positive, got {seg_s}")
    g = math.gcd(int(sr_in), int(sr_out))
    up, down = int(sr_out) // g, int(sr_in) // g
    x = np.asarray(x, np.float32)
    n_in = x.shape[-1]
    if n_in < 2:
        raise ValueError(f"need at least 2 samples, got {x.shape}")
    if up == 1 and down == 1:
        return x
    n_out = n_in * up // down + bool(n_in * up % down)

    # context (input samples, multiple of `down` so segment-local output
    # offsets stay integral): the filter reaches half_len/up input
    # samples from an output's center; + down covers the decimation
    # grid's worst-case phase
    half_len = 10 * max(up, down)
    ctx = -(-(half_len + down) // up)
    ctx = -(-ctx // down) * down
    seg = max(int(seg_s * sr_in), down)
    seg = -(-seg // down) * down
    if n_in <= seg + 2 * ctx:  # one-shot is already this small
        return np.asarray(resample_poly(x, up, down, beta=beta))

    lead = x.shape[:-1]
    x2 = x.reshape(-1, n_in)
    n_segs = -(-n_in // seg)
    padded = np.zeros((x2.shape[0], ctx + n_segs * seg + ctx), np.float32)
    padded[:, ctx:ctx + n_in] = x2
    out_per_seg = seg * up // down
    o = ctx // down * up
    out = np.empty((x2.shape[0], n_segs * out_per_seg), np.float32)
    for i in range(n_segs):
        y = resample_poly(padded[:, i * seg:(i + 1) * seg + 2 * ctx],
                          up, down, beta=beta)
        out[:, i * out_per_seg:(i + 1) * out_per_seg] = np.asarray(
            y[:, o:o + out_per_seg])
    return out[:, :n_out].reshape(*lead, n_out)
