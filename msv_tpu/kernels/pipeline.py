"""Fused spectrogram + render pipelines (pure JAX/XLA).

This is the TPU-native reshape of the reference's hot path (SURVEY.md §3.1):
where Rust runs per-frame FFTs on rayon threads then a mel GEMM then in-place
dB (lib.rs:112-136), the device here runs ONE jitted program per track:

    framed reshape -> windowed-DFT GEMMs (MXU) -> magnitude (VPU)
    -> mel GEMM (MXU) -> dB (VPU) -> masked min/max reduction

and for rendering (SURVEY.md §3.2):

    normalize+flip+pad (VPU) -> vertical Lanczos GEMM -> clamp
    -> horizontal Lanczos GEMM/banded gather -> clamp -> colormap LUT -> u8

Shapes are statically bucketed (frame count, image width) so the jit cache
stays bounded while zoom varies continuously (SURVEY.md §7 "Static shapes vs
arbitrary zoom").
"""

import functools

import jax
import jax.numpy as jnp

from ..ops.decibel import amp_to_db
from ..ops.stft import frame_device
from ..render.colormap import grey_to_rgb_planar
from ..render.grey import spec_to_grey
from ..render.resize import _apply_banded_cols


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_frames", "use_mel", "mode")
)
def spec_pipeline(padded, c, s, mel_fb, n_valid, *, win, hop, n_frames,
                  use_mel, mode=None, scale=2.0**-15):
    """padded wav -> (spec_db (n_frames, n_out), spec_min, spec_max).

    ``n_frames`` is the bucketed frame count; ``n_valid`` the true one.
    Rows >= n_valid come from zero padding (they dB-floor at -360) and are
    excluded from the min/max reduction; callers treat them as garbage.

    ``mode`` (precision) is STATIC so mode switches get their own compiled
    executable.  None would freeze the trace-time global into the cache
    (set_precision_mode would silently stop working for compiled shapes),
    so callers resolve it via get_precision_mode() BEFORE the call.

    ``scale`` (TRACED — all shifts share one program) is the exact f32
    value of one integer-carrier unit when ``padded`` is int16/int32
    (2^-15 for PCM16, 2^-(bps-1) for high-bps FLAC, 2^-s for detected
    scaled-int floats); ignored for f32 input.

    Equivalent of MultiTrack::calc_spec_of (lib.rs:112-136) + the per-spec
    part of the global dB reduce (lib.rs:194-207).
    """
    from ..config import precision_for

    if mode is None:
        raise ValueError(
            "spec_pipeline requires an explicit precision mode "
            "(pass mode=get_precision_mode())"
        )
    if padded.dtype in (jnp.int16, jnp.int32):
        # integer transfer format: exact power-of-two scaling on device
        # (carrier values are f32-representable by construction, so the
        # astype+multiply reproduces the host f32 mono bit-for-bit)
        padded = padded.astype(jnp.float32) * jnp.float32(scale)
    # fast mode = single-pass MXU (DEFAULT precision) on f32 operands with
    # f32 accumulation.  Explicit bf16 INPUT casts were measured to blow up
    # near-null bins by tens of dB for almost no additional speed (the MXU
    # consumes f32 via bf16 passes either way); precision_for handles it.
    prec = precision_for(mode)
    frames = frame_device(padded, win, hop, n_frames)
    re = jnp.dot(frames, c, precision=prec, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s, precision=prec, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    if use_mel:
        spec = jnp.dot(
            mag, mel_fb, precision=prec, preferred_element_type=jnp.float32
        )
    else:
        spec = mag
    db = amp_to_db(spec)
    fmask = (jnp.arange(n_frames) < n_valid)[:, None]
    smax = jnp.max(jnp.where(fmask, db, -jnp.inf))
    smin = jnp.min(jnp.where(fmask, db, jnp.inf))
    return db, smin, smax


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_frames", "use_mel", "mode")
)
def spec_pipeline_batched(padded_b, c, s, mel_fb, n_valid, *, win, hop,
                          n_frames, use_mel, mode=None, scale=2.0**-15):
    """vmapped spec_pipeline over a leading batch of same-bucket tracks.

    One device launch computes N tracks (the reference's rayon-across-tracks
    granularity, lib.rs:161-167, as an MXU batch dim).  ``scale`` is shared
    by the batch (the session groups tracks by carrier shift).  Returns
    (db (B, n_frames, n_out), smin (B,), smax (B,)).
    """
    if mode is None:
        raise ValueError("spec_pipeline_batched requires an explicit mode")

    def fn(padded, n_v):
        return spec_pipeline(
            padded, c, s, mel_fb, n_v, win=win, hop=hop, n_frames=n_frames,
            use_mel=use_mel, mode=mode, scale=scale,
        )

    return jax.vmap(fn)(padded_b, n_valid)


@functools.partial(
    jax.jit,
    static_argnames=("height", "banded"),
)
def render_rgb(spec_db, max_db, min_db, wv, wh_or_weights, *, height, banded):
    """dB spec -> u8 RGB image (bucketed output size; caller crops).

    wv: dense vertical weights (out_h_b, height).
    wh_or_weights: dense horizontal weights (out_w_b, W_b) when banded=False,
    else a (left (out_w_b,), w (out_w_b, M)) tuple.

    Equivalent of spec_to_grey + grey_to_rgb (display.rs:44-61) with the
    grey cached... except here even the grey lives on device, so a zoom is a
    kernel relaunch, never a host round-trip (SURVEY.md §3.2 key property).
    """
    grey = spec_to_grey(spec_db, max_db, min_db, height=height)  # (H, W_b)
    prec = jax.lax.Precision.HIGHEST
    x = jnp.clip(jnp.dot(wv, grey, precision=prec), 0.0, 1.0)
    if banded:
        left, wb = wh_or_weights
        y = _apply_banded_cols(x, left, wb)
    else:
        y = jnp.dot(x, wh_or_weights.T, precision=prec)
    y = jnp.clip(y, 0.0, 1.0)
    # planar (3, H, W) u8 — dense TPU tiling; the session transposes on host
    return grey_to_rgb_planar(y)


@functools.partial(
    jax.jit,
    static_argnames=("height", "banded", "bits"),
)
def render_grey_q(spec_db, max_db, min_db, wv, wh_or_weights, *, height,
                  banded, bits):
    """Same resize pipeline as :func:`render_rgb`, but the device output is
    the resized grey QUANTIZED to ``bits`` (u8/u16) instead of colormapped
    RGB — 1/3 (u8) or 2/3 (u16) of the wire bytes; the host paints via the
    matching LUT (`render.colormap.paint_grey_wire`).  The interactive
    zoom wall is the image fetch over the relay, not compute (VERDICT r2
    #1), so the wire format IS the latency knob.

    Quantization is round-half-away on [0, 1] grey (values are >= 0, so
    floor(x+0.5) is exact); the deviation from the reference's f32-grey
    colormap (display.rs:56-61) is bounded and pinned in tests.
    """
    grey = spec_to_grey(spec_db, max_db, min_db, height=height)  # (H, W_b)
    prec = jax.lax.Precision.HIGHEST
    x = jnp.clip(jnp.dot(wv, grey, precision=prec), 0.0, 1.0)
    if banded:
        left, wb = wh_or_weights
        y = _apply_banded_cols(x, left, wb)
    else:
        y = jnp.dot(x, wh_or_weights.T, precision=prec)
    y = jnp.clip(y, 0.0, 1.0)
    scale = jnp.float32((1 << bits) - 1)
    q = jnp.floor(y * scale + 0.5)
    return q.astype(jnp.uint8 if bits == 8 else jnp.uint16)
