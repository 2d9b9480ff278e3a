"""Centered STFT (reference: ``perform_stft``, lib.rs:388-471).

Host wrapper + jitted device core.  The device core is a single fused,
statically-shaped computation:

    (N', hop) reshape --t_overlap slices--> frames (n_frames, win)
    frames @ C, frames @ S   (windowed real DFT GEMMs, see ops/dft.py)

Shape bucketing: callers can pad the frame count to a bucket multiple so jit
cache keys stay bounded; invalid tail frames read zero samples and are
sliced/masked downstream.

The reference runs per-frame FFTs on rayon threads when a single track is
added (lib.rs:449-458).  Here frame-parallelism is the MXU batch dimension;
the ``parallel`` knob is accepted for API parity and ignored.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_precision_mode
from ..utils import round_up_to
from .dft import windowed_dft_matrices
from .framing import n_frames_for, reflect_pad_center
from .windows import default_stft_window

FRAME_BUCKET = 256  # jit-cache frame-count granularity


@functools.lru_cache(maxsize=1)
def _complex_transfer_ok() -> bool:
    """Whether this backend can execute + fetch complex64.

    The axon TPU relay raises UNIMPLEMENTED on any complex64 execution
    while reporting platform 'tpu' exactly like healthy hardware — and a
    trial complex op is DESTRUCTIVE there (measured: after the failed op,
    every new program on the client raises), so detection must be
    passive: the axon plugin still appears under its own name in the
    backend registry.  Anything unexpected defaults to True (real
    TPU/CPU/GPU complex support is table stakes).
    """
    if jax.default_backend() != "tpu":
        return True
    try:
        from jax._src import xla_bridge

        return "axon" not in xla_bridge.backends()
    except Exception:
        return True


def frame_device(padded, win: int, hop: int, n_frames: int):
    """Device framing: (n_frames, win) view of a padded 1-D signal.

    With g = gcd(win, hop) the signal reshapes to g-wide rows and the
    t-th piece of every frame is a stride-(hop/g) row slice — zero
    gather, fuses into the following GEMM (TPU gathers run 10-30x
    slower per element than streaming reads).  win % hop == 0 reduces to
    the classic t_overlap slice-concat (g = hop).  A degenerate gcd
    (win/g > 64 slices would bloat the trace) falls back to gather —
    same decomposition as parallel/streaming.py's chunk framing.
    """
    import math

    g = math.gcd(win, hop)
    n_slices = win // g
    if n_slices <= 64:
        rph = hop // g
        n_rows = (n_frames - 1) * rph + n_slices
        x2d = padded[: n_rows * g].reshape(n_rows, g)
        parts = [
            x2d[t : t + (n_frames - 1) * rph + 1 : rph]
            for t in range(n_slices)
        ]
        return jnp.concatenate(parts, axis=1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    return padded[jnp.asarray(idx)]


@functools.partial(jax.jit, static_argnames=("win", "hop", "n_frames", "mode"))
def _stft_core(padded, c, s, *, win: int, hop: int, n_frames: int, mode: str):
    from ..config import precision_for

    frames = frame_device(padded, win, hop, n_frames)
    prec = precision_for(mode)  # static: avoids stale-mode jit caches
    re = jnp.dot(frames, c, precision=prec, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s, precision=prec, preferred_element_type=jnp.float32)
    return re, im


@functools.partial(jax.jit, static_argnames=("win", "hop", "n_frames", "mode"))
def _stft_mag_core(padded, c, s, *, win: int, hop: int, n_frames: int, mode: str):
    re, im = _stft_core(padded, c, s, win=win, hop=hop, n_frames=n_frames,
                        mode=mode)
    return jnp.sqrt(re * re + im * im)


def _prepare(wav, win, hop, n_fft, window, pad_frames_to):
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    if window is None:
        window = default_stft_window(win, n_fft)
    else:
        window = np.ascontiguousarray(window, dtype=np.float32)
        if len(window) != win:
            raise ValueError(
                f"window length {len(window)} != win_length {win} (lib.rs:404)"
            )
    n_frames = n_frames_for(len(wav), win, hop)
    n_frames_pad = round_up_to(max(n_frames, 1), pad_frames_to or 1)
    padded = reflect_pad_center(wav, win)
    need = (n_frames_pad - 1) * hop + win
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))
    c, s = windowed_dft_matrices(window, n_fft)
    return padded, c, s, n_frames, n_frames_pad


def perform_stft(
    wav,
    win_length: int,
    hop_length: int,
    n_fft: int,
    window=None,
    fft_module=None,
    parallel: bool = False,
):
    """Centered STFT -> complex64 (n_frames, n_fft//2+1).

    API-parity port of ``perform_stft`` (lib.rs:388-396): default window is
    periodic hann / n_fft (lib.rs:407 — the 1/n_fft scale lives in the
    window).  ``parallel`` is accepted for parity but meaningless on TPU
    (the MXU batches frames).

    ``fft_module`` mirrors the reference's ``Option<&mut RealFFT>``
    injection slot: pass a callable (or an object with a ``process``
    method, RealFFT's shape) taking the batch of windowed zero-padded
    frames ``(n_frames, n_fft) f32`` and returning the half-spectrum
    ``(n_frames, n_fft//2+1)`` complex — e.g. ``jnp.fft.rfft`` routes the
    transform through XLA's native FFT instead of the default DFT-GEMM.
    The frames handed to it are bit-faithful to the reference's piecewise
    framing (lib.rs:367-435, via ``reference_framing_oracle``).
    """
    del parallel
    if fft_module is not None:
        from .framing import reference_framing_oracle

        w = (np.ascontiguousarray(window, np.float32) if window is not None
             else default_stft_window(win_length, n_fft))
        if len(w) != win_length:
            raise ValueError(
                f"window length {len(w)} != win_length {win_length} "
                "(lib.rs:404)"
            )
        frames = reference_framing_oracle(
            np.ascontiguousarray(wav, np.float32),
            win_length, hop_length, n_fft, w,
        )
        fn = getattr(fft_module, "process", fft_module)
        if not callable(fn):
            raise TypeError(
                "fft_module must be callable or have a .process method"
            )
        out = fn(frames)
        if not isinstance(out, jax.Array):
            out = np.asarray(out)
        want = (frames.shape[0], n_fft // 2 + 1)
        if tuple(out.shape) != want:
            raise ValueError(
                f"fft_module returned shape {tuple(out.shape)}, "
                f"expected {want}"
            )
        if isinstance(out, np.ndarray) and not _complex_transfer_ok():
            # a HOST module's complex result must stay on host on the
            # axon relay: uploading complex64 poisons the client (same
            # hazard the default path's host assembly avoids below)
            return np.ascontiguousarray(out, np.complex64)
        return jnp.asarray(out)
    padded, c, s, n_frames, n_frames_pad = _prepare(
        wav, win_length, hop_length, n_fft, window, None
    )
    re, im = _stft_core(
        jnp.asarray(padded),
        jnp.asarray(c),
        jnp.asarray(s),
        win=win_length,
        hop=hop_length,
        n_frames=n_frames_pad,
        mode=get_precision_mode(),
    )
    if not _complex_transfer_ok():
        # the axon TPU relay cannot execute/transfer complex64 buffers
        # (UNIMPLEMENTED at fetch; discovered driving griffin_lim, and
        # indistinguishable from a healthy TPU by platform name — hence
        # the probe).  The production pipelines are all-real (re/im GEMM
        # pair), so only this parity surface needs complex: assemble it
        # on HOST.
        out = np.empty((n_frames, re.shape[1]), np.complex64)
        out.real = np.asarray(jax.device_get(re[:n_frames]))
        out.imag = np.asarray(jax.device_get(im[:n_frames]))
        return out
    out = jax.lax.complex(re, im)[:n_frames]
    return out


def inverse_stft(
    spec,
    win_length: int,
    hop_length: int,
    n_fft: int,
    window=None,
    length: int | None = None,
):
    """Overlap-add inverse of :func:`perform_stft` -> real signal.

    The reference ships only the raw inverse transform (``InvRealFFT``,
    realfft.rs:166-242, never wired to an istft); this is the full
    synthesis path: inverse rDFT per frame -> crop the centered win_length
    region -> synthesis-window overlap-add -> COLA normalization -> trim
    the reflect-pad half-windows.

    ``window`` defaults to the analysis default (hann/n_fft, lib.rs:407);
    because the forward pass baked 1/n_fft into the window and the inverse
    rDFT applies 1/n_fft again, the OLA normalizer here uses the UNscaled
    hann so the roundtrip is the identity.

    ``spec`` may be complex (n_frames, n_freq), or a ``(re, im)`` pair of
    real arrays — the form to use on the axon TPU relay, which cannot
    execute/transfer complex64 buffers (perform_stft returns host complex
    there; host complex input is split on host, never uploaded).
    """
    from .dft import inverse_rdft, n_pad_split

    if isinstance(spec, tuple):
        spec = (jnp.asarray(spec[0], jnp.float32),
                jnp.asarray(spec[1], jnp.float32))
        n_frames = spec[0].shape[0]
    elif isinstance(spec, np.ndarray):
        # split complex on HOST: uploading complex64 breaks on axon
        spec = (jnp.asarray(np.ascontiguousarray(spec.real, np.float32)),
                jnp.asarray(np.ascontiguousarray(spec.imag, np.float32)))
        n_frames = spec[0].shape[0]
    else:
        spec = jnp.asarray(spec)
        n_frames = spec.shape[0]
    if window is None:
        window = default_stft_window(win_length, n_fft)
    syn = np.ascontiguousarray(window, dtype=np.float32)  # matched window

    # inverse_rdft inverts the unnormalized forward exactly, so each frame
    # comes back as (signal_slice * analysis_window); matched-window OLA
    # (num = r*w, den = OLA(w^2)) then reconstructs the signal identically.
    frames = inverse_rdft(spec, n_fft)
    pl, _ = n_pad_split(n_fft, win_length)
    frames = frames[:, pl : pl + win_length] * jnp.asarray(syn)[None, :]

    total = (n_frames - 1) * hop_length + win_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(win_length)[None, :]
    ).ravel()
    sig = jnp.zeros(total, jnp.float32).at[jnp.asarray(idx)].add(frames.ravel())
    wsq = np.zeros(total, np.float32)
    np.add.at(wsq, idx, np.tile((syn * syn).astype(np.float32), n_frames))
    sig = sig / jnp.asarray(np.maximum(wsq, np.float32(1e-24)))

    half = win_length // 2
    out = sig[half:]
    if length is not None:
        out = out[:length]
    else:
        out = out[: total - 2 * half]
    return out


def stft_magnitude(
    wav,
    win_length: int,
    hop_length: int,
    n_fft: int,
    window=None,
    pad_frames_to: int = FRAME_BUCKET,
):
    """|STFT| with bucketed frame count.

    Returns (mag, n_frames): mag is (n_frames_padded, n_freq) float32 on
    device; rows >= n_frames are garbage from zero-padding and must be
    masked/sliced by the caller (the session does this inside its fused
    pipeline so reductions stay on-device).
    """
    padded, c, s, n_frames, n_frames_pad = _prepare(
        wav, win_length, hop_length, n_fft, window, pad_frames_to
    )
    mag = _stft_mag_core(
        jnp.asarray(padded),
        jnp.asarray(c),
        jnp.asarray(s),
        win=win_length,
        hop=hop_length,
        n_frames=n_frames_pad,
        mode=get_precision_mode(),
    )
    return mag, n_frames
