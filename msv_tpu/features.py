"""Batched log-mel feature extraction — the ML-frontend face of the
pipeline.

The viewer computes spectrograms to LOOK at; models want the same math as
input features.  This module packages the existing TPU ops (framing,
windowed-DFT GEMM, mel GEMM, dB) as a one-call, vmappable, jit-friendly
frontend (cf. the GEMM-native NDFT idea referenced in PAPERS.md): batches
of waveforms in, (B, n_frames, n_mel) log-mel out, everything on the MXU.

Conventions differ from the viewer session on purpose:
  * the analysis window is UNSCALED hann (the session's 1/n_fft scale,
    lib.rs:139, is a viewer normalization choice, not an ML one);
  * mel norm defaults to 'slaney' (librosa-compatible) instead of the
    viewer's 'sum';
  * optional ``top_db`` floor relative to each clip's max, librosa-style.
  * precision defaults to 'fast' (bf16 operands on the MXU — bounded
    under one grey step, measured <=0.22 dB on white noise, ~0.01 dB on
    tonal content; noise at feature scale), unlike the session's 'parity'
    default; pass precision='parity' for bit-faithful dB.

Engine: on TPU (or with the engine forced to 'pallas') amp-dB mel features
run through the fused Pallas kernel (kernels/spectrogram_pallas.py) — the
one measured compute-bound surface where its +39% over the XLA pipeline
lands by default (docs/ARCHITECTURE.md).  The XLA path remains the oracle
and serves every other configuration; set_engine('xla') forces it.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .ops.decibel import amp_to_db
from .ops.dft import windowed_dft_matrices
from .ops.framing import n_frames_for, reflect_pad_center
from .ops.mel import calc_mel_fb
from .ops.stft import frame_device
from .ops.windows import hann
from .utils import next_pow2, round_up_to


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_frames", "log", "mode",
                              "spec")
)
def _features_core(padded_b, c, s, fb, n_valid, *, win, hop, n_frames, log,
                   mode, spec="magnitude"):
    from .config import precision_for

    prec = precision_for(mode)  # static: see config.precision_for docstring

    def one(padded):
        frames = frame_device(padded, win, hop, n_frames)
        re = jnp.dot(frames, c, precision=prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, s, precision=prec,
                     preferred_element_type=jnp.float32)
        if spec == "power":
            # mel on the POWER spectrum (|X|^2 @ fb) — librosa's
            # melspectrogram(power=2.0) convention; NOT the same as
            # squaring the magnitude-mel ((|X| @ fb)^2)
            x = re * re + im * im
        else:
            x = jnp.sqrt(re * re + im * im)
        mel = jnp.dot(x, fb, precision=prec,
                      preferred_element_type=jnp.float32)
        from .ops.decibel import power_to_db

        if log == "amp_db":
            if spec == "power":
                return power_to_db(mel)  # power-domain: 10*log10 IS amp dB
            return amp_to_db(mel)
        elif log == "power_db":
            return power_to_db(mel if spec == "power" else mel * mel)
        elif log == "linear":
            return mel  # raw mel spectrum (PCEN's input)
        return jnp.log(jnp.maximum(mel, 1e-10))  # 'ln'

    return jax.vmap(one)(padded_b)


def log_mel_spectrogram(
    wav,
    sr: int,
    *,
    n_mel: int = 128,
    win_length: int | None = None,
    hop_length: int | None = None,
    n_fft: int | None = None,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    fmin: float = 0.0,
    fmax: float | None = None,
    mel_norm="slaney",
    log: str = "amp_db",
    top_db: float | None = None,
    precision: str | None = None,
    spec: str = "magnitude",
):
    """Batched log-mel features: (T,) or (B, T) -> (B?, n_frames, n_mel).

    Shapes are frame-bucketed internally; the returned array is sliced to
    the exact frame count.  ``log``: 'amp_db' (20·log10 with the exact
    reference floor), 'power_db', or 'ln' (natural log of magnitude).
    ``spec``: 'magnitude' (default — mel weights |X|, the viewer/session
    convention, lib.rs:124) or 'power' (mel weights |X|^2, librosa's
    melspectrogram(power=2.0) convention — what MFCCs are built on).
    ``top_db`` clamps at (max - top_db) PER CLIP, like librosa's
    power_to_db (and the ragged path).
    ``precision``: 'fast' (default — bf16 operands, <=0.22 dB measured)
    or 'parity' (f32 HIGHEST); when None, an explicit session-wide
    set_precision_mode() takes precedence over the 'fast' default.

    ``wav`` may be a DEVICE-resident jax array: padding and frame layout
    then run on device with no host round-trip — the right form inside a
    data pipeline, and the regime where the fused kernel's throughput win
    is visible (host inputs are transfer-bound either way).
    """
    is_dev = isinstance(wav, jax.Array)
    if is_dev:
        wav = jnp.asarray(wav, jnp.float32)
    else:
        wav = np.asarray(wav, dtype=np.float32)
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    if win_length is None:
        win_length = int(round(win_ms * sr / 1000.0))
    if hop_length is None:
        hop_length = int(round(hop_ms * sr / 1000.0))
    if n_fft is None:
        n_fft = next_pow2(win_length)

    window = hann(win_length, False)  # unscaled
    c, s = windowed_dft_matrices(window, n_fft)
    fb = calc_mel_fb(sr, n_fft, n_mel, fmin, fmax, mel_norm, np.float32)

    from .config import (
        get_engine,
        get_precision_mode,
        precision_mode_is_explicit,
    )

    if precision is None:
        # Features default to 'fast' (bounded <= one grey step, measured),
        # but an explicit session-wide set_precision_mode('parity') must
        # win — the global knob is the documented bit-faithfulness switch.
        precision = (
            get_precision_mode() if precision_mode_is_explicit() else "fast"
        )
    if precision not in ("fast", "parity"):
        raise ValueError(f"unknown precision: {precision!r}")

    engine = get_engine()
    # A dp-sharded batch must stay sharded through the fused route (docs/
    # API.md pins "output stays dp-sharded"): a bare per-row kernel launch
    # would gather the batch, so sharded batches run the kernel INSIDE a
    # shard_map over the batch axis — each device processes its local rows
    # and the output keeps the batch sharding.  Only the clean case (1-D
    # NamedSharding on the batch dim, rows divisible by the axis) takes
    # that route; anything fancier falls back to the partitioned XLA path.
    sharded = (
        is_dev
        and getattr(wav, "sharding", None) is not None
        and len(wav.sharding.device_set) > 1
    )
    shard_axis = shard_mesh = None
    if sharded:
        from jax.sharding import NamedSharding

        sh = wav.sharding
        if (
            isinstance(sh, NamedSharding)
            and len(sh.spec) >= 1
            and isinstance(sh.spec[0], str)
            and all(s is None for s in sh.spec[1:])
            and wav.shape[0] % sh.mesh.shape[sh.spec[0]] == 0
        ):
            shard_axis, shard_mesh = sh.spec[0], sh.mesh
    use_pallas = (
        log == "amp_db"
        and spec == "magnitude"
        and win_length % hop_length == 0
        and engine != "xla"
        and (not sharded or shard_axis is not None)
        and (engine == "pallas" or jax.default_backend() == "tpu")
    )

    n_frames = n_frames_for(wav.shape[1], win_length, hop_length)
    # 512-frame buckets on the fused route let the kernel's auto tile_f
    # take the largest VMEM-fitting frame tile
    n_pad = round_up_to(max(n_frames, 1), 512 if use_pallas else 128)
    need = (n_pad - 1) * hop_length + win_length
    half = win_length // 2
    if is_dev:
        # device-side centered reflect pad, same short-signal contract as
        # the host reflect_pad_center (lib.rs:412-433: panics below half+1)
        if wav.shape[1] < half + 1:
            raise ValueError(
                f"signal too short for win_length={win_length}: "
                f"need at least {half + 1} samples, got {wav.shape[1]}"
            )
        padded = jnp.pad(wav, ((0, 0), (half, half)), mode="reflect")
        padded = jnp.pad(
            padded, ((0, 0), (0, max(0, need - padded.shape[1])))
        )[:, :need]
    else:
        padded = np.stack(
            [
                np.pad(
                    reflect_pad_center(w, win_length),
                    (0, max(0, need - (wav.shape[1] + 2 * half))),
                )[:need]
                for w in wav
            ]
        )
    if use_pallas:
        from .kernels.spectrogram_pallas import (
            mel_spectrogram_pallas,
            prepare_matrices,
            prepare_wav2d,
        )

        c3, s3, fb3, _ = prepare_matrices(c, s, fb, win_length)
        c3d, s3d, fb3d = jnp.asarray(c3), jnp.asarray(s3), jnp.asarray(fb3)
        if precision == "fast":
            # bf16 operands: half the kernel's dominant HBM traffic (the
            # C/S/fb re-streaming) and the auto tile_f can then take the
            # 512-frame tile — measured +27% frames/s over tf128 on v5e
            c3d = c3d.astype(jnp.bfloat16)
            s3d = s3d.astype(jnp.bfloat16)
            fb3d = fb3d.astype(jnp.bfloat16)
        interpret = jax.default_backend() != "tpu"

        def _wav2d(w):
            if is_dev:  # device layout prep: no host round-trip
                t_ov = win_length // hop_length
                hop_p = round_up_to(hop_length, 128)
                n_rows = round_up_to(n_pad + t_ov - 1 + 16, 16)
                x = jnp.pad(
                    w, (0, max(0, n_rows * hop_length - w.shape[0]))
                )[: n_rows * hop_length].reshape(n_rows, hop_length)
                return jnp.pad(x, ((0, 0), (0, hop_p - hop_length)))
            return jnp.asarray(
                prepare_wav2d(w, win_length, hop_length, n_pad)
            )

        def _batch(pb):
            # ONE batched launch for all rows: the kernel runs a
            # (B, frame_tiles) grid instead of B separate dispatches
            # (and the resident variant then copies C/S/fb into VMEM
            # once per BATCH, not once per clip)
            wav3d = (jnp.stack([_wav2d(w) for w in pb]) if is_dev
                     else jnp.asarray(np.stack([
                         prepare_wav2d(np.asarray(w), win_length,
                                       hop_length, n_pad) for w in pb])))
            return mel_spectrogram_pallas(
                wav3d,
                c3d,
                s3d,
                fb3d,
                win=win_length,
                hop=hop_length,
                n_frames=n_pad,
                interpret=interpret,
                mode=precision,
            )[:, :, :n_mel]

        if shard_axis is not None:
            # dp scale-out: each device runs ONE batched fused-kernel
            # launch over its local rows; the (replicated) operand
            # closures ride in as constants and the output keeps the
            # batch sharding
            from jax.sharding import PartitionSpec as P

            block = jax.shard_map(
                _batch,
                mesh=shard_mesh,
                in_specs=(P(shard_axis, None),),
                out_specs=P(shard_axis, None, None),
                check_vma=False,
            )
            out = block(padded)[:, :n_frames, :]
        else:
            out = _batch(padded)[:, :n_frames, :]
    else:
        out = _features_core(
            jnp.asarray(padded),
            jnp.asarray(c),
            jnp.asarray(s),
            jnp.asarray(fb),
            jnp.int32(n_frames),
            win=win_length,
            hop=hop_length,
            n_frames=n_pad,
            log=log,
            mode=precision,
            spec=spec,
        )[:, :n_frames, :]
    if top_db is not None:
        # PER-CLIP clamp (librosa semantics, same as the ragged path):
        # a batch-global max would couple a quiet clip's floor to its
        # loudest batchmate — onset envelopes then change with batch
        # composition (review finding, round 4)
        out = jnp.maximum(
            out, jnp.max(out, axis=(-2, -1), keepdims=True) - top_db
        )
    return out[0] if squeeze else out


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_frames", "n_valid", "mode")
)
def _whisper_core(padded_b, c, s, fb, *, win, hop, n_frames, n_valid, mode):
    """Whisper's exact feature math: mel on the POWER spectrum (|X|^2 @
    fb — NOT (|X| @ fb)^2, so it needs its own core), log10 with a 1e-10
    floor, per-clip dynamic-range clamp at max - 8, then (x + 4) / 4."""
    from .config import precision_for

    prec = precision_for(mode)

    def one(padded):
        frames = frame_device(padded, win, hop, n_frames)
        re = jnp.dot(frames, c, precision=prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, s, precision=prec,
                     preferred_element_type=jnp.float32)
        mel = jnp.dot(re * re + im * im, fb, precision=prec,
                      preferred_element_type=jnp.float32)
        log_spec = jnp.log10(jnp.maximum(mel[:n_valid], 1e-10))
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
        return ((log_spec + 4.0) / 4.0).T  # (n_mel, n_valid)

    return jax.vmap(one)(padded_b)


def whisper_log_mel(wav, sr: int = 16000, *, n_mel: int = 80,
                    chunk_length: float = 30.0,
                    precision: str | None = None):
    """Drop-in Whisper input features: (B?, L) 16 kHz mono -> (B?, n_mel,
    3000) f32, numerically matching ``transformers.WhisperFeatureExtractor``
    (pinned in tests/test_features.py against the installed transformers).

    The extractor's contract, TPU-first: clips pad/truncate to 30 s
    (481 frames of silence still produce the -10 -> max-8 clamp floor),
    centered reflect-pad STFT (hann 400, hop 160), the LAST frame dropped
    (3001 -> 3000), mel = power spectrum @ slaney-normed slaney-scale
    filterbank (fmin 0, fmax 8000), log10 clamped at 1e-10, per-CLIP
    clamp at max - 8.0, then (x + 4) / 4.  ``n_mel=128`` gives
    whisper-large-v3 features.  The 30 s chunk makes every call
    identically shaped along time — one compiled program per (n_mel, B),
    so keep the batch size constant in a pipeline (remote TPU compiles
    are slow; same convention as log_mel_spectrogram).

    Unlike :func:`log_mel_spectrogram`, ``precision`` defaults to
    'parity' (f32 HIGHEST): the point of this surface is bit-level
    agreement with the reference extractor; pass precision='fast' for
    bf16 operands when feeding a bf16 model anyway.

    ``wav`` may be a device-resident jax array (padding then runs on
    device with no host round-trip).
    """
    if sr != 16000:
        raise ValueError(
            f"whisper features are defined at 16 kHz, got sr={sr} "
            "(convert first: msv_tpu.resample(wav, sr, 16000))"
        )
    if precision is None:
        precision = "parity"
    if precision not in ("fast", "parity"):
        raise ValueError(f"unknown precision: {precision!r}")
    win, hop, n_fft = 400, 160, 400
    n_samples = int(round(chunk_length * sr))
    n_valid = n_samples // hop  # 3000: whisper drops the last frame

    is_dev = isinstance(wav, jax.Array)
    xp = jnp if is_dev else np
    wav = xp.asarray(wav, xp.float32)
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    if wav.ndim != 2:
        raise ValueError(f"wav must be (L,) or (B, L), got {wav.shape}")
    # pad/truncate to the 30 s chunk (WhisperFeatureExtractor padding=
    # 'max_length', truncation=True)
    if wav.shape[1] >= n_samples:
        wav = wav[:, :n_samples]
    else:
        wav = xp.pad(wav, ((0, 0), (0, n_samples - wav.shape[1])))

    n_frames = n_frames_for(n_samples, win, hop)  # 3001
    n_pad = round_up_to(n_frames, 128)
    need = (n_pad - 1) * hop + win
    half = win // 2
    padded = xp.pad(wav, ((0, 0), (half, half)), mode="reflect")
    padded = xp.pad(padded, ((0, 0), (0, need - padded.shape[1])))

    window = hann(win, False)
    c, s = windowed_dft_matrices(window, n_fft)
    fb = calc_mel_fb(sr, n_fft, n_mel, 0.0, 8000.0, "slaney", np.float32)
    out = _whisper_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        jnp.asarray(fb), win=win, hop=hop, n_frames=n_pad,
        n_valid=n_valid, mode=precision,
    )
    return out[0] if squeeze else out


def log_mel_spectrogram_ragged(wavs, sr: int, *, top_db: float | None = None,
                               **kw):
    """Variable-length clips -> list of (n_frames_i, n_mel) f32 arrays.

    The production data-pipeline form: clips are grouped by exact length,
    so equal-length clips (the common chunked-dataset case) batch into
    one device launch, and odd lengths fall back to singleton calls that
    still reuse the frame-bucketed jit shapes — the compile cache stays
    bounded either way.  ``top_db`` clamps PER CLIP (librosa semantics;
    the fixed-shape batch form clamps at the batch max).  Remaining
    keyword arguments pass through to :func:`log_mel_spectrogram`.
    """
    groups: dict[int, list[int]] = {}
    for i, w in enumerate(wavs):
        if np.ndim(w) != 1:
            raise ValueError(
                f"clip {i} has ndim {np.ndim(w)}; ragged batching takes "
                "1-D mono clips (mix channels first)"
            )
        groups.setdefault(int(np.shape(w)[-1]), []).append(i)
    out = [None] * len(wavs)
    for idxs in groups.values():
        batch = np.stack(
            [np.asarray(wavs[i], dtype=np.float32) for i in idxs]
        )
        feats = np.asarray(log_mel_spectrogram(batch, sr, **kw))
        for j, i in enumerate(idxs):
            f = feats[j]
            if top_db is not None:
                f = np.maximum(f, f.max() - np.float32(top_db))
            out[i] = f
    return out


def _dct2_matrix(n_mfcc: int, n_mel: int, norm: str = "ortho") -> np.ndarray:
    """DCT-II basis as a (n_mel, n_mfcc) f32 GEMM operand.

    ``feats @ D`` equals ``scipy.fft.dct(feats, type=2, norm=norm,
    axis=-1)[..., :n_mfcc]`` (pinned in tests/test_features.py): row n,
    column k holds ``2*cos(pi*k*(2n+1)/(2*n_mel))`` with the orthonormal
    scaling ``sqrt(1/(4N))`` for k=0 and ``sqrt(1/(2N))`` otherwise.
    Built host-side in f64, shipped f32 — a tiny constant per
    (n_mel, n_mfcc) pair.
    """
    n = np.arange(n_mel, dtype=np.float64)[:, None]
    k = np.arange(n_mfcc, dtype=np.float64)[None, :]
    d = 2.0 * np.cos(np.pi * k * (2.0 * n + 1.0) / (2.0 * n_mel))
    if norm == "ortho":
        f = np.full(n_mfcc, np.sqrt(1.0 / (2.0 * n_mel)))
        f[0] = np.sqrt(1.0 / (4.0 * n_mel))
        d = d * f[None, :]
    elif norm is not None:
        raise ValueError(f"unknown dct norm: {norm!r}")
    return d.astype(np.float32)


def mfcc(
    wav,
    sr: int,
    *,
    n_mfcc: int = 13,
    n_mel: int = 128,
    lifter: float = 0.0,
    log: str = "power_db",
    spec: str = "power",
    top_db: float | None = None,
    **mel_kwargs,
):
    """Batched MFCCs: (T,) or (B, T) -> (B?, n_frames, n_mfcc).

    librosa-convention pipeline (librosa is not in this image; the DCT
    stage is pinned against scipy.fft.dct and the mel/dB stages against
    this module's cross-validated log-mel): mel on the POWER spectrum
    (``spec='power'``), ``power_to_db`` (10·log10, amin semantics from
    decibel.rs:33-56), then an orthonormal DCT-II along the mel axis —
    expressed as one (frames, n_mel) x (n_mel, n_mfcc) GEMM so the whole
    chain stays on the MXU.  ``lifter`` applies librosa's sinusoidal
    liftering ``1 + (L/2)·sin(pi·(1..n_mfcc)/L)``.  Remaining keyword
    arguments (win_ms, hop_ms, fmin, fmax, precision, ...) pass through
    to :func:`log_mel_spectrogram`.
    """
    feats = log_mel_spectrogram(
        wav, sr, n_mel=n_mel, log=log, spec=spec, top_db=top_db,
        **mel_kwargs,
    )
    d = jnp.asarray(_dct2_matrix(n_mfcc, n_mel))
    out = jnp.dot(feats, d, preferred_element_type=jnp.float32)
    if lifter:
        if lifter < 0:
            raise ValueError(f"lifter must be >= 0, got {lifter}")
        idx = np.arange(1, n_mfcc + 1, dtype=np.float64)
        li = (1.0 + (lifter / 2.0) * np.sin(np.pi * idx / lifter)).astype(
            np.float32
        )
        out = out * jnp.asarray(li)
    return out


@jax.jit
def _pcen_core(mel, gain, bias, power, eps, b):
    """Smoother + compression on a (B, T, n_mel) mel-power batch.

    The per-band first-order IIR  M[t] = (1-b) M[t-1] + b E[t]  runs as
    a scalar associative scan along the frame axis (log-depth on device;
    the well-conditioned form — see ops/loudness.py::_pole_scan for the
    f32 analysis).  M[0] = E[0]: steady-state init, no attack transient
    at the clip start.  The knobs are TRACED f32 scalars so parameter
    sweeps share one compiled program per shape bucket."""
    # u[0] = E[0], u[t>0] = b*E[t]  ->  y[0] = E[0], the documented init
    u = jnp.concatenate([mel[:, :1], b * mel[:, 1:]], axis=1)
    pv = jnp.concatenate(
        [jnp.zeros_like(mel[:, :1]), jnp.full_like(mel[:, 1:], 1.0 - b)],
        axis=1,
    )

    def combine(l, r):
        pl, ul = l
        pr, ur = r
        return pr * pl, pr * ul + ur

    _, m = jax.lax.associative_scan(combine, (pv, u), axis=1)
    smooth = jnp.exp(-gain * jnp.log(eps + m))
    return (mel * smooth + bias) ** power - bias ** power


def pcen(
    wav,
    sr: int,
    *,
    n_mel: int = 128,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    gain: float = 0.98,
    bias: float = 2.0,
    power: float = 0.5,
    time_constant: float = 0.4,
    eps: float = 1e-6,
    precision: str | None = None,
    **mel_kwargs,
):
    """Per-channel energy normalization: (T,) or (B, T) ->
    (B?, n_frames, n_mel).

    The trainable-frontend normalization (Wang et al. 2017, "Trainable
    frontend for robust and far-field keyword spotting"): an AGC stage
    divides the mel POWER spectrogram by a per-band temporal smoother
    raised to ``gain``, then a root compression
    ``(x + bias)^power - bias^power``.  Loudness-invariant by
    construction — scaling the input by any constant cancels in
    E / M^gain when gain=1 (and nearly so at the 0.98 default), which is
    the property tests pin.

    TPU formulation: the smoother  M[t] = (1-b) M[t-1] + b E[t]  is a
    linear recurrence -> one ``associative_scan`` over the frame axis
    for ALL bands and batch rows at once (the loudness module's
    well-conditioned scalar form), with ``M[0] = E[0]`` steady-state
    init (documented here because it IS the oracle contract).  The
    smoothing coefficient derives from ``time_constant`` seconds as
    ``b = (sqrt(1 + 4 t^2) - 1) / (2 t^2)`` with ``t = time_constant *
    sr / hop_length`` (the standard equivalent-delay mapping).
    ``**mel_kwargs`` pass through to :func:`log_mel_spectrogram`
    (fmin/fmax/win_length/...).
    """
    if not 0.0 <= gain <= 1.0:
        raise ValueError(f"gain must be in [0, 1], got {gain}")
    if bias < 0 or eps <= 0 or power <= 0 or time_constant <= 0:
        raise ValueError(
            f"need bias >= 0, eps > 0, power > 0, time_constant > 0: "
            f"{bias}, {eps}, {power}, {time_constant}"
        )
    hop_length = mel_kwargs.get("hop_length") or int(
        round(hop_ms * sr / 1000.0))
    mel = log_mel_spectrogram(
        wav, sr, n_mel=n_mel, win_ms=win_ms, hop_ms=hop_ms,
        spec="power", log="linear", precision=precision, **mel_kwargs,
    )
    squeeze = mel.ndim == 2
    if squeeze:
        mel = mel[None]
    t = time_constant * sr / hop_length
    b = (math.sqrt(1.0 + 4.0 * t * t) - 1.0) / (2.0 * t * t)
    f32 = jnp.float32
    out = _pcen_core(mel, f32(gain), f32(bias), f32(power), f32(eps),
                     f32(b))
    return out[0] if squeeze else out


def delta(feats, *, width: int = 9, order: int = 1, axis: int = -2):
    """Local polynomial-fit derivative of a feature sequence — a
    Savitzky-Golay filter with ``polyorder = deriv = order`` over an odd
    ``width``-frame window (librosa.feature.delta's parameterization),
    with replicated edges (scipy's ``mode='nearest'``; equality with
    ``scipy.signal.savgol_filter`` is pinned in tests/test_features.py).
    Runs as a batched convolution on device.

    ``feats``: (..., n_frames, n_feat) by default (``axis=-2`` is the
    frame axis, matching this module's outputs).
    """
    if width < 3 or width % 2 != 1:
        raise ValueError(f"width must be an odd integer >= 3, got {width}")
    if order < 1 or order >= width:
        raise ValueError(f"order must be in [1, width), got {order}")
    from scipy.signal import savgol_coeffs

    # savgol_coeffs returns the kernel ordered for convolution (use='conv'
    # default) — jnp.convolve applies the same flip scipy's convolve1d
    # does, so the coefficients pass through unreversed
    k = savgol_coeffs(width, order, deriv=order,
                      delta=1.0).astype(np.float32)
    x = jnp.asarray(feats, jnp.float32)
    x = jnp.moveaxis(x, axis, -1)  # (..., n_feat, n_frames)
    half = width // 2
    xp = jnp.concatenate(
        [jnp.repeat(x[..., :1], half, axis=-1), x,
         jnp.repeat(x[..., -1:], half, axis=-1)], axis=-1
    )
    lead = xp.shape[:-1]
    y = jax.vmap(lambda r: jnp.convolve(r, jnp.asarray(k), mode="valid"))(
        xp.reshape(-1, xp.shape[-1])
    ).reshape(*lead, x.shape[-1])
    return jnp.moveaxis(y, -1, axis)


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_frames", "mode", "sr",
                              "rolloff_pct")
)
def _spectral_core(padded_b, c, s, *, win, hop, n_frames, mode, sr,
                   rolloff_pct):
    from .config import precision_for

    prec = precision_for(mode)
    n_freq = c.shape[1]
    freqs = jnp.arange(n_freq, dtype=jnp.float32) * (sr / 2.0) / (n_freq - 1)

    def one(padded):
        frames = frame_device(padded, win, hop, n_frames)
        re = jnp.dot(frames, c, precision=prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, s, precision=prec,
                     preferred_element_type=jnp.float32)
        p = re * re + im * im  # power spectrum (n_frames, n_freq)
        tot = jnp.sum(p, axis=1)
        safe = jnp.maximum(tot, 1e-20)
        centroid = jnp.sum(p * freqs, axis=1) / safe
        spread = jnp.sum(p * (freqs - centroid[:, None]) ** 2, axis=1) / safe
        bandwidth = jnp.sqrt(spread)
        # rolloff: lowest frequency where cumulative power >= pct * total
        cum = jnp.cumsum(p, axis=1)
        hit = cum >= (rolloff_pct * tot)[:, None]
        idx = jnp.argmax(hit, axis=1)  # first True (all-False -> 0: tot=0)
        rolloff = freqs[idx]
        # flatness: geometric / arithmetic mean of the power spectrum
        amin = 1e-10
        gm = jnp.exp(jnp.mean(jnp.log(jnp.maximum(p, amin)), axis=1))
        am = jnp.mean(jnp.maximum(p, amin), axis=1)
        flatness = gm / am
        # frame RMS and zero-crossing rate from the raw frames
        rms = jnp.sqrt(jnp.mean(frames * frames, axis=1))
        sgn = jnp.where(frames >= 0, 1.0, -1.0)
        crossings = jnp.sum(jnp.abs(sgn[:, 1:] - sgn[:, :-1]) * 0.5, axis=1)
        zcr = crossings * (sr / win)  # crossings per second
        return jnp.stack(
            [centroid, bandwidth, rolloff, flatness, rms, zcr], axis=1
        )

    return jax.vmap(one)(padded_b)


SPECTRAL_FEATURE_NAMES = (
    "centroid_hz", "bandwidth_hz", "rolloff_hz", "flatness", "rms",
    "zcr_hz",
)


def spectral_features(
    wav,
    sr: int,
    *,
    win_length: int | None = None,
    hop_length: int | None = None,
    n_fft: int | None = None,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    rolloff_pct: float = 0.85,
    precision: str | None = None,
):
    """Per-frame spectral descriptors: (T,) or (B, T) -> (B?, n_frames, 6).

    Columns (``SPECTRAL_FEATURE_NAMES``): power-weighted spectral
    centroid and bandwidth (Hz), ``rolloff_pct`` spectral rolloff (Hz),
    spectral flatness (geometric/arithmetic mean of power, in (0, 1]),
    frame RMS, and zero-crossing rate (crossings/s).  One framing + one
    windowed-DFT GEMM feeds all six — the classic descriptor set
    (librosa.feature.spectral_* equivalents; librosa is not in this
    image, so each column is pinned against a from-scratch numpy oracle
    in tests/test_features.py).  Framing/windowing conventions match
    :func:`log_mel_spectrogram` (centered, reflect-padded, unscaled
    periodic hann).
    """
    is_dev = isinstance(wav, jax.Array)
    wav = (jnp.asarray(wav, jnp.float32) if is_dev
           else np.asarray(wav, dtype=np.float32))
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    if win_length is None:
        win_length = int(round(win_ms * sr / 1000.0))
    if hop_length is None:
        hop_length = int(round(hop_ms * sr / 1000.0))
    if n_fft is None:
        n_fft = next_pow2(win_length)
    if not (0.0 < rolloff_pct <= 1.0):
        raise ValueError(f"rolloff_pct must be in (0, 1], got {rolloff_pct}")
    from .config import get_precision_mode, precision_mode_is_explicit

    if precision is None:
        precision = (
            get_precision_mode() if precision_mode_is_explicit() else "fast"
        )
    if precision not in ("fast", "parity"):
        raise ValueError(f"unknown precision: {precision!r}")

    window = hann(win_length, False)
    c, s = windowed_dft_matrices(window, n_fft)
    n_frames = n_frames_for(wav.shape[1], win_length, hop_length)
    n_pad = round_up_to(max(n_frames, 1), 128)
    padded = _pad_batch(wav, win_length, hop_length, n_pad, is_dev)
    out = _spectral_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        win=win_length, hop=hop_length, n_frames=n_pad, mode=precision,
        sr=sr, rolloff_pct=float(rolloff_pct),
    )[:, :n_frames, :]
    return out[0] if squeeze else out


def _pad_batch(wav, win_length: int, hop_length: int, n_pad: int,
               is_dev: bool):
    """Centered reflect pad + zero-extend a (B, T) batch to the bucketed
    frame count's sample need (shared by the feature cores)."""
    need = (n_pad - 1) * hop_length + win_length
    half = win_length // 2
    if is_dev:
        if wav.shape[1] < half + 1:
            raise ValueError(
                f"signal too short for win_length={win_length}: "
                f"need at least {half + 1} samples, got {wav.shape[1]}"
            )
        padded = jnp.pad(wav, ((0, 0), (half, half)), mode="reflect")
        return jnp.pad(
            padded, ((0, 0), (0, max(0, need - padded.shape[1])))
        )[:, :need]
    return np.stack(
        [
            np.pad(
                reflect_pad_center(w, win_length),
                (0, max(0, need - (wav.shape[1] + 2 * half))),
            )[:need]
            for w in wav
        ]
    )


def _contrast_bands(sr: int, n_fft: int, fmin: float, n_bands: int,
                    quantile: float):
    """Static octave-band slices for :func:`spectral_contrast`.

    Host-side derivation (band edges are data-independent, so the device
    core sees them as static slice bounds): band k spans
    ``[fmin * 2^(k-1), fmin * 2^k]`` Hz (band 0 starts at 0).  Following
    the classic formulation (Jiang 2002 / librosa.feature
    .spectral_contrast), band k > 0 also includes the bin just below its
    first, the top band extends to Nyquist, the quantile count is taken
    on that widened width, and every band but the top drops its last bin
    before the quantile means.  Returns ``((start, stop, q), ...)``.
    """
    n_freq = n_fft // 2 + 1
    freq = np.arange(n_freq) * (sr / n_fft)
    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))
    if np.any(octa[:-1] >= 0.5 * sr):
        raise ValueError(
            f"octave bands exceed Nyquist: fmin={fmin}, n_bands={n_bands} "
            f"needs sr > {2 * octa[-2]:g}")
    bands = []
    for k in range(n_bands + 1):
        idx = np.flatnonzero((freq >= octa[k]) & (freq <= octa[k + 1]))
        if idx.size == 0:
            raise ValueError(
                f"octave band {k} ({octa[k]:g}-{octa[k + 1]:g} Hz) has no "
                f"FFT bins; increase n_fft or lower fmin")
        start = idx[0] - 1 if k > 0 else idx[0]
        full_stop = n_freq if k == n_bands else idx[-1] + 1
        q = max(1, int(np.rint(quantile * (full_stop - start))))
        stop = full_stop if k == n_bands else full_stop - 1  # drop last bin
        bands.append((int(start), int(max(stop, start + 1)), int(q)))
    return tuple(bands)


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_frames", "mode", "bands",
                              "linear")
)
def _contrast_core(padded_b, c, s, *, win, hop, n_frames, mode, bands,
                   linear):
    from .config import precision_for

    prec = precision_for(mode)
    amin = 1e-10

    def one(padded):
        frames = frame_device(padded, win, hop, n_frames)
        re = jnp.dot(frames, c, precision=prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, s, precision=prec,
                     preferred_element_type=jnp.float32)
        mag = jnp.sqrt(re * re + im * im)  # magnitude, per the classic spec
        cols = []
        for start, stop, q in bands:
            srt = jnp.sort(mag[:, start:stop], axis=1)
            valley = jnp.maximum(jnp.mean(srt[:, :q], axis=1), amin)
            peak = jnp.maximum(jnp.mean(srt[:, -q:], axis=1), amin)
            if linear:
                cols.append(peak / valley)
            else:
                cols.append(10.0 * (jnp.log10(peak) - jnp.log10(valley)))
        return jnp.stack(cols, axis=1)

    return jax.vmap(one)(padded_b)


def spectral_contrast(
    wav,
    sr: int,
    *,
    win_length: int | None = None,
    hop_length: int | None = None,
    n_fft: int | None = None,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    fmin: float = 200.0,
    n_bands: int = 6,
    quantile: float = 0.02,
    linear: bool = False,
    precision: str | None = None,
):
    """Octave-band spectral contrast: (T,) or (B, T) -> (B?, n_frames,
    n_bands + 1).

    Per frame and octave band (band 0 = [0, fmin], band k = one octave
    up each), the contrast between the strongest and weakest spectral
    content: sort the band's magnitude bins, average the top and bottom
    ``quantile`` fractions, and report ``10*log10(peak/valley)`` dB
    (``linear=True`` returns the raw ratio) — the Jiang 2002 feature,
    librosa.feature.spectral_contrast-equivalent (librosa is not in this
    image; the whole path is pinned against a from-scratch numpy oracle
    in tests/test_features.py, plus tone-vs-noise semantics).  Unlike
    librosa there is NO top_db display clamp: that clamp couples every
    value to the array's global max (the same batch-coupling this
    frontend already rejects for log-mel's top_db).  Framing/windowing
    conventions match :func:`log_mel_spectrogram` (centered,
    reflect-padded, unscaled periodic hann).
    """
    is_dev = isinstance(wav, jax.Array)
    wav = (jnp.asarray(wav, jnp.float32) if is_dev
           else np.asarray(wav, dtype=np.float32))
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    if win_length is None:
        win_length = int(round(win_ms * sr / 1000.0))
    if hop_length is None:
        hop_length = int(round(hop_ms * sr / 1000.0))
    if n_fft is None:
        n_fft = next_pow2(win_length)
    if not (0.0 < quantile < 1.0):
        raise ValueError(f"quantile must be in (0, 1), got {quantile}")
    if n_bands < 1:
        raise ValueError(f"n_bands must be >= 1, got {n_bands}")
    if fmin <= 0:
        raise ValueError(f"fmin must be > 0, got {fmin}")
    from .config import get_precision_mode, precision_mode_is_explicit

    if precision is None:
        precision = (
            get_precision_mode() if precision_mode_is_explicit() else "fast"
        )
    if precision not in ("fast", "parity"):
        raise ValueError(f"unknown precision: {precision!r}")

    bands = _contrast_bands(sr, n_fft, float(fmin), int(n_bands),
                            float(quantile))
    window = hann(win_length, False)
    c, s = windowed_dft_matrices(window, n_fft)
    n_frames = n_frames_for(wav.shape[1], win_length, hop_length)
    n_pad = round_up_to(max(n_frames, 1), 128)
    padded = _pad_batch(wav, win_length, hop_length, n_pad, is_dev)
    out = _contrast_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        win=win_length, hop=hop_length, n_frames=n_pad, mode=precision,
        bands=bands, linear=bool(linear),
    )[:, :n_frames, :]
    return out[0] if squeeze else out


def chroma_filterbank(
    sr: int,
    n_fft: int,
    *,
    n_chroma: int = 12,
    tuning: float = 0.0,
    ctroct: float = 5.0,
    octwidth: float = 2.0,
    base_c: bool = True,
) -> np.ndarray:
    """Chroma (pitch-class) filterbank -> (n_fft//2+1, n_chroma) f32.

    Host-side constant builder in the repo convention (bins as ROWS so
    application is one ``spec @ fb`` GEMM).  The design follows the
    classic Ellis chromagram (librosa.filters.chroma; librosa is not in
    this image): each FFT bin's pitch measured in fractional chroma bins
    above A0 (27.5 Hz), a Gaussian of one-bin-gap width around each of
    the ``n_chroma`` classes with wrap-around distance, per-bin L2
    normalization, and a log-frequency Gaussian envelope centered
    ``ctroct`` octaves up (soft-ignores very low/high bins).  ``base_c``
    rotates class 0 to C (otherwise A).
    """
    if n_chroma < 2:
        raise ValueError(f"n_chroma must be >= 2, got {n_chroma}")
    n_freq = n_fft // 2 + 1
    freqs = np.arange(1, n_fft, dtype=np.float64) * sr / n_fft  # skip DC
    a0 = 27.5 * 2.0 ** (tuning / n_chroma)
    frqbins = n_chroma * np.log2(freqs / a0)
    frqbins = np.concatenate([[frqbins[0] - 1.5 * n_chroma], frqbins])
    binwidth = np.concatenate(
        [np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]]
    )
    d = frqbins[None, :] - np.arange(n_chroma, dtype=np.float64)[:, None]
    half = round(n_chroma / 2)
    d = np.remainder(d + half + 10 * n_chroma, n_chroma) - half
    wts = np.exp(-0.5 * (2.0 * d / binwidth[None, :]) ** 2)
    wts /= np.maximum(np.sqrt((wts**2).sum(axis=0)), 1e-30)[None, :]
    if octwidth is not None and octwidth > 0:
        wts *= np.exp(
            -0.5 * ((frqbins / n_chroma - ctroct) / octwidth) ** 2
        )[None, :]
    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(wts[:, :n_freq].T, dtype=np.float32)


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_frames", "mode", "norm")
)
def _chroma_core(padded_b, c, s, fb, *, win, hop, n_frames, mode, norm):
    from .config import precision_for

    prec = precision_for(mode)

    def one(padded):
        frames = frame_device(padded, win, hop, n_frames)
        re = jnp.dot(frames, c, precision=prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, s, precision=prec,
                     preferred_element_type=jnp.float32)
        ch = jnp.dot(re * re + im * im, fb, precision=prec,
                     preferred_element_type=jnp.float32)
        if norm == "inf":
            ch = ch / jnp.maximum(ch.max(axis=-1, keepdims=True), 1e-30)
        elif norm == "l2":
            ch = ch / jnp.maximum(
                jnp.sqrt((ch * ch).sum(axis=-1, keepdims=True)), 1e-30
            )
        return ch

    return jax.vmap(one)(padded_b)


def chroma_stft(
    wav,
    sr: int,
    *,
    n_chroma: int = 12,
    win_length: int | None = None,
    hop_length: int | None = None,
    n_fft: int | None = None,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    tuning: float = 0.0,
    norm: str = "inf",
    precision: str | None = None,
):
    """Chromagram: (T,) or (B, T) -> (B?, n_frames, n_chroma).

    Power spectrum projected onto pitch classes (one more GEMM after the
    windowed-DFT pair) and normalized per frame (``norm``: 'inf' — the
    librosa default, each frame's max is 1 — 'l2', or 'none').  Class 0
    is C.  Framing/windowing conventions match
    :func:`log_mel_spectrogram` (centered, reflect-padded, unscaled
    periodic hann); pinned against a from-scratch numpy oracle and
    pitch-class semantics in tests/test_features.py.
    """
    is_dev = isinstance(wav, jax.Array)
    wav = (jnp.asarray(wav, jnp.float32) if is_dev
           else np.asarray(wav, dtype=np.float32))
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    if win_length is None:
        win_length = int(round(win_ms * sr / 1000.0))
    if hop_length is None:
        hop_length = int(round(hop_ms * sr / 1000.0))
    if n_fft is None:
        n_fft = next_pow2(win_length)
    if norm not in ("inf", "l2", "none"):
        raise ValueError(f"unknown norm: {norm!r}")
    from .config import get_precision_mode, precision_mode_is_explicit

    if precision is None:
        precision = (
            get_precision_mode() if precision_mode_is_explicit() else "fast"
        )
    if precision not in ("fast", "parity"):
        raise ValueError(f"unknown precision: {precision!r}")

    window = hann(win_length, False)
    c, s = windowed_dft_matrices(window, n_fft)
    fb = chroma_filterbank(sr, n_fft, n_chroma=n_chroma, tuning=tuning)
    n_frames = n_frames_for(wav.shape[1], win_length, hop_length)
    n_pad = round_up_to(max(n_frames, 1), 128)
    padded = _pad_batch(wav, win_length, hop_length, n_pad, is_dev)
    out = _chroma_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        jnp.asarray(fb), win=win_length, hop=hop_length, n_frames=n_pad,
        mode=precision, norm=norm,
    )[:, :n_frames, :]
    return out[0] if squeeze else out


def onset_strength(
    wav,
    sr: int,
    *,
    n_mel: int = 128,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    lag: int = 1,
    precision: str | None = None,
):
    """Spectral-flux onset envelope: (T,) or (B, T) -> (B?, n_frames).

    Mean over mel bands of the positive log-power increase
    ``max(0, dB[t] - dB[t - lag])`` (the classic superflux-family
    novelty; a global level change shifts both terms, so the reference
    choice cancels).  Stays on device until fetched.  First ``lag``
    frames are 0.
    """
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    # top_db=80 is load-bearing: without the clamp, near-floor mel bands
    # wobble by tens of dB frame-to-frame (log of leakage noise) and the
    # band-mean flux of a STEADY tone drowns real onsets
    s_db = log_mel_spectrogram(
        wav, sr, n_mel=n_mel, win_ms=win_ms, hop_ms=hop_ms,
        spec="power", log="power_db", top_db=80.0, precision=precision,
    )
    diff = jnp.maximum(
        s_db[..., lag:, :] - s_db[..., :-lag, :], 0.0
    ).mean(axis=-1)
    pad = [(0, 0)] * (diff.ndim - 1) + [(lag, 0)]
    env = jnp.pad(diff, pad)
    # frames whose window crosses the signal END see the reflection's
    # time-reversal corner — a broadband burst that reads as a large
    # fake onset (measured: the final frame of a steady tone dominates
    # the whole envelope).  Zero them; the matching START corner is the
    # genuine signal-begins onset and stays.
    n = wav.shape[-1] if hasattr(wav, "shape") else len(wav)
    win = int(round(win_ms * sr / 1000.0))
    hop = int(round(hop_ms * sr / 1000.0))
    first_bad = max(0, int(np.floor((n - win / 2) / hop)) + 1)
    if first_bad < env.shape[-1]:
        mask = (jnp.arange(env.shape[-1]) < first_bad)
        env = env * mask.astype(env.dtype)
    return env


def _peak_pick(env: np.ndarray, pre_max: int, post_max: int, pre_avg: int,
               post_avg: int, delta: float, wait: int) -> np.ndarray:
    """Greedy novelty peak picking (the standard librosa-style rule):
    a frame is an onset iff it is the max of [i-pre_max, i+post_max],
    exceeds the local mean of [i-pre_avg, i+post_avg] by ``delta``, and
    is at least ``wait`` frames after the previous onset.  Host-side —
    the envelope is tiny and the wait rule is inherently greedy."""
    n = len(env)
    idx = []
    last = -(wait + 1)
    for i in range(n):
        seg = env[max(0, i - pre_max): i + post_max + 1]
        if env[i] < seg.max():
            continue
        ref = env[max(0, i - pre_avg): i + post_avg + 1].mean()
        if env[i] >= ref + delta and i - last > wait:
            idx.append(i)
            last = i
    return np.asarray(idx, np.int64)


def onset_detect(
    wav,
    sr: int,
    *,
    n_mel: int = 128,
    win_ms: float = 25.0,
    hop_ms: float = 10.0,
    delta: float = 3.0,
    units: str = "time",
    precision: str | None = None,
):
    """Onset times: (T,) -> 1-D array of seconds (``units='frames'``
    for frame indices).

    :func:`onset_strength` (device) followed by greedy peak picking
    with the standard 30 ms max / 100 ms mean / 30 ms wait windows
    (host — the envelope is a few KB).  ``delta`` is ABSOLUTE, in the
    envelope's units (mean positive dB rise per band): real onsets
    measure tens of dB while a steady tone's frame-to-frame leakage
    wobble stays ~1 dB, so the 3 dB default separates them — a
    max-normalized threshold would amplify that wobble to full scale
    exactly when the signal has no real onsets.  Pinned on click
    trains and steady tones in tests/test_features.py.
    """
    if units not in ("time", "frames"):
        raise ValueError(f"units must be 'time'|'frames': {units!r}")
    env = np.asarray(onset_strength(
        wav, sr, n_mel=n_mel, win_ms=win_ms, hop_ms=hop_ms,
        precision=precision,
    ))
    if env.ndim != 1:
        raise ValueError("onset_detect takes a single (T,) signal")
    hop_s = hop_ms / 1000.0
    to_frames = lambda sec: max(1, int(round(sec / hop_s)))  # noqa: E731
    idx = _peak_pick(env, pre_max=to_frames(0.03), post_max=to_frames(0.0),
                     pre_avg=to_frames(0.1), post_avg=to_frames(0.1),
                     delta=delta, wait=to_frames(0.03))
    if units == "frames":
        return idx
    return idx.astype(np.float64) * hop_s


def analyze(wav, sr: int) -> dict:
    """One mono (T,) signal -> the full analysis report dict.

    Runs the whole analysis stack — BS.1770 loudness, tempo + beat
    count, Krumhansl-Schmuckler key, structure boundaries, onsets,
    Viterbi-decoded pitch/voicing, spectral descriptor medians over
    NON-SILENT frames, RMS-gated active span — every field from an
    oracle-pinned op.  Shared by ``msv_tpu analyze`` and the viewer's
    ``/api/analyze/<id>``; JSON-serializable output."""
    from .ops.declick import find_clicks
    from .ops.effects import trim
    from .ops.loudness import r128_stats
    from .ops.rhythm import beat_track
    from .ops.segment import segment
    from .ops.sequence import yin_smoothed
    from .ops.tonal import estimate_key

    dur = len(wav) / sr
    r128 = r128_stats(wav, sr)
    bpm, beats = beat_track(wav, sr)
    tonic, mode, r, _ = estimate_key(wav, sr)
    bounds = segment(wav, sr) if dur >= 4.0 else np.empty(0)
    onsets = onset_detect(wav, sr)
    fmax = min(2093.0, sr / 2.0 * 0.99)
    f0, voiced = yin_smoothed(wav, sr, fmax=fmax)
    spec = np.asarray(spectral_features(wav, sr))
    # descriptor medians over NON-SILENT frames (same -60 dB gate as
    # split): a sparse signal's median frame is silence, whose zero
    # centroid/flatness describe nothing
    act = spec[:, 4] > spec[:, 4].max() * 10.0 ** (-60.0 / 20.0)
    spec = spec[act] if act.any() else spec
    _, (a, b) = trim(wav, sr)
    return {
        "duration_s": round(dur, 3),
        "loudness_lufs": r128["lufs"],
        "loudness_range_lu": r128["lra"],
        "true_peak_dbtp": r128["dbtp"],
        "tempo_bpm": round(float(bpm), 1),
        "n_beats": int(len(beats)),
        "key": None if tonic is None else {
            "tonic": tonic, "mode": mode, "r": round(float(r), 3)},
        "segments_s": [round(float(v), 3) for v in bounds],
        "n_onsets": int(len(onsets)),
        "voiced_fraction": round(float(voiced.mean()), 3)
        if len(voiced) else 0.0,
        "f0_median_hz": (round(float(np.median(f0[voiced])), 1)
                         if voiced.any() else None),
        "spectral": {
            "centroid_hz": round(float(np.median(spec[:, 0])), 1),
            "flatness": round(float(np.median(spec[:, 3])), 4),
            "rms": round(float(np.median(spec[:, 4])), 5),
        },
        "active_s": [round(a / sr, 3), round(b / sr, 3)],
        # defect scan (ops/declick.py): contrast-gated LPC click
        # detection; a clean recording reports 0 or a handful.  Skipped
        # (None) past 10 minutes — the two-pass AR fit over an hour
        # track would dominate the whole report's wall
        "n_clicks": (int(len(find_clicks(
            np.asarray(wav, np.float32), sr))) if dur <= 600.0 else None),
    }
