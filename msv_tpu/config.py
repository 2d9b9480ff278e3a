"""Settings & derived STFT parameters (SURVEY.md §5.f).

Mirrors the reference's ``SpecSetting`` struct (lib.rs:64-70) with the
hard-coded defaults from ``MultiTrack::new`` (lib.rs:93-99):
win_ms=40, t_overlap=4, f_overlap=1, freq_scale=Mel, db_range=120.

The per-track parameter derivation follows ``AudioTrack::new`` (lib.rs:43-46)
*exactly*, including its f32 arithmetic and Rust round-half-away-from-zero:

    win_length = win_ms * sr / 1000                       (f32)
    hop_length = round(win_length / t_overlap)            (f32 round -> usize)
    win_length = hop_length * t_overlap                   (exact int)
    n_fft      = next_pow2(win_length) * f_overlap

Note the guarantee ``win_length % hop_length == 0`` — the device framing
kernels exploit it (frames become t_overlap static slices of a (N, hop)
reshape; no gather needed).
"""

from dataclasses import dataclass
from enum import Enum

import numpy as np

from .utils import next_pow2


class FreqScale(Enum):
    """Frequency axis scaling (reference: ``FreqScale``, lib.rs:25-28)."""

    LINEAR = "linear"
    MEL = "mel"


@dataclass(frozen=True)
class SpecSetting:
    """Spectrogram settings (reference: ``SpecSetting``, lib.rs:64-70)."""

    win_ms: float = 40.0
    t_overlap: int = 4
    f_overlap: int = 1
    freq_scale: FreqScale = FreqScale.MEL
    db_range: float = 120.0


@dataclass(frozen=True)
class StftParams:
    """Derived per-sample-rate STFT parameters (lib.rs:43-46)."""

    sr: int
    win_length: int
    hop_length: int
    n_fft: int

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1


def derive_stft_params(sr: int, setting: SpecSetting) -> StftParams:
    """Replicates AudioTrack::new's derivation (lib.rs:43-46) in f32.

    Examples under defaults (40 ms, x4, x1):
      8000  -> win 320,  hop 80,  n_fft 512
      16000 -> win 640,  hop 160, n_fft 1024
      22050 -> win 884,  hop 221, n_fft 1024   (882/4 = 220.5 rounds away -> 221)
      24000 -> win 960,  hop 240, n_fft 1024
      44100 -> win 1764, hop 441, n_fft 2048
      48000 -> win 1920, hop 480, n_fft 2048
    """
    f32 = np.float32
    win_f = f32(setting.win_ms) * f32(sr) / f32(1000.0)
    hop_f = win_f / f32(setting.t_overlap)
    # Rust f32::round — half away from zero — then `as usize` truncation.
    hop = int(np.floor(hop_f + f32(0.5))) if hop_f >= 0 else 0
    win = hop * setting.t_overlap
    n_fft = next_pow2(win) * setting.f_overlap
    return StftParams(sr=int(sr), win_length=win, hop_length=hop, n_fft=n_fft)


# Precision mode for the device compute path.
#   "parity": f32 matmuls at HIGHEST precision — bit-faithful dB values,
#             used by all parity tests and default sessions.
#   "fast":   bf16 matmul inputs with f32 accumulation — ~2x MXU rate;
#             dB error ~0.04 dB, well under one grey quantization step
#             (db_range 120 / 255 levels = 0.47 dB).
_PRECISION_MODE = "parity"
_PRECISION_MODE_EXPLICIT = False


def set_precision_mode(mode: str) -> None:
    """Set the session-wide precision mode.

    NOTE: this also LATCHES the mode as user-chosen for the rest of the
    process — surfaces with their own defaults (the ML frontend defaults
    to 'fast') defer to the session mode once the knob was explicitly
    set, even if it is later set back to the startup value.  For a
    temporary change (e.g. a tool forcing 'parity' around one call) use
    :func:`precision_mode_scope`, which restores both the mode and the
    latch; :func:`reset_precision_mode` clears the latch entirely.
    """
    global _PRECISION_MODE, _PRECISION_MODE_EXPLICIT
    if mode not in ("parity", "fast"):
        raise ValueError(f"unknown precision mode: {mode!r}")
    _PRECISION_MODE = mode
    _PRECISION_MODE_EXPLICIT = True


def reset_precision_mode() -> None:
    """Restore the startup default ('parity') and clear the explicit
    latch, so surfaces with their own defaults behave as at startup."""
    global _PRECISION_MODE, _PRECISION_MODE_EXPLICIT
    _PRECISION_MODE = "parity"
    _PRECISION_MODE_EXPLICIT = False


class precision_mode_scope:
    """Context manager: set the precision mode for a block, then restore
    BOTH the previous mode and the explicit latch — a transient
    set/restore cycle must not permanently change feature defaults
    session-wide (a bare set_precision_mode pair would leave the latch
    stuck and flip the ML frontend's default from 'fast' to the session
    mode forever)."""

    def __init__(self, mode: str):
        self._mode = mode

    def __enter__(self):
        self._saved = (_PRECISION_MODE, _PRECISION_MODE_EXPLICIT)
        set_precision_mode(self._mode)
        return self

    def __exit__(self, *exc):
        global _PRECISION_MODE, _PRECISION_MODE_EXPLICIT
        _PRECISION_MODE, _PRECISION_MODE_EXPLICIT = self._saved
        return False


def get_precision_mode() -> str:
    return _PRECISION_MODE


def precision_mode_is_explicit() -> bool:
    """True once set_precision_mode has been called.  Surfaces whose own
    default differs from the session default (the ML frontend defaults to
    'fast') defer to the session mode only when the user actually set it."""
    return _PRECISION_MODE_EXPLICIT


def matmul_precision():
    """The jax matmul precision for the current mode (HIGHEST in parity —
    multi-pass f32 on the MXU; DEFAULT/bf16-class in fast)."""
    return precision_for(_PRECISION_MODE)


def precision_for(mode: str):
    """Precision for an explicit mode string.

    Jitted cores must take the mode as a STATIC argument and use this —
    reading the global inside a traced function bakes the trace-time mode
    into the cached executable, so a later set_precision_mode() silently
    has no effect on already-compiled shapes.
    """
    import jax

    return (
        jax.lax.Precision.HIGHEST if mode == "parity" else jax.lax.Precision.DEFAULT
    )


# Spectrogram compute engine.
#   "auto":   XLA for interactive sessions (host-transfer-bound; i16 fast
#             path; cheap compiles).  Streaming/offline paths may still pick
#             the fused kernel.
#   "xla":    the pure-JAX pipeline (always available; parity oracle).
#   "pallas": force the fused kernel (interpret mode off-TPU — tests only).
_ENGINE = "auto"


def set_engine(engine: str) -> None:
    global _ENGINE
    if engine not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown engine: {engine!r}")
    _ENGINE = engine


def get_engine() -> str:
    return _ENGINE


# Image downlink wire format for get_spec_image/get_spec_image_crop.
#   "grey8":  device ships the resized grey quantized to u8; the host
#             paints RGB via a 256-entry LUT.  3x fewer wire bytes than
#             rgb — the interactive zoom wall IS the image fetch over the
#             ~20 MB/s relay (VERDICT r2 #1).  Measured deviation from
#             the reference's f32-grey colormap on the bundled samples:
#             max 3 u8 units per channel, ~50% of pixels differ by >=1
#             (docs/PARITY.md deviation 4; pinned in
#             tests/test_e2e_reference_samples.py and
#             tests/test_session.py).
#   "grey16": u16 grey, 1.5x fewer bytes; RGB differs from exact only
#             within float rounding of lerp boundaries (<0.1% of pixels,
#             by <=1 step).
#   "rgb":    the reference-exact path — colormap applied on device to the
#             f32 grey (display.rs:56-61 semantics), 3 bytes/px shipped.
_IMAGE_WIRE = "grey8"


def set_image_wire(wire: str) -> None:
    global _IMAGE_WIRE
    if wire not in ("rgb", "grey8", "grey16"):
        raise ValueError(f"unknown image wire format: {wire!r}")
    _IMAGE_WIRE = wire


def get_image_wire() -> str:
    return _IMAGE_WIRE


# dB-export downlink format for get_spec_db / render --save-db.
# Default "f32": the raw bit-exact fetch.  get_spec_db/--save-db are the
# public data-export APIs — silently quantizing them (as the q10 default
# briefly did in round 3) changes callers' numbers with no dtype hint in
# the saved .npy, so lossy wires are strictly opt-in (per-call wire=,
# set_db_wire, or --db-wire).
#   "q10": device-packed fixed-point on the track's dB window —
#       max error 0.5*range/(2^10-1) (~0.06 dB on a 120 dB window, an
#       order of magnitude under one grey step of 0.47 dB), typically
#       3.5-5x fewer wire bytes than raw f32 after the per-block delta
#       bitpack (parallel/wirepack.py downlink codec).  dB values of
#       noise-floor bins fluctuate several dB frame to frame, so finer
#       grids mostly encode that noise: measured ratios on realistic
#       content are ~3.5x (q10), ~2.9x (q12), ~2.1x (q16).
#   "q12"/"q16": finer grids (~0.015/0.0009 dB max error) at fewer saved
#       bytes.  "q8": coarser (~0.24 dB, half a grey step) for the
#       tightest wire.
_DB_WIRE = "f32"


def set_db_wire(wire: str) -> None:
    global _DB_WIRE
    if wire not in ("f32", "q16", "q12", "q10", "q8"):
        raise ValueError(f"unknown dB wire format: {wire!r}")
    _DB_WIRE = wire


def get_db_wire() -> str:
    return _DB_WIRE


# Session HBM budget: device bytes the cached per-track state (dB planes,
# envelope buffers, adaptive builds) may hold before the LRU track spills
# to host.  None = unbounded (the reference keeps everything in RAM,
# lib.rs:80; a v5e has 16 GB of HBM and an hour-track's dB plane is
# ~90 MB, so a few dozen hour tracks would otherwise OOM with no
# graceful path).  Per-session override: MultiTrack(hbm_budget_bytes=...).
_SESSION_HBM_BUDGET: int | None = None


def set_session_hbm_budget(n_bytes: int | None) -> None:
    global _SESSION_HBM_BUDGET
    if n_bytes is not None and n_bytes < 0:
        raise ValueError(f"hbm budget must be >= 0 or None, got {n_bytes}")
    _SESSION_HBM_BUDGET = n_bytes


def get_session_hbm_budget() -> int | None:
    return _SESSION_HBM_BUDGET
