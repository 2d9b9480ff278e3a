"""Slaney-style mel filterbank (reference: ``src_rust/mel.rs``, which itself
follows librosa 0.8 ``filters.mel`` with htk=False, norm='slaney').

Host-side numpy: the filterbank is a small per-(sr, n_fft) constant whose
*shape* (n_mel) is data-dependent (decrement loop below), so it must be
resolved on the host before device shapes are fixed (SURVEY.md §7 hard part
"Auto-n_mel decrement loop").  On device it is just the (n_freq, n_mel)
operand of the mel GEMM on the MXU.

Constants (mel.rs:8-11):
  MIN_LOG_MEL = 15, MIN_LOG_HZ = 1000 Hz,
  LOGSTEP = ln(6.4)/27, LINEARSCALE = 200/3.
"""

import functools

import numpy as np

MIN_LOG_MEL = 15
MIN_LOG_HZ = 1000.0
LOGSTEP = 0.06875177742094912  # ln(6.4) / 27  (mel.rs:10)
LINEARSCALE = 200.0 / 3.0


def mel_to_hz(mel, dtype=None):
    """Inverse mel scale (mel.rs:14-21). Scalar or ndarray; dtype-faithful."""
    mel = np.asarray(mel)
    if dtype is None:
        dtype = mel.dtype if mel.dtype.kind == "f" else np.float64
    dt = np.dtype(dtype).type
    mel = mel.astype(dt)
    lin = dt(LINEARSCALE) * mel
    log = dt(MIN_LOG_HZ) * np.exp(dt(LOGSTEP) * (mel - dt(MIN_LOG_MEL)))
    out = np.where(mel < dt(MIN_LOG_MEL), lin, log)
    return out[()] if out.ndim == 0 else out


def hz_to_mel(freq, dtype=None):
    """Forward mel scale (mel.rs:24-31). Scalar or ndarray; dtype-faithful."""
    freq = np.asarray(freq)
    if dtype is None:
        dtype = freq.dtype if freq.dtype.kind == "f" else np.float64
    dt = np.dtype(dtype).type
    freq = freq.astype(dt)
    lin = freq / dt(LINEARSCALE)
    with np.errstate(divide="ignore", invalid="ignore"):
        log = dt(MIN_LOG_MEL) + np.log(freq / dt(MIN_LOG_HZ)) / dt(LOGSTEP)
    out = np.where(freq < dt(MIN_LOG_HZ), lin, log)
    return out[()] if out.ndim == 0 else out


def _linspace(start, stop, num, dt):
    """ndarray::linspace semantics: start + i*step with step=(stop-start)/(n-1),
    computed in the target dtype (matches mel.rs:61-62 operand dtypes)."""
    step = (dt(stop) - dt(start)) / dt(num - 1)
    return (dt(start) + step * np.arange(num, dtype=dt)).astype(dt)


def calc_mel_fb(
    sr: int,
    n_fft: int,
    n_mel: int,
    fmin: float = 0.0,
    fmax=None,
    do_norm=True,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freq, n_mel)  (mel.rs:33-85).

    NOTE: transposed vs librosa so that ``spec @ fb`` works directly
    (spec is (n_frames, n_freq)).

    ``do_norm``: True/'sum' divides each filter by its sampled sum
    (mel.rs:80-82 — what the reference app actually computes); 'slaney'
    applies librosa's analytic area norm 2/(m2-m0) (what the reference's
    *golden test* mel.rs:115-133 pins — the two disagree by ~the linear bin
    width; the reference's own test is stale at v0); False disables.
    """
    if n_fft % 2 != 0:
        raise ValueError("n_fft must be even (mel.rs:52 assert)")
    if n_mel == 0:
        raise ValueError("n_mel must be nonzero (mel.rs:53 assert)")
    dt = np.dtype(dtype).type
    f_nyquist = dt(np.float32(sr) / np.float32(2.0))
    fmax = dt(fmax) if fmax is not None else f_nyquist
    n_freq = n_fft // 2 + 1

    min_mel = hz_to_mel(dt(fmin))
    max_mel = hz_to_mel(fmax)

    f = _linspace(0.0, f_nyquist, n_freq, dt)[:, None]  # (n_freq, 1)
    m = mel_to_hz(_linspace(min_mel, max_mel, n_mel + 2, dt))  # (n_mel+2,)
    m0, m1, m2 = m[None, :-2], m[None, 1:-1], m[None, 2:]  # (1, n_mel)

    # Branch structure of mel.rs:67-79, vectorized (the `break` is equivalent
    # to weight 0, and the exact `f == m1` comparison is preserved).
    rising = (m0 < f) & (f < m1)
    peak = f == m1
    falling = (m1 < f) & (f < m2)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.where(
            rising,
            (f - m0) / (m1 - m0),
            np.where(peak, dt(1.0), np.where(falling, (m2 - f) / (m2 - m1), dt(0.0))),
        ).astype(dt)
    if do_norm in (True, "sum"):
        # column /= max(sum, epsilon)  (mel.rs:80-82)
        s = np.maximum(w.sum(axis=0, dtype=dt), np.finfo(dt).eps)
        w = (w / s).astype(dt)
    elif do_norm == "slaney":
        # librosa htk=False norm='slaney': 2 / (m[i+2] - m[i])
        w = (w * (dt(2.0) / (m2 - m0))).astype(dt)
    elif do_norm not in (False, None):
        raise ValueError(f"unknown mel norm {do_norm!r}")
    return w


@functools.lru_cache(maxsize=None)
def _mel_fb_default_cached(sr: int, n_fft: int):
    # Auto n_mel rule (mel.rs:87-99): start at
    #   floor(2*mel(sr/2)/mel(sr/n_fft) - 1)  capped at n_freq,
    # then decrement until no filter column is all-zero.
    f32 = np.float32
    n_mel = int(
        f32(2.0) * hz_to_mel(f32(sr) / f32(2.0)) / hz_to_mel(f32(sr) / f32(n_fft))
        - f32(1.0)
    )
    n_mel = min(n_mel, n_fft // 2 + 1)
    while True:
        fb = calc_mel_fb(sr, n_fft, n_mel, 0.0, None, True, np.float32)
        if (fb.sum(axis=0) > 0).all():
            return fb
        n_mel -= 1


def calc_mel_fb_default(sr: int, n_fft: int) -> np.ndarray:
    """Default filterbank with auto band count (mel.rs:87-99), f32.

    Under the session defaults this yields ~257-385 bands for the bundled
    sample rates (NOT the usual 80/128) — it maximizes the feasible band
    count for the given (sr, n_fft).
    """
    return _mel_fb_default_cached(int(sr), int(n_fft)).copy()
