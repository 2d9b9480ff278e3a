"""General digital filtering — IIR design on host, execution as scans.

The reference has no user-facing filter API; its only recursive filter
is the purpose-built K-weighting chain in :mod:`msv_tpu.ops.loudness`.
This module is the general form of that machinery:

* **Design (host, f64 numpy).**  From-scratch Butterworth zpk design
  (analog prototype -> lp/hp/bp/bs transform -> bilinear with prewarp
  -> conjugate-paired second-order sections) plus the RBJ Audio-EQ
  Cookbook biquads (peaking / shelves / notch).  Responses are pinned
  against ``scipy.signal.butter`` in tests/test_filter.py — pinning the
  *transfer function*, not the section pairing, since any pairing is
  the same filter.
* **Execution (device, f32).**  A biquad is a 2-state linear
  recurrence; linear recurrences compose associatively, so each section
  runs as ``jax.lax.associative_scan`` — log-depth, no per-sample loop
  (see ops/loudness.py for the original derivation).  Two
  numerically-safe forms, chosen per section from the pole
  discriminant:

  - real poles: FIR stencil + two cascaded first-order scalar scans
    (every partial product p^L <= 1 — the conditioning lesson from the
    K-weighting high-pass, whose 2x2 matrix scan diverged at pole
    radius 0.995);
  - complex-conjugate poles: ONE first-order scan with the complex
    pole, run in split re/im form (the axon relay cannot execute
    complex64), then projected ``y = 2*Re(A*w)`` with
    ``A = p/(p - conj(p))`` from the partial-fraction expansion.
    Partial products again satisfy |p|^L <= 1.

* **State carry.**  Every section exposes its scan state, so chunked
  filtering is EXACT (no warm-up-discard approximation): the host
  wrapper :func:`sosfilt_streamed` carries ``(x[-1], x[-2], s1, s2)``
  per section across chunks and equals the one-scan answer to f32
  noise.  :func:`sosfilt_zi_step` gives the steady state for a step
  input, which makes :func:`filtfilt` reproduce
  ``scipy.signal.sosfiltfilt``'s pad method (odd extension + scaled
  steady-state initial conditions) within f32 tolerance.

No reference counterpart to cite — this is a capability extension; the
closest reference behavior is the absence of any EQ in `thesia`.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "butter_sos",
    "peaking_eq",
    "low_shelf",
    "high_shelf",
    "notch",
    "sosfilt",
    "sosfilt_streamed",
    "sosfilt_zi_step",
    "filtfilt",
    "firwin",
    "fir_filter",
    "sos_response",
]


# ---------------------------------------------------------------------------
# design: Butterworth (host, f64)
# ---------------------------------------------------------------------------

def _buttap(order):
    """Analog Butterworth prototype poles (unit cutoff), gain 1."""
    m = np.arange(-order + 1, order, 2)
    p = -np.exp(1j * np.pi * m / (2 * order))
    return np.array([], complex), p, 1.0


def _lp2lp(z, p, k, wo):
    deg = len(p) - len(z)
    return z * wo, p * wo, k * wo ** deg


def _lp2hp(z, p, k, wo):
    deg = len(p) - len(z)
    zh = wo / z if len(z) else np.array([], complex)
    ph = wo / p
    zh = np.append(zh, np.zeros(deg))
    k = k * np.real(np.prod(-z) / np.prod(-p))
    return zh, ph, k


def _lp2bp(z, p, k, wo, bw):
    deg = len(p) - len(z)
    zl, pl = z * bw / 2, p * bw / 2
    zb = np.concatenate([zl + np.sqrt(zl ** 2 - wo ** 2 + 0j),
                         zl - np.sqrt(zl ** 2 - wo ** 2 + 0j)])
    pb = np.concatenate([pl + np.sqrt(pl ** 2 - wo ** 2 + 0j),
                         pl - np.sqrt(pl ** 2 - wo ** 2 + 0j)])
    zb = np.append(zb, np.zeros(deg))
    return zb, pb, k * bw ** deg


def _lp2bs(z, p, k, wo, bw):
    deg = len(p) - len(z)
    zh = (bw / 2) / z if len(z) else np.array([], complex)
    ph = (bw / 2) / p
    zb = np.concatenate([zh + np.sqrt(zh ** 2 - wo ** 2 + 0j),
                         zh - np.sqrt(zh ** 2 - wo ** 2 + 0j)])
    pb = np.concatenate([ph + np.sqrt(ph ** 2 - wo ** 2 + 0j),
                         ph - np.sqrt(ph ** 2 - wo ** 2 + 0j)])
    zb = np.concatenate([zb, 1j * wo * np.ones(deg), -1j * wo * np.ones(deg)])
    k = k * np.real(np.prod(-z) / np.prod(-p))
    return zb, pb, k


def _bilinear(z, p, k, fs):
    fs2 = 2.0 * fs
    zd = (fs2 + z) / (fs2 - z)
    pd = (fs2 + p) / (fs2 - p)
    zd = np.append(zd, -np.ones(len(p) - len(z)))
    kd = k * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    return zd, pd, kd


def _pair_conjugates(roots):
    """Split roots into (conjugate pairs, reals); tolerant matching."""
    roots = np.asarray(roots, complex)
    used = np.zeros(len(roots), bool)
    pairs, reals = [], []
    order = np.argsort(np.abs(roots.imag))  # reals first
    for i in order:
        if used[i]:
            continue
        r = roots[i]
        if abs(r.imag) <= 1e-10 * max(1.0, abs(r.real)):
            used[i] = True
            reals.append(r.real)
            continue
        # find the closest unused conjugate
        cand = [j for j in range(len(roots)) if not used[j] and j != i]
        if not cand:
            raise ValueError("unpaired complex root in filter design")
        j = min(cand, key=lambda j: abs(roots[j] - np.conj(r)))
        used[i] = used[j] = True
        pairs.append((r, roots[j]))
    return pairs, reals


def _zpk2sos(z, p, k):
    """Conjugate-paired second-order sections, overall gain on the first.

    Any pairing realizes the same transfer function; sections are
    ordered low-damping-first so the overall gain multiplies the most
    forgiving section.  Each pole pair greedily takes the nearest
    remaining zeros (keeps section peak gains tame for bp/bs designs).
    """
    zp, zr = _pair_conjugates(z)
    pp, pr = _pair_conjugates(p)
    # pack real roots two per section (count parity matches: bilinear
    # design gives len(z) == len(p))
    zsec = [np.array(q) for q in zp] + [
        np.array(zr[i:i + 2]) for i in range(0, len(zr), 2)]
    psec = [np.array(q) for q in pp] + [
        np.array(pr[i:i + 2]) for i in range(0, len(pr), 2)]
    # order poles by radius descending (closest to the circle first)
    psec.sort(key=lambda q: -np.max(np.abs(q)))
    sos = []
    remaining = list(zsec)
    for q in psec:
        if remaining:
            ctr = np.mean(q)
            i = min(range(len(remaining)),
                    key=lambda i: abs(np.mean(remaining[i]) - ctr))
            zz = remaining.pop(i)
        else:
            zz = np.array([], complex)
        b = np.real(np.poly(zz)) if len(zz) else np.array([1.0])
        a = np.real(np.poly(q)) if len(q) else np.array([1.0])
        b = np.pad(b, (0, 3 - len(b)))
        a = np.pad(a, (0, 3 - len(a)))
        sos.append(np.concatenate([b, a]))
    sos = np.array(sos) if sos else np.zeros((0, 6))
    if len(sos):
        sos[0, :3] *= k
    return sos


def butter_sos(order, cutoff, btype="lowpass", *, sr):
    """Digital Butterworth filter as (n_sections, 6) f64 SOS rows.

    ``cutoff`` is in Hz: a scalar for lowpass/highpass, an (lo, hi)
    pair for bandpass/bandstop.  Transfer-function parity with
    ``scipy.signal.butter(..., output='sos')`` is pinned in tests.
    """
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    btype = {"low": "lowpass", "high": "highpass", "bp": "bandpass",
             "bs": "bandstop"}.get(btype, btype)
    z, p, k = _buttap(order)
    fs = 2.0
    if btype in ("lowpass", "highpass"):
        f = float(np.squeeze(cutoff))
        if not 0.0 < f < sr / 2:
            raise ValueError(f"cutoff {f} Hz outside (0, {sr / 2}) at sr={sr}")
        warped = 2 * fs * math.tan(math.pi * f / sr)
        z, p, k = (_lp2lp if btype == "lowpass" else _lp2hp)(z, p, k, warped)
    elif btype in ("bandpass", "bandstop"):
        lo, hi = (float(v) for v in cutoff)
        if not 0.0 < lo < hi < sr / 2:
            raise ValueError(
                f"band edges ({lo}, {hi}) must satisfy 0 < lo < hi < {sr / 2}")
        w1 = 2 * fs * math.tan(math.pi * lo / sr)
        w2 = 2 * fs * math.tan(math.pi * hi / sr)
        wo, bw = math.sqrt(w1 * w2), w2 - w1
        z, p, k = (_lp2bp if btype == "bandpass" else _lp2bs)(z, p, k, wo, bw)
    else:
        raise ValueError(f"unknown btype {btype!r}")
    z, p, k = _bilinear(z, p, k, fs)
    return _zpk2sos(z, p, k)


# ---------------------------------------------------------------------------
# design: RBJ Audio-EQ Cookbook biquads (host, f64)
# ---------------------------------------------------------------------------

def _rbj_common(sr, f0, q):
    if not 0.0 < f0 < sr / 2:
        raise ValueError(f"f0 {f0} Hz outside (0, {sr / 2}) at sr={sr}")
    if q <= 0:
        raise ValueError(f"q must be positive, got {q}")
    w0 = 2 * math.pi * f0 / sr
    return w0, math.sin(w0) / (2 * q)


def peaking_eq(sr, f0, gain_db, q=1.0):
    """Peaking EQ: ``gain_db`` boost/cut at ``f0``, unity far away."""
    w0, alpha = _rbj_common(sr, f0, q)
    A = 10.0 ** (gain_db / 40.0)
    b = [1 + alpha * A, -2 * math.cos(w0), 1 - alpha * A]
    a = [1 + alpha / A, -2 * math.cos(w0), 1 - alpha / A]
    return (np.array([b + a]) / a[0]).reshape(1, 6)


def _shelf(sr, f0, gain_db, s, *, high):
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2 * math.pi * f0 / sr
    if not 0.0 < f0 < sr / 2:
        raise ValueError(f"f0 {f0} Hz outside (0, {sr / 2}) at sr={sr}")
    alpha = math.sin(w0) / 2 * math.sqrt((A + 1 / A) * (1 / s - 1) + 2)
    cw = math.cos(w0)
    sq = 2 * math.sqrt(A) * alpha
    sgn = 1.0 if high else -1.0
    b = [A * ((A + 1) + sgn * (A - 1) * cw + sq),
         -2 * sgn * A * ((A - 1) + sgn * (A + 1) * cw),
         A * ((A + 1) + sgn * (A - 1) * cw - sq)]
    a = [(A + 1) - sgn * (A - 1) * cw + sq,
         2 * sgn * ((A - 1) - sgn * (A + 1) * cw),
         (A + 1) - sgn * (A - 1) * cw - sq]
    return (np.array([b + a]) / a[0]).reshape(1, 6)


def low_shelf(sr, f0, gain_db, slope=1.0):
    """Low shelf: ``gain_db`` below ``f0``, unity above (RBJ S=slope)."""
    return _shelf(sr, f0, gain_db, slope, high=False)


def high_shelf(sr, f0, gain_db, slope=1.0):
    """High shelf: ``gain_db`` above ``f0``, unity below."""
    return _shelf(sr, f0, gain_db, slope, high=True)


def notch(sr, f0, q=30.0):
    """Notch: null at ``f0``, unity elsewhere."""
    w0, alpha = _rbj_common(sr, f0, q)
    b = [1.0, -2 * math.cos(w0), 1.0]
    a = [1 + alpha, -2 * math.cos(w0), 1 - alpha]
    return (np.array([b + a]) / a[0]).reshape(1, 6)


def sos_response(sos, freqs, sr):
    """|H(e^{j2πf/sr})| of an SOS cascade at ``freqs`` Hz (host f64)."""
    z = np.exp(-2j * np.pi * np.asarray(freqs, float) / sr)
    h = np.ones_like(z)
    for b0, b1, b2, a0, a1, a2 in np.asarray(sos, float):
        h *= (b0 + b1 * z + b2 * z * z) / (a0 + a1 * z + a2 * z * z)
    return np.abs(h)


# ---------------------------------------------------------------------------
# execution (device, f32)
# ---------------------------------------------------------------------------

def _section_plan(sos):
    """Static per-section execution plans from (n, 6) f64 SOS rows.

    ('real', b0, b1, b2, p, q): two cascaded real first-order scans.
    ('cplx', b0, b1, b2, p_re, p_im, A_re, A_im): one split-complex
    first-order scan, output 2*Re(A*w).
    """
    plans = []
    for row in np.asarray(sos, float):
        b0, b1, b2, a0, a1, a2 = (float(v) for v in row)
        if abs(a0 - 1.0) > 1e-12:
            b0, b1, b2, a1, a2 = b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0
        disc = a1 * a1 - 4.0 * a2
        if disc >= -1e-12 * max(1.0, a1 * a1):
            root = math.sqrt(max(disc, 0.0)) / 2.0
            plans.append(("real", b0, b1, b2, -a1 / 2 + root, -a1 / 2 - root))
        else:
            pre, pim = -a1 / 2.0, math.sqrt(-disc) / 2.0
            # partial fractions: 1/((1-pz)(1-p̄z)) = A/(1-pz) + Ā/(1-p̄z),
            # A = p/(p - p̄) = p/(2j·im)
            A = complex(pre, pim) / complex(0.0, 2.0 * pim)
            plans.append(("cplx", b0, b1, b2, pre, pim, A.real, A.imag))
    return tuple(plans)


def _scan_real(x, p, s0):
    """y[n] = p·y[n-1] + x[n], y[-1] = s0; returns the full y."""
    x = x.at[0].add(jnp.float32(p) * s0)
    pv = jnp.full_like(x, jnp.float32(p))

    def combine(l, r):
        pl, ul = l
        pr, ur = r
        return pr * pl, pr * ul + ur

    _, y = jax.lax.associative_scan(combine, (pv, x))
    return y


def _scan_cplx(x, pre, pim, s0re, s0im):
    """w[n] = p·w[n-1] + x[n] with complex p, in split re/im form
    (the axon relay cannot execute complex64); x real."""
    ure = x.at[0].add(jnp.float32(pre) * s0re - jnp.float32(pim) * s0im)
    uim = jnp.zeros_like(x).at[0].add(
        jnp.float32(pre) * s0im + jnp.float32(pim) * s0re)
    pr = jnp.full_like(x, jnp.float32(pre))
    pi = jnp.full_like(x, jnp.float32(pim))

    def combine(l, r):
        plr, pli, ulr, uli = l
        prr, pri, urr, uri = r
        return (prr * plr - pri * pli,
                prr * pli + pri * plr,
                prr * ulr - pri * uli + urr,
                prr * uli + pri * ulr + uri)

    _, _, wre, wim = jax.lax.associative_scan(combine, (pr, pi, ure, uim))
    return wre, wim


def _apply_section(x, n, state, plan):
    """One biquad over ``x`` (padded (T,) f32; ``n`` true samples).

    ``state`` is this section's carried (x1, x2, s1, s2): the last two
    section INPUT samples and the two scan states at sample n-1.
    Returns (y, new_state).
    """
    x1, x2, s1, s2 = state[0], state[1], state[2], state[3]
    kind, b0, b1, b2 = plan[0], plan[1], plan[2], plan[3]
    xm1 = jnp.concatenate([x1[None], x[:-1]])
    xm2 = jnp.concatenate([x2[None], x1[None], x[:-2]])
    fir = (jnp.float32(b0) * x + jnp.float32(b1) * xm1
           + jnp.float32(b2) * xm2)
    nx1 = jax.lax.dynamic_index_in_dim(x, n - 1, keepdims=False)
    nx2 = jnp.where(n >= 2,
                    jax.lax.dynamic_index_in_dim(
                        x, jnp.maximum(n - 2, 0), keepdims=False), x1)
    if kind == "real":
        p, q = plan[4], plan[5]
        y1 = _scan_real(fir, p, s1)
        y = _scan_real(y1, q, s2)
        ns1 = jax.lax.dynamic_index_in_dim(y1, n - 1, keepdims=False)
        ns2 = jax.lax.dynamic_index_in_dim(y, n - 1, keepdims=False)
    else:
        pre, pim, are, aim = plan[4], plan[5], plan[6], plan[7]
        wre, wim = _scan_cplx(fir, pre, pim, s1, s2)
        y = 2.0 * (jnp.float32(are) * wre - jnp.float32(aim) * wim)
        ns1 = jax.lax.dynamic_index_in_dim(wre, n - 1, keepdims=False)
        ns2 = jax.lax.dynamic_index_in_dim(wim, n - 1, keepdims=False)
    return y, jnp.stack([nx1, nx2, ns1, ns2])


@functools.partial(jax.jit, static_argnames=("plans",))
def _sosfilt_core(x, n, state, *, plans):
    zf = []
    for i, plan in enumerate(plans):
        x, s = _apply_section(x, n, state[i], plan)
        zf.append(s)
    return x, jnp.stack(zf)


def _bucket(n):
    return max(65536, -(-n // 65536) * 65536)


def sosfilt(sos, x, zi=None, *, return_zf=False):
    """Filter 1-D ``x`` through the SOS cascade on device.

    ``zi``: optional (n_sections, 4) f32 carried state per section —
    ``(x[-1], x[-2], s1, s2)`` in this module's scan-state convention
    (NOT scipy's direct-form-II state).  Build it with
    :func:`sosfilt_zi_step` or carry it from a previous call's ``zf``.
    Lengths are padded to 64k buckets so the compile cache stays
    bounded (repo convention).
    """
    sos = np.atleast_2d(np.asarray(sos, float))
    plans = _section_plan(sos)
    x = np.asarray(x, np.float32)
    if x.ndim != 1:
        raise ValueError(f"sosfilt expects 1-D input, got shape {x.shape}")
    n = len(x)
    if n == 0:
        raise ValueError("sosfilt: empty input")
    state = (jnp.zeros((len(plans), 4), jnp.float32) if zi is None
             else jnp.asarray(zi, jnp.float32))
    if state.shape != (len(plans), 4):
        raise ValueError(
            f"zi shape {tuple(state.shape)} != ({len(plans)}, 4)")
    b = _bucket(n)
    xp = jnp.asarray(np.pad(x, (0, b - n)) if b != n else x)
    y, zf = _sosfilt_core(xp, jnp.int32(n), state, plans=plans)
    y = np.asarray(y)[:n]
    return (y, np.asarray(zf)) if return_zf else y


def sosfilt_streamed(sos, x, *, chunk=1 << 21):
    """Exact chunked :func:`sosfilt` — sequential scans carrying the
    per-section state, O(chunk) device memory at any length."""
    x = np.asarray(x, np.float32)
    if len(x) <= chunk:
        return sosfilt(sos, x)
    out = np.empty_like(x)
    zi = None
    for a in range(0, len(x), chunk):
        seg = x[a:a + chunk]
        y, zi = sosfilt(sos, seg, zi, return_zf=True)
        out[a:a + len(seg)] = y
    return out


def sosfilt_zi_step(sos, c=1.0):
    """Steady-state carried state for a constant input ``c`` (host f64).

    The per-section analogue of ``scipy.signal.sosfilt_zi`` in this
    module's state convention; used by :func:`filtfilt` to suppress
    edge transients the way scipy's pad method does.
    """
    sos = np.atleast_2d(np.asarray(sos, float))
    plans = _section_plan(sos)
    state = np.zeros((len(plans), 4), np.float32)
    v = float(c)
    for i, plan in enumerate(plans):
        kind, b0, b1, b2 = plan[0], plan[1], plan[2], plan[3]
        fir_ss = v * (b0 + b1 + b2)
        if kind == "real":
            p, q = plan[4], plan[5]
            s1 = fir_ss / (1.0 - p)
            s2 = s1 / (1.0 - q)
            y_ss = s2
        else:
            pre, pim, are, aim = plan[4], plan[5], plan[6], plan[7]
            w = complex(fir_ss) / (1.0 - complex(pre, pim))
            s1, s2 = w.real, w.imag
            y_ss = 2.0 * (are * w.real - aim * w.imag)
        state[i] = (v, v, s1, s2)
        v = y_ss
    return state


def filtfilt(sos, x, *, padlen=None):
    """Zero-phase forward-backward filtering (scipy ``sosfiltfilt``
    pad method: odd extension + step steady-state initial conditions).
    """
    sos = np.atleast_2d(np.asarray(sos, float))
    x = np.asarray(x, np.float32)
    if padlen is None:
        padlen = 3 * (2 * len(sos) + 1)
    if padlen >= len(x):
        raise ValueError(
            f"input length {len(x)} must exceed padlen {padlen}")
    if padlen:
        front = 2 * x[0] - x[padlen:0:-1]
        back = 2 * x[-1] - x[-2:-padlen - 2:-1]
        ext = np.concatenate([front, x, back])
    else:
        ext = x
    y = sosfilt(sos, ext, sosfilt_zi_step(sos, ext[0]))
    y = y[::-1]
    y = sosfilt(sos, y, sosfilt_zi_step(sos, y[0]))[::-1]
    return y[padlen:len(y) - padlen] if padlen else y


# ---------------------------------------------------------------------------
# FIR (host design + device conv)
# ---------------------------------------------------------------------------

def firwin(numtaps, cutoff, *, sr, window="hamming", pass_zero=True):
    """Window-method linear-phase FIR design (``scipy.signal.firwin``
    parity, pinned in tests): windowed ideal-bandsum sinc, normalized
    to unit gain at the band center."""
    if numtaps < 1:
        raise ValueError(f"numtaps must be >= 1, got {numtaps}")
    cutoff = np.atleast_1d(np.asarray(cutoff, float)) / (sr / 2.0)
    if np.any(cutoff <= 0) or np.any(cutoff >= 1):
        raise ValueError("cutoffs must be inside (0, sr/2)")
    if np.any(np.diff(cutoff) <= 0):
        raise ValueError("cutoffs must be strictly increasing")
    pass_nyq = bool(len(cutoff) % 2) ^ bool(pass_zero)
    if pass_nyq and numtaps % 2 == 0:
        raise ValueError("a filter passing Nyquist needs odd numtaps")
    bands = np.concatenate([
        [0.0] if pass_zero else [], cutoff, [1.0] if pass_nyq else []])
    bands = bands.reshape(-1, 2)
    m = np.arange(numtaps) - (numtaps - 1) / 2.0
    h = np.zeros(numtaps)
    for lo, hi in bands:
        h += hi * np.sinc(hi * m) - lo * np.sinc(lo * m)
    if window == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(numtaps)
                                 / (numtaps - 1)) if numtaps > 1 else \
            np.ones(1)
    elif window == "hann":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(numtaps)
                               / (numtaps - 1)) if numtaps > 1 else \
            np.ones(1)
    elif window == "blackman":
        t = 2 * np.pi * np.arange(numtaps) / (numtaps - 1) \
            if numtaps > 1 else np.zeros(1)
        w = 0.42 - 0.5 * np.cos(t) + 0.08 * np.cos(2 * t)
    else:
        raise ValueError(f"unknown window {window!r}")
    h *= w
    # normalize at the first passband's center (scipy's rule: DC for a
    # zero-anchored band, Nyquist for a Nyquist-anchored one)
    lo, hi = bands[0]
    if lo == 0.0:
        fc = 0.0
    elif hi == 1.0:
        fc = 1.0
    else:
        fc = (lo + hi) / 2
    s = np.sum(h * np.cos(np.pi * m * fc))
    return h / s


@functools.partial(jax.jit, static_argnames=("ntaps",))
def _fir_core(x, taps, *, ntaps):
    lhs = x[None, None, :]
    rhs = taps[::-1][None, None, :]
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,),
        padding=[((ntaps - 1) // 2, ntaps - 1 - (ntaps - 1) // 2)],
        preferred_element_type=jnp.float32)
    return y[0, 0]


def fir_filter(x, taps):
    """'same'-mode FIR filtering as ONE device convolution."""
    x = np.asarray(x, np.float32)
    taps = np.asarray(taps, np.float32)
    n = len(x)
    b = _bucket(n)
    xp = jnp.asarray(np.pad(x, (0, b - n)) if b != n else x)
    y = _fir_core(xp, jnp.asarray(taps), ntaps=len(taps))
    return np.asarray(y)[:n]
