"""ctypes bridge to the native C++ WAV decoder (msv_tpu/native/).

The reference's audio layer is native (Rust hound/rodio); ours mirrors that
with a small C++ decoder built by ``make -C msv_tpu/native``.  If the shared
library is absent or fails, callers fall back to the numpy parser — identical
output either way (parity-tested).
"""

import ctypes
import os
import threading

import numpy as np

_LIB = None
_TRIED = False
_LOAD_LOCK = threading.Lock()


def _load():
    """Thread-safe lazy load (double-checked: ``_TRIED`` publishes only
    AFTER ``_LIB`` — concurrent decoder threads, e.g. the data-pipeline
    pool, must never observe the latch without the handle)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOAD_LOCK:
        if not _TRIED:
            _LIB = _load_impl()
            _TRIED = True
    return _LIB


def _load_impl():
    so = os.path.join(os.path.dirname(__file__), "..", "native", "libmsv_native.so")
    so = os.path.abspath(so)
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.msv_wav_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),  # n_samples (per channel)
            ctypes.POINTER(ctypes.c_int32),  # n_channels
            ctypes.POINTER(ctypes.c_int32),  # sample rate
        ]
        lib.msv_wav_decode.restype = ctypes.c_int32
        lib.msv_flac_decode.argtypes = lib.msv_wav_decode.argtypes
        lib.msv_flac_decode.restype = ctypes.c_int32
        lib.msv_flac_decode_ex.argtypes = lib.msv_wav_decode.argtypes + [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.msv_flac_decode_ex.restype = ctypes.c_int32
        lib.msv_free_ptr.argtypes = [ctypes.c_void_p]
        lib.msv_free_ptr.restype = None
        lib.msv_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.msv_free.restype = None
        return lib
    except OSError:
        return None


def _call_decoder(fn, path: str):
    buf = ctypes.POINTER(ctypes.c_float)()
    n_samples = ctypes.c_int64()
    n_ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = fn(
        path.encode(),
        ctypes.byref(buf),
        ctypes.byref(n_samples),
        ctypes.byref(n_ch),
        ctypes.byref(sr),
    )
    if rc != 0:
        return rc, None
    try:
        # native layout: channel-major (n_ch, n_samples), ready to use
        arr = np.ctypeslib.as_array(buf, shape=(n_ch.value, n_samples.value)).copy()
    finally:
        lib_free = _LIB
        lib_free.msv_free(buf)
    return 0, (arr, sr.value)


def try_decode(path: str):
    """Returns (wav (n_ch, n_samples) f32, sr) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    rc, out = _call_decoder(lib.msv_wav_decode, path)
    return out if rc == 0 else None  # numpy parser produces detailed errors


_FLAC_ERRORS = {
    1: "io error",
    2: "not a FLAC stream",
    3: "bad metadata",
    4: "bad frame",
    5: "frame header CRC mismatch",
    6: "bad subframe",
    7: "frame CRC mismatch",
    8: "truncated stream",
    9: "out of memory",
}


def flac_available() -> bool:
    return _load() is not None


def decode_flac(path: str):
    """FLAC -> (wav (n_ch, n_samples) f32, sr).  Raises on failure."""
    from ..utils.errors import AudioReadError

    lib = _load()
    if lib is None:
        raise AudioReadError(
            f"{path}: FLAC decoding unavailable "
            "(build libmsv_native.so: make -C msv_tpu/native)"
        )
    rc, out = _call_decoder(lib.msv_flac_decode, path)
    if rc != 0:
        raise AudioReadError(
            f"{path}: FLAC decode failed ({_FLAC_ERRORS.get(rc, rc)})"
        )
    return out


def decode_flac_ex(path: str):
    """FLAC -> (wav f32 (n_ch, n), sr, raw_int32 (n_ch, n) | None, bps).

    ``raw_int32`` carries the decoder's exact integer samples (units of
    2^-(bps-1)) when the stream has one uniform bit depth — the session's
    integer-domain wire path consumes these instead of f32."""
    from ..utils.errors import AudioReadError

    lib = _load()
    if lib is None:
        raise AudioReadError(
            f"{path}: FLAC decoding unavailable "
            "(build libmsv_native.so: make -C msv_tpu/native)"
        )
    buf = ctypes.POINTER(ctypes.c_float)()
    n_samples = ctypes.c_int64()
    n_ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    ibuf = ctypes.POINTER(ctypes.c_int32)()
    bps = ctypes.c_int32()
    rc = lib.msv_flac_decode_ex(
        path.encode(), ctypes.byref(buf), ctypes.byref(n_samples),
        ctypes.byref(n_ch), ctypes.byref(sr), ctypes.byref(ibuf),
        ctypes.byref(bps),
    )
    if rc != 0:
        raise AudioReadError(
            f"{path}: FLAC decode failed ({_FLAC_ERRORS.get(rc, rc)})"
        )
    try:
        wav = np.ctypeslib.as_array(
            buf, shape=(n_ch.value, n_samples.value)
        ).copy()
        raw = None
        if bps.value > 0 and ibuf:
            raw = np.ctypeslib.as_array(
                ibuf, shape=(n_ch.value, n_samples.value)
            ).copy()
    finally:
        lib.msv_free(buf)
        if ibuf:
            lib.msv_free_ptr(ctypes.cast(ibuf, ctypes.c_void_p))
    return wav, sr.value, raw, bps.value
