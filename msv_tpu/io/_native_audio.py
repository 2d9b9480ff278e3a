"""ctypes bridge to the native C++ WAV decoder (msv_tpu/native/).

The reference's audio layer is native (Rust hound/rodio); ours mirrors that
with a small C++ decoder built by ``make -C msv_tpu/native``.  If the shared
library is absent or fails, callers fall back to the numpy parser — identical
output either way (parity-tested).
"""

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
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
        lib.msv_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.msv_free.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def try_decode(path: str):
    """Returns (wav (n_ch, n_samples) f32, sr) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_float)()
    n_samples = ctypes.c_int64()
    n_ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.msv_wav_decode(
        path.encode(),
        ctypes.byref(buf),
        ctypes.byref(n_samples),
        ctypes.byref(n_ch),
        ctypes.byref(sr),
    )
    if rc != 0:
        return None  # let the numpy parser produce the detailed error
    try:
        n = n_samples.value * n_ch.value
        # native layout: channel-major (n_ch, n_samples), ready to use
        arr = np.ctypeslib.as_array(buf, shape=(n_ch.value, n_samples.value)).copy()
    finally:
        lib.msv_free(buf)
    return arr, sr.value
