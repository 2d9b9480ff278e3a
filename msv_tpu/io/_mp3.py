"""MP3 decoding via ctypes on the system libmpg123.

This is a deliberate capability EXTENSION beyond the reference: its
rodio dependency is pinned with ``default-features = false`` and only
the flac/vorbis/wav features (Cargo.toml:18), so the reference cannot
decode mp3 at all.  We add it because mp3 is ubiquitous in the audio
files a viewer gets pointed at.  This image ships ``libmpg123.so.0`` —
we bind the handful of calls we need directly, the same pattern as
io/_vorbis.py.  No dev headers exist in the
image, so the few enum values used are declared inline; they are stable
public ABI (unchanged since mpg123 1.x) and any mismatch would fail the
codec tests immediately, not corrupt audio silently.

Output is forced to MPG123_ENC_FLOAT_32 at the stream's native rate, so
the decoder hands us float samples directly (the same convention the
other codec paths normalize to).  mpg123 honors the LAME/Xing gapless tags
by default, trimming encoder delay/padding — a lame-encoded fixture
round-trips to exactly the original sample count.
"""

import ctypes
import ctypes.util
import os
import threading

import numpy as np

from ..utils.errors import AudioReadError

# mpg123.h public ABI constants (stable across 1.x)
_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_MPG123_ENC_FLOAT_32 = 0x200

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
    for name in ("libmpg123.so.0", "libmpg123.so",
                 ctypes.util.find_library("mpg123")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            lib = None
    else:
        lib = None
    if lib is None:
        return None
    c = ctypes
    lib.mpg123_init.argtypes = []
    lib.mpg123_init.restype = c.c_int
    lib.mpg123_new.argtypes = [c.c_char_p, c.POINTER(c.c_int)]
    lib.mpg123_new.restype = c.c_void_p
    lib.mpg123_open.argtypes = [c.c_void_p, c.c_char_p]
    lib.mpg123_open.restype = c.c_int
    lib.mpg123_getformat.argtypes = [
        c.c_void_p, c.POINTER(c.c_long), c.POINTER(c.c_int),
        c.POINTER(c.c_int),
    ]
    lib.mpg123_getformat.restype = c.c_int
    lib.mpg123_format_none.argtypes = [c.c_void_p]
    lib.mpg123_format_none.restype = c.c_int
    lib.mpg123_format.argtypes = [c.c_void_p, c.c_long, c.c_int, c.c_int]
    lib.mpg123_format.restype = c.c_int
    lib.mpg123_read.argtypes = [
        c.c_void_p, c.c_void_p, c.c_size_t, c.POINTER(c.c_size_t),
    ]
    lib.mpg123_read.restype = c.c_int
    lib.mpg123_close.argtypes = [c.c_void_p]
    lib.mpg123_close.restype = c.c_int
    lib.mpg123_delete.argtypes = [c.c_void_p]
    lib.mpg123_delete.restype = None
    lib.mpg123_init()  # no-op in modern builds; required by older ones
    return lib


def available() -> bool:
    return _load() is not None


def decode(path: str):
    """Decode an MP3 file -> (wav f32 (n_ch, n_samples), sr)."""
    lib = _load()
    if lib is None:
        raise AudioReadError(
            f"{path}: mp3 decoding unavailable (libmpg123 not found)"
        )
    if not os.path.exists(path):
        raise AudioReadError(f"{path}: no such file")
    err = ctypes.c_int(0)
    mh = lib.mpg123_new(None, ctypes.byref(err))
    if not mh:
        raise AudioReadError(f"{path}: mpg123_new failed ({err.value})")
    try:
        if lib.mpg123_open(mh, path.encode()) != _MPG123_OK:
            raise AudioReadError(f"{path}: not a valid mp3 stream")
        rate = ctypes.c_long(0)
        n_ch = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        if lib.mpg123_getformat(mh, ctypes.byref(rate), ctypes.byref(n_ch),
                                ctypes.byref(enc)) != _MPG123_OK:
            raise AudioReadError(f"{path}: mp3 stream has no valid header")
        if n_ch.value <= 0 or rate.value <= 0:
            raise AudioReadError(
                f"{path}: bad mp3 params ch={n_ch.value} sr={rate.value}"
            )
        # lock the output format: f32 at the native rate/channels only —
        # a mid-stream format change then ends the decode cleanly instead
        # of silently resampling.  getformat above already NEGOTIATED the
        # default (s16) for this stream, so the lock only takes effect on
        # a fresh open: close and reopen with the restricted format table.
        lib.mpg123_format_none(mh)
        if lib.mpg123_format(mh, rate.value, n_ch.value,
                             _MPG123_ENC_FLOAT_32) != _MPG123_OK:
            raise AudioReadError(f"{path}: mpg123 cannot output f32")
        lib.mpg123_close(mh)
        if lib.mpg123_open(mh, path.encode()) != _MPG123_OK:
            raise AudioReadError(f"{path}: not a valid mp3 stream")
        if (lib.mpg123_getformat(mh, ctypes.byref(rate), ctypes.byref(n_ch),
                                 ctypes.byref(enc)) != _MPG123_OK
                or enc.value != _MPG123_ENC_FLOAT_32):
            raise AudioReadError(f"{path}: mpg123 f32 renegotiation failed")
        bufbytes = 1 << 18
        buf = (ctypes.c_ubyte * bufbytes)()
        done = ctypes.c_size_t(0)
        chunks = []
        while True:
            rc = lib.mpg123_read(mh, buf, bufbytes, ctypes.byref(done))
            if done.value:
                nfloat = done.value // 4
                chunks.append(
                    np.frombuffer(buf, dtype=np.float32, count=nfloat).copy()
                )
            if rc == _MPG123_DONE:
                break
            if rc == _MPG123_NEW_FORMAT:
                continue  # first read reports the (locked) format
            if rc != _MPG123_OK:
                # trailing garbage after valid frames: keep what decoded
                break
        if not chunks:
            raise AudioReadError(f"{path}: empty mp3 stream")
        flat = np.concatenate(chunks)
        nch = n_ch.value
        n = len(flat) // nch
        if n == 0:
            raise AudioReadError(f"{path}: empty mp3 stream")
        # mpg123 emits interleaved frames; channel-major like every decoder
        wav = np.ascontiguousarray(
            flat[: n * nch].reshape(n, nch).T
        ).astype(np.float32, copy=False)
        return wav, int(rate.value)
    finally:
        lib.mpg123_close(mh)
        lib.mpg123_delete(mh)
