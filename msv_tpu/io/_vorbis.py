"""Ogg/Vorbis decoding via ctypes on the system libvorbisfile.

The reference decodes vorbis through rodio (audio.rs:23-30, codec enabled
at Cargo.toml:18).  This image has no rodio/soundfile, but it ships
``libvorbisfile.so.3`` — we bind the four calls we need directly.  The
OggVorbis_File struct is treated as an opaque, generously-oversized buffer
(the library only pokes inside its own struct; the caller just provides
storage), so no header files are required.

Returns float32 channel-major arrays, matching rodio's f32 conversion of
the decoder output.
"""

import ctypes
import ctypes.util
import os
import threading

import numpy as np

from ..utils.errors import AudioReadError

# real sizeof(OggVorbis_File) is ~944 on LP64; 8 KiB gives a wide margin
_OVFILE_BYTES = 8192

_LIB = None
_TRIED = False
_LOAD_LOCK = threading.Lock()


class _VorbisInfoHead(ctypes.Structure):
    # First three fields of vorbis_info (stable public ABI); the rest of
    # the struct is library-owned and never touched here.
    _fields_ = [
        ("version", ctypes.c_int),
        ("channels", ctypes.c_int),
        ("rate", ctypes.c_long),
    ]


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
    for name in ("libvorbisfile.so.3", "libvorbisfile.so",
                 ctypes.util.find_library("vorbisfile")):
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
    lib.ov_fopen.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    lib.ov_fopen.restype = ctypes.c_int
    lib.ov_info.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ov_info.restype = ctypes.POINTER(_VorbisInfoHead)
    lib.ov_read_float.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.POINTER(ctypes.c_float))),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ov_read_float.restype = ctypes.c_long
    lib.ov_pcm_total.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ov_pcm_total.restype = ctypes.c_int64
    lib.ov_clear.argtypes = [ctypes.c_void_p]
    lib.ov_clear.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _load() is not None


def decode(path: str):
    """Decode an Ogg/Vorbis file -> (wav f32 (n_ch, n_samples), sr)."""
    lib = _load()
    if lib is None:
        raise AudioReadError(
            f"{path}: vorbis decoding unavailable (libvorbisfile not found)"
        )
    if not os.path.exists(path):
        raise AudioReadError(f"{path}: no such file")
    vf = ctypes.create_string_buffer(_OVFILE_BYTES)
    rc = lib.ov_fopen(path.encode(), vf)
    if rc != 0:
        raise AudioReadError(f"{path}: not a valid Ogg/Vorbis stream ({rc})")
    try:
        info = lib.ov_info(vf, -1)
        if not info:
            raise AudioReadError(f"{path}: vorbis stream has no info header")
        n_ch = int(info.contents.channels)
        sr = int(info.contents.rate)
        if n_ch <= 0 or sr <= 0:
            raise AudioReadError(f"{path}: bad vorbis params ch={n_ch} sr={sr}")
        total = int(lib.ov_pcm_total(vf, -1))  # -1 if unseekable; hint only
        chunks = []
        pcm = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))()
        bitstream = ctypes.c_int(0)
        cur_link = None
        while True:
            got = lib.ov_read_float(vf, ctypes.byref(pcm), 4096,
                                    ctypes.byref(bitstream))
            if got == 0:
                break
            if got < 0:  # OV_HOLE etc: skip corrupt section, keep going
                continue
            if bitstream.value != cur_link:
                # chained streams may change channel layout per link; the
                # pcm pointer array is only n_ch_link long, so indexing
                # past it would read garbage pointers (or crash)
                cur_link = bitstream.value
                link_info = lib.ov_info(vf, cur_link)
                if link_info and int(link_info.contents.channels) != n_ch:
                    raise AudioReadError(
                        f"{path}: chained vorbis stream changes channel "
                        "count mid-file (unsupported)"
                    )
            block = np.empty((n_ch, got), np.float32)
            for ch in range(n_ch):
                block[ch] = np.ctypeslib.as_array(pcm[ch], shape=(got,))
            chunks.append(block)
        if not chunks:
            raise AudioReadError(f"{path}: empty vorbis stream")
        wav = np.concatenate(chunks, axis=1)
        if total > 0 and wav.shape[1] > total:
            wav = wav[:, :total]
        return np.ascontiguousarray(wav), sr
    finally:
        lib.ov_clear(vf)
