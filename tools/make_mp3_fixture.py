"""Generate committed MP3 test fixtures via the system libmp3lame.

Same story as tools/make_ogg_fixture.py: the image has no encoder CLI but
ships ``libmp3lame.so.0``; this drives the canonical lame encode loop
through ctypes.  High-bitrate CBR keeps the tonal fixtures close to the
source so the codec tests can compare waveforms, and lame's Xing/LAME
header carries the gapless (delay/padding) info that mpg123 honors on
decode — the round trip is sample-count-exact.

Usage: python tools/make_mp3_fixture.py  (writes tests/fixtures/*.mp3)
"""

import ctypes
import os
import sys

import numpy as np

_c = ctypes


def encode_mp3(wav: np.ndarray, sr: int, kbps: int = 320) -> bytes:
    """float32 (n_ch<=2, n_samples) -> MP3 bytes (CBR kbps)."""
    wav = np.atleast_2d(np.ascontiguousarray(wav, np.float32))
    n_ch, n = wav.shape
    if n_ch > 2:
        raise ValueError("mp3 supports at most 2 channels")

    lame = _c.CDLL("libmp3lame.so.0")
    lame.lame_init.restype = _c.c_void_p
    for f in ("lame_set_in_samplerate", "lame_set_num_channels",
              "lame_set_brate", "lame_set_VBR", "lame_init_params",
              "lame_close"):
        getattr(lame, f).argtypes = (
            [_c.c_void_p] if f in ("lame_init_params", "lame_close")
            else [_c.c_void_p, _c.c_int]
        )
        getattr(lame, f).restype = _c.c_int
    lame.lame_encode_buffer_ieee_float.argtypes = [
        _c.c_void_p, _c.POINTER(_c.c_float), _c.POINTER(_c.c_float),
        _c.c_int, _c.POINTER(_c.c_ubyte), _c.c_int,
    ]
    lame.lame_encode_buffer_ieee_float.restype = _c.c_int
    lame.lame_encode_flush.argtypes = [
        _c.c_void_p, _c.POINTER(_c.c_ubyte), _c.c_int,
    ]
    lame.lame_encode_flush.restype = _c.c_int
    lame.lame_get_lametag_frame.argtypes = [
        _c.c_void_p, _c.POINTER(_c.c_ubyte), _c.c_size_t,
    ]
    lame.lame_get_lametag_frame.restype = _c.c_size_t

    gfp = lame.lame_init()
    if not gfp:
        raise RuntimeError("lame_init failed")
    lame.lame_set_in_samplerate(gfp, sr)
    lame.lame_set_num_channels(gfp, n_ch)
    lame.lame_set_VBR(gfp, 0)  # vbr_off -> CBR
    lame.lame_set_brate(gfp, kbps)
    if lame.lame_init_params(gfp) < 0:
        raise RuntimeError(f"lame_init_params rejected sr={sr} ch={n_ch}")

    left = np.ascontiguousarray(wav[0])
    right = np.ascontiguousarray(wav[1] if n_ch == 2 else wav[0])
    cap = int(1.25 * n + 7200) + 7200
    out = (_c.c_ubyte * cap)()
    nb = lame.lame_encode_buffer_ieee_float(
        gfp,
        left.ctypes.data_as(_c.POINTER(_c.c_float)),
        right.ctypes.data_as(_c.POINTER(_c.c_float)),
        n, out, cap,
    )
    if nb < 0:
        raise RuntimeError(f"lame_encode_buffer failed ({nb})")
    data = bytes(out[:nb])
    nb = lame.lame_encode_flush(gfp, out, cap)
    if nb < 0:
        raise RuntimeError(f"lame_encode_flush failed ({nb})")
    data += bytes(out[:nb])
    # back-patch the first (Xing/LAME) frame with the real delay/padding
    ntag = lame.lame_get_lametag_frame(gfp, out, cap)
    if 0 < ntag <= len(data):
        data = bytes(out[:ntag]) + data[ntag:]
    lame.lame_close(gfp)
    return data


def main():
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    os.makedirs(outdir, exist_ok=True)

    sr = 16000
    t = np.arange(int(sr * 0.8), dtype=np.float32) / np.float32(sr)
    sine = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    with open(os.path.join(outdir, "sine440_16k.mp3"), "wb") as f:
        f.write(encode_mp3(sine[None], sr))
    print("wrote sine440_16k.mp3", len(sine), "samples")

    sr2 = 44100
    t2 = np.arange(int(sr2 * 0.6), dtype=np.float32) / np.float32(sr2)
    st = np.stack([
        0.4 * np.sin(2 * np.pi * 523.25 * t2),
        0.4 * np.sin(2 * np.pi * 659.25 * t2),
    ]).astype(np.float32)
    with open(os.path.join(outdir, "duotone_44k1_stereo.mp3"), "wb") as f:
        f.write(encode_mp3(st, sr2))
    print("wrote duotone_44k1_stereo.mp3", st.shape[1], "samples")
    return 0


if __name__ == "__main__":
    sys.exit(main())
