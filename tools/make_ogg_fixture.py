"""Generate committed Ogg/Vorbis test fixtures via the system libvorbisenc.

The image has no vorbis encoding tool, but it ships libvorbisenc/libvorbis/
libogg — this drives the canonical encode loop through ctypes.  Library
structs that the caller must allocate (vorbis_info, dsp state, block, ogg
stream state) are opaque oversized buffers; only ogg_packet/ogg_page have
real (stable, public) layouts, which we declare.

Usage: python tools/make_ogg_fixture.py  (writes tests/fixtures/*.ogg)
"""

import ctypes
import os
import sys

import numpy as np

_c = ctypes


class OggPacket(_c.Structure):
    _fields_ = [
        ("packet", _c.POINTER(_c.c_ubyte)),
        ("bytes", _c.c_long),
        ("b_o_s", _c.c_long),
        ("e_o_s", _c.c_long),
        ("granulepos", _c.c_int64),
        ("packetno", _c.c_int64),
    ]


class OggPage(_c.Structure):
    _fields_ = [
        ("header", _c.POINTER(_c.c_ubyte)),
        ("header_len", _c.c_long),
        ("body", _c.POINTER(_c.c_ubyte)),
        ("body_len", _c.c_long),
    ]


def encode_vorbis(wav: np.ndarray, sr: int, quality: float = 0.4) -> bytes:
    """float32 (n_ch, n_samples) -> Ogg/Vorbis bytes."""
    wav = np.atleast_2d(np.asarray(wav, np.float32))
    n_ch, n = wav.shape

    lv = _c.CDLL("libvorbis.so.0")
    lve = _c.CDLL("libvorbisenc.so.2")
    lo = _c.CDLL("libogg.so.0")

    lv.vorbis_analysis_buffer.restype = _c.POINTER(_c.POINTER(_c.c_float))
    lve.vorbis_encode_init_vbr.argtypes = [
        _c.c_void_p, _c.c_long, _c.c_long, _c.c_float,
    ]

    # opaque caller-allocated structs, generously oversized
    vi = _c.create_string_buffer(1024)     # vorbis_info (~56 B)
    vc = _c.create_string_buffer(1024)     # vorbis_comment (~32 B)
    vd = _c.create_string_buffer(16384)    # vorbis_dsp_state (~152 B)
    vb = _c.create_string_buffer(16384)    # vorbis_block (~192 B)
    osb = _c.create_string_buffer(16384)   # ogg_stream_state (~408 B)

    lv.vorbis_info_init(vi)
    rc = lve.vorbis_encode_init_vbr(
        _c.cast(vi, _c.c_void_p), n_ch, sr, _c.c_float(quality))
    if rc != 0:
        raise RuntimeError(f"vorbis_encode_init_vbr failed ({rc})")
    lv.vorbis_comment_init(vc)
    lv.vorbis_analysis_init(vd, vi)
    lv.vorbis_block_init(vd, vb)
    lo.ogg_stream_init(osb, 424242)

    out = bytearray()
    og = OggPage()

    def drain(flush: bool):
        fn = lo.ogg_stream_flush if flush else lo.ogg_stream_pageout
        while fn(osb, _c.byref(og)):
            out.extend(_c.string_at(og.header, og.header_len))
            out.extend(_c.string_at(og.body, og.body_len))

    hd, hc, hcode = OggPacket(), OggPacket(), OggPacket()
    lv.vorbis_analysis_headerout(vd, vc, _c.byref(hd), _c.byref(hc),
                                 _c.byref(hcode))
    for pk in (hd, hc, hcode):
        lo.ogg_stream_packetin(osb, _c.byref(pk))
    drain(flush=True)  # headers must end a page before audio

    op = OggPacket()
    pos = 0
    CH = 1024
    while True:
        take = min(CH, n - pos)
        if take > 0:
            buf = lv.vorbis_analysis_buffer(vd, take)
            for ch in range(n_ch):
                _c.memmove(buf[ch],
                           np.ascontiguousarray(wav[ch, pos:pos + take]).ctypes.data,
                           take * 4)
            lv.vorbis_analysis_wrote(vd, take)
            pos += take
        else:
            lv.vorbis_analysis_wrote(vd, 0)  # EOS
        while lv.vorbis_analysis_blockout(vd, vb) == 1:
            lv.vorbis_analysis(vb, None)
            lv.vorbis_bitrate_addblock(vb)
            while lv.vorbis_bitrate_flushpacket(vd, _c.byref(op)) == 1:
                lo.ogg_stream_packetin(osb, _c.byref(op))
                drain(flush=False)
        if take == 0:
            break
    drain(flush=True)

    lo.ogg_stream_clear(osb)
    lv.vorbis_block_clear(vb)
    lv.vorbis_dsp_clear(vd)
    lv.vorbis_comment_clear(vc)
    lv.vorbis_info_clear(vi)
    return bytes(out)


def main():
    fixdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    os.makedirs(fixdir, exist_ok=True)

    sr = 8000
    t = np.arange(int(sr * 0.5)) / sr
    mono = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)[None, :]
    with open(os.path.join(fixdir, "sine440_8k.ogg"), "wb") as f:
        f.write(encode_vorbis(mono, sr))
    print("wrote sine440_8k.ogg", mono.shape)

    t = np.arange(int(sr * 0.3)) / sr
    stereo = np.stack([
        (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32),
        (0.3 * np.sin(2 * np.pi * 660.0 * t)).astype(np.float32),
    ])
    with open(os.path.join(fixdir, "duotone_8k_stereo.ogg"), "wb") as f:
        f.write(encode_vorbis(stereo, sr))
    print("wrote duotone_8k_stereo.ogg", stereo.shape)


if __name__ == "__main__":
    sys.exit(main())
