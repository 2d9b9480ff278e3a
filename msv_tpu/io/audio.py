"""Audio file decoding (reference: ``open_audio_file``, audio.rs:9-37).

Returns (wav, sr) with wav channel-major float32 (n_channels, n_samples),
matching the reference's layout (audio.rs:33-35: strides (1, n_ch) over the
interleaved buffer).  Int PCM is normalized by 2^(bits-1) (audio.rs:15-19);
float samples pass through.

The decoder prefers the native C++ parser (msv_tpu.native) when built — the
reference's L0 is native (Rust hound/rodio) and ours mirrors that — with a
pure-numpy RIFF parser as the always-available fallback.  Non-WAV codecs
(handled by rodio in the reference, audio.rs:23-30) are covered natively:
FLAC by the from-scratch C++ decoder (native/flac_decoder.cc) and
Ogg/Vorbis by ctypes bindings to the system libvorbisfile (_vorbis.py);
``soundfile`` is only a last-resort fallback for other containers.
"""

import struct

import numpy as np

from ..utils.errors import AudioReadError

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def _parse_wav_numpy(data: bytes, path: str):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioReadError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # fuzz: a flipped size byte truncates the
                raise AudioReadError(  # body below the 16-byte PCM header
                    f"{path}: truncated fmt chunk ({len(body)} bytes)"
                )
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise AudioReadError(f"{path}: missing fmt/data chunk")
    audio_fmt, n_ch, sr, _byte_rate, _block_align, bits = fmt
    if audio_fmt == _WAVE_FORMAT_EXTENSIBLE and len(fmt_body) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the SubFormat GUID (offset 24 in the fmt
        # body) carries the real format tag in its first two bytes.
        (audio_fmt,) = struct.unpack_from("<H", fmt_body, 24)
    if n_ch == 0:
        raise AudioReadError(f"{path}: zero channels")
    if n_ch > 64:
        # hound accepts any u16 here, but a four-digit channel count in a
        # viewer input is certainly a corrupt fmt chunk (fuzz: one flipped
        # byte makes 50k channels x 0 samples) — fail loudly instead
        raise AudioReadError(f"{path}: implausible channel count {n_ch}")
    # defensive truncation: a data chunk whose byte count is not a multiple
    # of the sample size (truncated final sample) must not crash frombuffer
    if bits in (8, 16, 24, 32, 64):
        bsz = bits // 8
        raw = raw[: len(raw) - (len(raw) % bsz)] if bsz > 1 else raw

    if audio_fmt == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(raw, dtype="<f8").astype(np.float32)
        else:
            raise AudioReadError(f"{path}: unsupported float width {bits}")
    elif audio_fmt == _WAVE_FORMAT_PCM:
        if bits == 16:
            i16 = np.frombuffer(raw, dtype="<i2")
            n_samples = len(i16) // n_ch
            i16 = i16[: n_samples * n_ch]
            wav = (
                np.ascontiguousarray(i16.reshape(n_samples, n_ch).T).astype(
                    np.float32
                )
                / np.float32(1 << 15)
            )
            # expose the raw int16 for mono sources: transferring i16 to the
            # device and scaling by 2^-15 there is bit-identical and halves
            # host->device bytes (the axon tunnel is the bottleneck).
            raw_i16 = (
                np.ascontiguousarray(i16) if n_ch == 1 else None
            )
            return wav, int(sr), raw_i16
        if bits == 8:
            # WAV 8-bit is unsigned; hound yields centered i8 -> /2^7.
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128).astype(
                np.float32
            ) / np.float32(128.0)
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / np.float32(1 << 23)
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / np.float32(
                1 << 31
            )
        else:
            raise AudioReadError(f"{path}: unsupported PCM width {bits}")
    else:
        raise AudioReadError(f"{path}: unsupported WAV format tag {audio_fmt:#x}")

    n_samples = len(x) // n_ch
    x = x[: n_samples * n_ch]  # defensive truncation (audio.rs:34)
    wav = np.ascontiguousarray(x.reshape(n_samples, n_ch).T)
    return wav, int(sr), None


def _is_mono_pcm16(data: bytes) -> bool:
    """Cheap fmt-chunk probe: does the numpy raw-i16 fast path apply?"""
    info = _probe_fmt(data)
    return info is not None and info == (_WAVE_FORMAT_PCM, 1, 16)


def _looks_like_mp3(head: bytes) -> bool:
    """MP3 magic: an ID3v2 tag, or an MPEG audio frame sync whose header
    fields are all valid (version/layer/bitrate/samplerate not the
    reserved patterns) — mpg123 itself scans much more permissively, so
    the dispatch stays conservative to avoid claiming arbitrary binaries."""
    if head[:3] == b"ID3":
        return True
    if len(head) >= 4 and head[0] == 0xFF and (head[1] & 0xE0) == 0xE0:
        version = (head[1] >> 3) & 0x3  # 01 = reserved
        layer = (head[1] >> 1) & 0x3  # 00 = reserved
        bitrate = (head[2] >> 4) & 0xF  # 1111 = bad
        srate = (head[2] >> 2) & 0x3  # 11 = reserved
        return version != 1 and layer != 0 and bitrate != 0xF and srate != 3
    return False


def open_audio_file(path: str):
    """Decode an audio file -> (float32 (n_ch, n_samples), sample_rate)."""
    wav, sr, _ = open_audio_file_ex(path)
    return wav, sr


def open_audio_file_ex(path: str):
    """Decode -> (wav f32 (n_ch, n_samples), sr, raw_i16 | None).

    ``raw_i16`` is the untouched PCM16 sample vector when the source is
    16-bit mono WAV — the device pipelines use it as a half-width transfer
    format (scaled by 2^-15 on device, bit-identical to the f32 path).
    """
    try:
        with open(path, "rb") as f:
            head = f.read(12)
            f.seek(0)
            is_wav = head[:4] == b"RIFF" and head[8:12] == b"WAVE"
            is_flac = head[:4] == b"fLaC"
            is_ogg = head[:4] == b"OggS"
            is_mp3 = _looks_like_mp3(head)
            if is_wav:
                # Decoder routing (parity-tested against each other in
                # tests/test_audio.py + tests/test_parity_fuzz.py):
                #  - mono PCM16 -> numpy parser, which also extracts the
                #    raw-i16 device transfer format (half the wire bytes);
                #  - everything else -> the native C++ decoder when built
                #    (one memcpy-speed pass vs several strided numpy passes
                #    on the single host core — decode was 1.2 s of a 1.6 s
                #    add_track for a 60 s stereo file), numpy as fallback.
                # MSV_NATIVE_AUDIO=1 forces native for all WAVs.
                import os as _os

                # probe the header without slurping the file: the native
                # branch re-reads from disk itself, and a full read here
                # would transiently double a large file in host RAM
                head_data = f.read(1 << 18)
                force_native = _os.environ.get("MSV_NATIVE_AUDIO") == "1"
                if force_native or not _is_mono_pcm16(head_data):
                    from . import _native_audio

                    native = _native_audio.try_decode(path)
                    if native is not None:
                        return native[0], native[1], None
                data = head_data + f.read()
                return _parse_wav_numpy(data, path)
    except OSError as e:
        raise AudioReadError(f"{path}: {e}") from e

    # rodio-equivalent codecs (audio.rs:23-30, rodio pinned to
    # flac/vorbis/wav at Cargo.toml:18): FLAC via the native C++ decoder
    # (msv_tpu/native/flac_decoder.cc), Ogg/Vorbis via the system
    # libvorbisfile (io/_vorbis.py).  MP3 via the system libmpg123
    # (io/_mp3.py) is a capability EXTENSION — the reference cannot decode
    # mp3.  soundfile remains a last-resort fallback for anything else,
    # when installed.
    if is_flac:
        from . import _native_audio

        wav, sr = _native_audio.decode_flac(path)
        return wav, int(sr), None
    if is_ogg:
        from . import _vorbis

        wav, sr = _vorbis.decode(path)
        return wav, int(sr), None
    if is_mp3:
        from . import _mp3

        if _mp3.available():
            wav, sr = _mp3.decode(path)
            return wav, int(sr), None
        # no libmpg123 on this host: fall through to the soundfile
        # last-resort path (libsndfile >= 1.1 decodes mp3) rather than
        # dropping the mp3 capability extension entirely (the reference
        # itself cannot decode mp3 — rodio is pinned to flac/vorbis/wav
        # only, Cargo.toml:18)
    try:
        import soundfile  # noqa: F401  (not baked into this image)
    except ImportError:
        if is_mp3:
            raise AudioReadError(
                f"{path}: mp3 decoding unavailable (no libmpg123, no "
                "soundfile)"
            )
        raise AudioReadError(
            f"{path}: unrecognized format (supported: WAV, FLAC, "
            "Ogg/Vorbis, MP3)"
        )
    data, sr = soundfile.read(path, dtype="float32", always_2d=True)
    return np.ascontiguousarray(data.T), int(sr), None


def detect_scaled_int(x: np.ndarray):
    """Exact scaled-integer detection for a float32 signal.

    Finds the MINIMAL shift s such that every sample times 2^s is an
    integer representable in int32, directly from the IEEE mantissas (one
    vector pass, no trial scaling).  Returns (int16|int32 carrier, s) or
    None (denormal/inf/nan present, s would exceed 31, or values overflow
    int32).  ``carrier * 2^-s`` reconstructs the f32 stream BIT-exactly:
    the carrier values are f32-representable by construction and the
    power-of-two scale is exact.

    This is what makes float WAVs converted from 8/16/24/32-bit PCM (and
    f32 channel sums of high-bps sources, whose rounded sums are still
    dyadic rationals) ride the integer wire path — half-or-better the
    bytes of raw f32 and wirepack-compressible (parallel/wirepack.py).
    """
    x = np.ascontiguousarray(x, dtype=np.float32)
    if len(x) == 0:
        return None
    # Chunked scan with early exit: an hour-scale mono is ~700 MB, so the
    # analysis must not materialize whole-array temporaries, and true-float
    # content (the common rejection) should fail on its FIRST chunk, not
    # after a full pass.
    chunk = 1 << 20
    s = 0
    vmin = 0.0
    vmax = 0.0
    for a in range(0, len(x), chunk):
        xc = x[a : a + chunk]
        b = xc.view(np.uint32)
        e = ((b >> np.uint32(23)) & np.uint32(0xFF)).astype(np.int32)
        m = b & np.uint32(0x7FFFFF)
        nz = (e > 0) | (m > 0)  # +-0.0 needs no shift
        if not bool(nz.any()):
            continue
        if bool((nz & (e == 0)).any()) or bool((e == 255).any()):
            return None  # denormals need s up to 149; inf/nan not integers
        mm = m | np.uint32(1 << 23)  # implicit leading 1
        # ctz(mm) = popcount((mm & -mm) - 1)
        low1 = (mm & (np.uint32(0) - mm)) - np.uint32(1)
        ctz = np.bitwise_count(low1).astype(np.int32)
        # fractional bits of |x| = 1.m * 2^(e-127):  23 - (e-127) - ctz
        frac = np.where(nz, 23 - (e - 127) - ctz, 0)
        s = max(s, int(frac.max()), 0)
        if s > 31:
            return None
        vmin = min(vmin, float(xc.min()))
        vmax = max(vmax, float(xc.max()))
    if max(vmax, -vmin) * float(2.0**s) >= 2.0**31:
        return None
    # x * 2^s is f32-EXACT (integral by construction, in range by the
    # max check); convert chunk-wise into a preallocated output so the
    # peak transient stays one extra array, not three (hour mono ~700 MB).
    # int16 range is asymmetric: -2^15 fits, +2^15 does not.
    narrow = (
        s <= 15
        and vmin * float(2.0**s) >= -float(1 << 15)
        and vmax * float(2.0**s) < float(1 << 15)
    )
    v = np.empty(len(x), np.int16 if narrow else np.int32)
    f = np.float32(2.0**s)
    for a in range(0, len(x), chunk):
        v[a : a + chunk] = x[a : a + chunk] * f
    return v, s


def _check_channel(channel, n_ch: int, path: str) -> None:
    if channel is not None and not (0 <= channel < n_ch):
        raise AudioReadError(
            f"{path}: channel {channel} out of range (file has {n_ch})"
        )


def open_audio_mono_ex(path: str, materialize: bool = True, channel=None):
    """Decode -> (mono f32 (n_samples,), sr, raw_int | None, shift, n_ch).

    The session's loader.  ``channel=None`` SUMS channels to mono — the
    reference's behavior (lib.rs:42, marked ``TODO: stereo support``
    there); ``channel=k`` extracts channel k instead (our implementation
    of that TODO — a capability extension).  Whenever the 1-D signal is
    exactly ``raw_int * 2^-shift`` (int16 or int32 carrier), it is
    returned in the INTEGER domain as the device transfer format: the
    device applies the exact power-of-two scale, bit-identical to the f32
    path, at half-or-better the wire bytes and wirepack-compressible
    (parallel/wirepack.py).  Sources covered: PCM16 WAV (shift 15, the
    historical path), FLAC of any bps (exact decoder integers), and any
    f32-valued signal that is secretly a scaled integer — 8/24/32-bit
    PCM, float WAVs converted from PCM, rounded f32 channel sums (see
    :func:`detect_scaled_int`).  True full-entropy float content returns
    raw_int=None, shift=0.  ``n_ch`` is the source channel count.
    """
    try:
        with open(path, "rb") as f:
            head = f.read(12)
            f.seek(0)
            if head[:4] == b"fLaC":
                # FLAC: the native decoder's exact integer samples (units
                # of 2^-(bps-1)).  bps <= 16 re-scales to 2^-15 units by an
                # integer shift (joining the classic WAV wire path);
                # 17..25 bps single-channel signals (mono sum of a mono
                # file, or any extracted channel) ship the decoder
                # integers as-is with shift = bps-1 (values still
                # f32-representable, so the f32 contract is untouched).
                # Everything else falls to the f32 sum + scaled-int
                # detection below.
                from . import _native_audio

                wav2d, sr, raw, bps = _native_audio.decode_flac_ex(path)
                n_ch = wav2d.shape[0]
                _check_channel(channel, n_ch, path)
                if raw is not None and 0 < bps <= 16:
                    if channel is None:
                        mono_i = raw.sum(axis=0, dtype=np.int32) << (16 - bps)
                        mono = wav2d.sum(axis=0) if materialize else None
                    else:
                        # one channel of bps<=16 fits the narrow int16 lane
                        mono_i = (raw[channel] << (16 - bps)).astype(np.int16)
                        mono = (
                            np.ascontiguousarray(wav2d[channel])
                            if materialize else None
                        )
                    return mono, int(sr), mono_i, 15, n_ch
                if raw is not None and 16 < bps <= 25 and (
                    channel is not None or raw.shape[0] == 1
                ):
                    k = channel if channel is not None else 0
                    mono = (
                        np.ascontiguousarray(wav2d[k]) if materialize
                        else None
                    )
                    return (mono, int(sr), np.ascontiguousarray(raw[k]),
                            bps - 1, n_ch)
                mono = (wav2d.sum(axis=0) if channel is None
                        else np.ascontiguousarray(wav2d[channel]))
                det = detect_scaled_int(mono)
                if det is not None:
                    return mono, int(sr), det[0], det[1], n_ch
                return mono, int(sr), None, 0, n_ch
            if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
                head_data = f.read(1 << 18)  # header probe, not a slurp
                info = _probe_fmt(head_data)
                if info is not None and info[0] == _WAVE_FORMAT_PCM and (
                    info[2] == 16 and 1 <= info[1] <= 64
                ):
                    data = head_data + f.read()
                    n_ch = info[1]
                    _check_channel(channel, n_ch, path)
                    raw = _data_chunk(data)
                    if raw is not None:
                        i16 = np.frombuffer(
                            raw[: len(raw) - (len(raw) % (2 * n_ch))], "<i2"
                        )
                        if channel is not None and n_ch > 1:
                            mono_i = np.ascontiguousarray(
                                i16.reshape(-1, n_ch)[:, channel]
                            )
                        elif n_ch == 1:
                            mono_i = np.ascontiguousarray(i16)
                        else:
                            mono_i = i16.reshape(-1, n_ch).sum(
                                axis=1, dtype=np.int32
                            )
                        mono = (
                            mono_i.astype(np.float32) * np.float32(2.0**-15)
                            if materialize
                            else None
                        )
                        return mono, _probe_sr(head_data), mono_i, 15, n_ch
    except OSError as e:
        raise AudioReadError(f"{path}: {e}") from e
    except struct.error as e:
        raise AudioReadError(f"{path}: truncated WAV header ({e})") from e
    wav2d, sr, raw_i16 = open_audio_file_ex(path)
    n_ch = wav2d.shape[0]
    _check_channel(channel, n_ch, path)
    if channel is not None:
        mono = np.ascontiguousarray(wav2d[channel])
        # raw_i16 only exists for mono PCM16 sources (channel 0 == sum)
        if raw_i16 is not None:
            return mono, sr, raw_i16, 15, n_ch
    else:
        mono = wav2d.sum(axis=0)
        if raw_i16 is not None:
            return mono, sr, raw_i16, 15, n_ch
    det = detect_scaled_int(mono)
    if det is not None:
        return mono, sr, det[0], det[1], n_ch
    return mono, sr, None, 0, n_ch


def _probe_fmt(data: bytes):
    """(audio_fmt, n_ch, bits) from the fmt chunk, or None (bounds-safe on
    truncated headers — never raises struct.error)."""
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"fmt " and size >= 16:
            if pos + 8 + 16 > len(data):
                return None  # truncated fmt body
            fmt, n_ch, _sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, pos + 8
            )
            if (fmt == _WAVE_FORMAT_EXTENSIBLE and size >= 26
                    and pos + 8 + 26 <= len(data)):
                (fmt,) = struct.unpack_from("<H", data, pos + 8 + 24)
            return fmt, n_ch, bits
        pos += 8 + size + (size & 1)
    return None


def _probe_sr(data: bytes) -> int:
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"fmt " and size >= 16 and pos + 8 + 8 <= len(data):
            return int(struct.unpack_from("<HHI", data, pos + 8)[2])
        pos += 8 + size + (size & 1)
    raise AudioReadError("missing fmt chunk")


def _data_chunk(data: bytes):
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"data":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    return None


def open_wav_mmap(path: str):
    """Memory-map a mono WAV's sample data -> (np.memmap, sr); dtype int16
    for PCM16, float32 for IEEE-float sources.

    The disk-backed loader for files larger than RAM: callers slice
    segments on demand (parallel/streaming.streaming_spec_db_mmap), so
    resident memory stays at one segment regardless of file size.  Raises
    AudioReadError for anything but mono PCM16 / float32 (the general
    decoder handles those in-memory).
    """
    try:
        with open(path, "rb") as f:
            head = f.read(12)
            if head[:4] != b"RIFF" or head[8:12] != b"WAVE":
                raise AudioReadError(f"{path}: not a RIFF/WAVE file")
            pos = 12
            fmt = None
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
                if cid == b"fmt ":
                    body = f.read(size + (size & 1))
                    fmt = struct.unpack_from("<HHIIHH", body, 0)
                elif cid == b"data":
                    if fmt is None:
                        raise AudioReadError(f"{path}: data before fmt")
                    audio_fmt, n_ch, sr, _, _, bits = fmt
                    if (audio_fmt == _WAVE_FORMAT_PCM and bits == 16
                            and n_ch == 1):
                        dt, isz = "<i2", 2
                    elif (audio_fmt == _WAVE_FORMAT_IEEE_FLOAT and bits == 32
                            and n_ch == 1):
                        dt, isz = "<f4", 4
                    else:
                        raise AudioReadError(
                            f"{path}: mmap loader requires mono PCM16 or "
                            f"float32 (got fmt={audio_fmt:#x}, ch={n_ch}, "
                            f"bits={bits})"
                        )
                    offset = f.tell()
                    return (
                        np.memmap(
                            path,
                            dtype=dt,
                            mode="r",
                            offset=offset,
                            shape=(size // isz,),
                        ),
                        int(sr),
                    )
                else:
                    f.seek(size + (size & 1), 1)
        raise AudioReadError(f"{path}: missing fmt/data chunk")
    except OSError as e:
        raise AudioReadError(f"{path}: {e}") from e


def write_wav(path: str, wav: np.ndarray, sr: int, bits: int = 16) -> None:
    """Write (n_ch, n_samples) float32 -> PCM WAV (test fixture generator)."""
    wav = np.atleast_2d(np.asarray(wav, dtype=np.float32))
    n_ch, n_samples = wav.shape
    interleaved = wav.T.reshape(-1)
    if bits == 16:
        pcm = np.clip(interleaved * (1 << 15), -(1 << 15), (1 << 15) - 1).astype(
            "<i2"
        )
        raw = pcm.tobytes()
        fmt_tag, bytes_per = _WAVE_FORMAT_PCM, 2
    elif bits == 32:
        raw = interleaved.astype("<f4").tobytes()
        fmt_tag, bytes_per = _WAVE_FORMAT_IEEE_FLOAT, 4
    else:
        raise ValueError("write_wav supports 16 (PCM) or 32 (float) bits")
    block = n_ch * bytes_per
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt_tag, n_ch, sr, sr * block, block, bits
    )
    hdr += b"data" + struct.pack("<I", len(raw))
    with open(path, "wb") as f:
        f.write(hdr + raw)
