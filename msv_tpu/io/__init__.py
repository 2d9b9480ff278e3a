"""Audio + image I/O (reference L0: ``src_rust/audio.rs``; PNG output used
by the reference's integration test lib.rs:516-546)."""

from .audio import open_audio_file, open_audio_file_ex, write_wav
from .png import encode_png, write_png

__all__ = [
    "open_audio_file",
    "open_audio_file_ex",
    "write_wav",
    "encode_png",
    "write_png",
]
