"""Session / orchestration layer (reference L3: MultiTrack, lib.rs:72-365)."""

from .multitrack import AudioTrack, MultiTrack

__all__ = ["AudioTrack", "MultiTrack"]
