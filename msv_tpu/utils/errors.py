"""Typed errors (SURVEY.md §5.c).

The reference surfaces ``io::Error`` to JS as exceptions via
``wasm_bindgen(catch)`` (lib.rs:170-176) and panics on unknown track ids
(lib.rs:113,266,295).  We replace the panics with typed Python exceptions.
"""


class MsvError(Exception):
    """Base class for all msv_tpu errors."""


class AudioReadError(MsvError):
    """Failed to open or decode an audio file (reference: audio.rs:23-26)."""


class TrackNotFoundError(MsvError, KeyError):
    """Unknown track id (reference panics via ``.unwrap()``, lib.rs:113)."""
