"""Typed errors (SURVEY.md §5.c).

The reference surfaces ``io::Error`` to JS as exceptions via
``wasm_bindgen(catch)`` (lib.rs:170-176) and panics on unknown track ids
(lib.rs:113,266,295).  We replace the panics with typed Python exceptions.
"""


class MsvError(Exception):
    """Base class for all msv_tpu errors."""


class AudioReadError(MsvError):
    """Failed to open or decode an audio file (reference: audio.rs:23-26)."""


class AdaptiveBuildPending(MsvError):
    """A non-blocking adaptive render asked for frames the background
    full-dB build has not produced yet (hour-scale builds take minutes;
    the viewer turns this into HTTP 202 + progress instead of stalling).
    """

    def __init__(self, built: int, total: int):
        super().__init__(
            f"adaptive full-dB build in progress: {built}/{total} frames"
        )
        self.built = built
        self.total = total


class TrackNotFoundError(MsvError, KeyError):
    """Unknown track id (reference panics via ``.unwrap()``, lib.rs:113)."""

    def __init__(self, id):
        super().__init__(id)
        self.id = id

    def __str__(self):
        # KeyError.__str__ is repr(args[0]) — a bare "0" in an HTTP 500
        # body; say what actually went wrong
        return f"track {self.id!r} not found"
