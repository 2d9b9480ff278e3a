"""Rendering layer (reference L4: ``src_rust/display.rs``).

dB spec -> normalized grey (flip + cross-track frequency alignment pad) ->
Lanczos3 resize (two separable GEMMs on the MXU) -> 10-stop colormap lerp
(VPU) -> RGB u8; plus the min/max-envelope waveform RGBA renderer.
"""

from .colormap import COLORMAP, WAVECOLOR, get_colormap, grey_to_rgb_array
from .grey import spec_to_grey
from .resize import lanczos3_resize, resize_weights
from .envelope import wav_to_image

__all__ = [
    "COLORMAP",
    "WAVECOLOR",
    "get_colormap",
    "grey_to_rgb_array",
    "spec_to_grey",
    "lanczos3_resize",
    "resize_weights",
    "wav_to_image",
]
