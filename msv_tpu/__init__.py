"""msv_tpu — TPU-native multi-track spectrogram/waveform viewer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Sytronik/multi-spectrogram-viewer ("thesia"): decode audio -> centered STFT
-> optional Slaney-mel projection -> dB -> globally-normalized grey ->
Lanczos3 resize -> colormapped RGB spectrogram images, plus min/max-envelope
waveform RGBA images, for N tracks at heterogeneous sample rates sharing one
time axis.

Where the reference is a Rust+rayon per-frame-FFT design (SURVEY.md §1), this
framework runs one fused, batched, statically-shaped device pipeline:
frames -> windowed-DFT GEMM -> |.| -> mel GEMM -> dB -> normalize -> separable
Lanczos3 resize (two GEMMs) -> colormap LUT, with pjit/shard_map batch and
sequence sharding for multi-chip scaling (msv_tpu.parallel).
"""

from .config import FreqScale, SpecSetting, StftParams, derive_stft_params
from .config import (get_precision_mode, get_session_hbm_budget,
                     set_precision_mode, set_session_hbm_budget)
from .session import AudioTrack, MultiTrack
from .render.colormap import get_colormap
from .ops.reconstruct import griffin_lim, mel_to_linear
from .ops.resample import resample, resample_poly, resample_streamed
from .ops.effects import pitch_shift, split, time_stretch, trim
from .ops.hpss import hpss, hpss_masks
from .ops.pitch import yin
from .ops.cqt import cqt, cqt_frequencies
from .ops.loudness import (integrated_loudness, loudness_range,
                           true_peak)
from .ops.rhythm import beat_track, tempogram_from_envelope
from .ops.tonal import estimate_key, tonnetz
from .ops.sequence import dtw, smooth_f0_viterbi, viterbi, yin_smoothed
from .ops.segment import segment, segment_boundaries, self_similarity
from .ops.filter import butter_sos, filtfilt, firwin, sosfilt
from .ops.align import align_offset
from .ops.declick import declick, find_clicks
from .ops.denoise import denoise
from .features import (
    analyze,
    chroma_filterbank,
    chroma_stft,
    delta,
    onset_detect,
    onset_strength,
    log_mel_spectrogram,
    log_mel_spectrogram_ragged,
    mfcc,
    pcen,
    spectral_contrast,
    spectral_features,
    whisper_log_mel,
)

__version__ = "0.3.0"

__all__ = [
    "align_offset",
    "declick",
    "denoise",
    "find_clicks",
    "butter_sos",
    "sosfilt",
    "filtfilt",
    "firwin",
    "analyze",
    "FreqScale",
    "SpecSetting",
    "StftParams",
    "derive_stft_params",
    "get_precision_mode",
    "set_precision_mode",
    "set_session_hbm_budget",
    "get_session_hbm_budget",
    "AudioTrack",
    "MultiTrack",
    "get_colormap",
    "griffin_lim",
    "mel_to_linear",
    "resample",
    "resample_poly",
    "resample_streamed",
    "hpss",
    "hpss_masks",
    "pitch_shift",
    "time_stretch",
    "split",
    "trim",
    "yin",
    "cqt",
    "cqt_frequencies",
    "integrated_loudness",
    "loudness_range",
    "true_peak",
    "beat_track",
    "tempogram_from_envelope",
    "estimate_key",
    "tonnetz",
    "dtw",
    "smooth_f0_viterbi",
    "viterbi",
    "yin_smoothed",
    "segment",
    "segment_boundaries",
    "self_similarity",
    "chroma_filterbank",
    "chroma_stft",
    "delta",
    "onset_detect",
    "onset_strength",
    "log_mel_spectrogram",
    "log_mel_spectrogram_ragged",
    "mfcc",
    "pcen",
    "spectral_contrast",
    "spectral_features",
    "whisper_log_mel",
    "__version__",
]
