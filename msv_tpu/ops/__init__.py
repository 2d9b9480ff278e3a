"""DSP + rendering primitives (reference layer L1/L2/L4, SURVEY.md §1).

Host-side (numpy) constant builders: windows, mel filterbanks, DFT matrices,
resize weights.  Device-side (jnp, jit) compute: STFT, dB, grey/colormap,
waveform envelope.
"""

from .windows import hann, cosine_window, hamming, blackman, blackman_harris
from .mel import hz_to_mel, mel_to_hz, calc_mel_fb, calc_mel_fb_default
from .decibel import (amp_to_db, power_to_db, db_to_amp, db_to_power,
                      a_weighting)
from .stft import perform_stft, stft_magnitude, inverse_stft
from .dft import inverse_rdft, windowed_dft_matrices
from .framing import n_frames_for, reflect_pad_center
from .multires import multires_mel_spec_db
from .resample import resample, resample_poly
from .reconstruct import griffin_lim, mel_to_linear
from .hpss import hpss, hpss_masks
from .pitch import yin
from .cqt import cqt, cqt_frequencies
from .loudness import (integrated_loudness, k_weighting_coeffs,
                       loudness_range, short_term_loudness, true_peak)
from .rhythm import (beat_track, beat_track_from_envelope,
                     tempo_from_tempogram, tempogram_from_envelope)
from .filter import (butter_sos, peaking_eq, low_shelf, high_shelf, notch,
                     sosfilt, sosfilt_streamed, filtfilt, firwin, fir_filter)
from .align import align_offset, AlignResult
from .declick import declick, find_clicks
from .denoise import denoise, wiener_gain

__all__ = [
    "align_offset",
    "AlignResult",
    "declick",
    "denoise",
    "find_clicks",
    "wiener_gain",
    "butter_sos",
    "peaking_eq",
    "low_shelf",
    "high_shelf",
    "notch",
    "sosfilt",
    "sosfilt_streamed",
    "filtfilt",
    "firwin",
    "fir_filter",
    "integrated_loudness",
    "loudness_range",
    "short_term_loudness",
    "true_peak",
    "k_weighting_coeffs",
    "beat_track",
    "beat_track_from_envelope",
    "tempo_from_tempogram",
    "tempogram_from_envelope",
    "cqt",
    "cqt_frequencies",
    "yin",
    "hpss",
    "hpss_masks",
    "a_weighting",
    "resample",
    "resample_poly",
    "griffin_lim",
    "mel_to_linear",
    "hann",
    "cosine_window",
    "hamming",
    "blackman",
    "blackman_harris",
    "hz_to_mel",
    "mel_to_hz",
    "calc_mel_fb",
    "calc_mel_fb_default",
    "amp_to_db",
    "power_to_db",
    "db_to_amp",
    "db_to_power",
    "perform_stft",
    "stft_magnitude",
    "inverse_stft",
    "inverse_rdft",
    "windowed_dft_matrices",
    "n_frames_for",
    "reflect_pad_center",
    "multires_mel_spec_db",
]
