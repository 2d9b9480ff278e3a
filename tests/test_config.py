"""Config/derivation tests (reference: lib.rs:43-46, SpecSetting defaults)."""

import pytest

from msv_tpu.config import (
    FreqScale,
    SpecSetting,
    derive_stft_params,
    get_engine,
    get_precision_mode,
    set_engine,
    set_precision_mode,
)


def test_defaults_match_reference():
    s = SpecSetting()
    assert (s.win_ms, s.t_overlap, s.f_overlap, s.db_range) == (40.0, 4, 1, 120.0)
    assert s.freq_scale == FreqScale.MEL  # lib.rs:93-99


def test_f_overlap_multiplies_n_fft():
    p1 = derive_stft_params(16000, SpecSetting(f_overlap=1))
    p2 = derive_stft_params(16000, SpecSetting(f_overlap=2))
    assert p2.n_fft == 2 * p1.n_fft
    assert p2.win_length == p1.win_length  # window unchanged
    assert p2.n_freq == p2.n_fft // 2 + 1


def test_t_overlap_changes_hop():
    p2 = derive_stft_params(16000, SpecSetting(t_overlap=2))
    p8 = derive_stft_params(16000, SpecSetting(t_overlap=8))
    assert p2.win_length % p2.hop_length == 0
    assert p8.win_length % p8.hop_length == 0
    assert p2.hop_length > p8.hop_length


def test_weird_sample_rates_keep_invariants():
    for sr in (4000, 11025, 22050, 32000, 88200, 96000, 192000):
        p = derive_stft_params(sr, SpecSetting())
        assert p.win_length % p.hop_length == 0  # framing contract
        assert p.n_fft >= p.win_length
        assert p.n_fft & (p.n_fft - 1) == 0  # power of two (f_overlap=1)


def test_mode_setters_roundtrip():
    assert get_precision_mode() == "parity"
    set_precision_mode("fast")
    try:
        assert get_precision_mode() == "fast"
    finally:
        set_precision_mode("parity")
    assert get_engine() == "auto"
    set_engine("xla")
    try:
        assert get_engine() == "xla"
    finally:
        set_engine("auto")


def test_precision_scope_restores_latch():
    """precision_mode_scope restores BOTH the mode and the explicit
    latch, so a transient parity cycle (e.g. a tool forcing parity
    around one call) cannot permanently flip feature defaults that
    consult precision_mode_is_explicit()."""
    from msv_tpu.config import (
        precision_mode_is_explicit,
        precision_mode_scope,
        reset_precision_mode,
    )

    assert not precision_mode_is_explicit()
    with precision_mode_scope("parity"):
        assert precision_mode_is_explicit()
        assert get_precision_mode() == "parity"
    assert not precision_mode_is_explicit()  # latch restored
    assert get_precision_mode() == "parity"

    # a raw set latches; reset clears it
    set_precision_mode("fast")
    assert precision_mode_is_explicit()
    reset_precision_mode()
    assert not precision_mode_is_explicit()
    assert get_precision_mode() == "parity"

    # nesting: inner scope restores to the outer scope's latched state
    set_precision_mode("fast")
    with precision_mode_scope("parity"):
        assert get_precision_mode() == "parity"
    assert get_precision_mode() == "fast" and precision_mode_is_explicit()
