"""Pallas fused spectrogram kernel vs the pure-XLA pipeline (interpret mode
on CPU; the real Mosaic compile is exercised on TPU by bench/CLI)."""

import jax.numpy as jnp
import numpy as np
import pytest

from msv_tpu.config import SpecSetting, derive_stft_params
from msv_tpu.kernels.pipeline import spec_pipeline
from msv_tpu.kernels.spectrogram_pallas import (
    TILE_F,
    mel_spectrogram_pallas,
    prepare_operands,
)
from msv_tpu.ops.dft import windowed_dft_matrices
from msv_tpu.ops.framing import n_frames_for, reflect_pad_center
from msv_tpu.ops.mel import calc_mel_fb_default
from msv_tpu.ops.windows import default_stft_window
from msv_tpu.utils import round_up_to


@pytest.mark.parametrize("sr", [8000, 16000])
def test_pallas_matches_xla_pipeline(sr, rng):
    p = derive_stft_params(sr, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    mel_fb = calc_mel_fb_default(sr, p.n_fft)

    wav = (rng.standard_normal(sr // 2) * 0.4).astype(np.float32)
    win, hop = p.win_length, p.hop_length
    n_frames = n_frames_for(len(wav), win, hop)
    n_frames_pad = round_up_to(n_frames, TILE_F)
    padded = reflect_pad_center(wav, win)

    wav2d, c_p, s_p, fb_p, n_mel = prepare_operands(
        padded, c, s, mel_fb, win, hop, n_frames_pad
    )
    got = mel_spectrogram_pallas(
        jnp.asarray(wav2d),
        jnp.asarray(c_p),
        jnp.asarray(s_p),
        jnp.asarray(fb_p),
        win=win,
        hop=hop,
        n_frames=n_frames_pad,
        interpret=True,
    )
    got = np.asarray(got)[:n_frames, :n_mel]

    need = (n_frames_pad - 1) * hop + win
    padded_x = np.pad(padded, (0, max(0, need - len(padded))))
    expect, _, _ = spec_pipeline(
        jnp.asarray(padded_x),
        jnp.asarray(c),
        jnp.asarray(s),
        jnp.asarray(mel_fb),
        jnp.int32(n_frames),
        win=win,
        hop=hop,
        n_frames=n_frames_pad,
        use_mel=True,
        mode="parity",
    )
    expect = np.asarray(expect)[:n_frames]
    np.testing.assert_allclose(got, expect, atol=2e-3, rtol=1e-4)


def test_pallas_validation():
    with pytest.raises(ValueError):
        mel_spectrogram_pallas(
            jnp.zeros((10, 80)),
            jnp.zeros((320, 512)),
            jnp.zeros((320, 512)),
            jnp.zeros((512, 128)),
            win=320,
            hop=80,
            n_frames=100,  # not a TILE_F multiple
            interpret=True,
        )


def test_pallas_i16_transfer_format(rng):
    """int16 wav2d input (DMA'd as (16,128) tiles, scaled in assembly) must
    equal the f32 path exactly."""
    sr = 8000
    p = derive_stft_params(sr, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    mel_fb = calc_mel_fb_default(sr, p.n_fft)
    i16 = (rng.standard_normal(sr) * 8000).astype(np.int16)
    f32 = i16.astype(np.float32) / np.float32(32768.0)
    win, hop = p.win_length, p.hop_length
    n_pad = round_up_to(n_frames_for(sr, win, hop), TILE_F)

    from msv_tpu.kernels.spectrogram_pallas import prepare_matrices, prepare_wav2d
    from msv_tpu.ops.framing import reflect_pad_center

    c3, s3, fb3, n_mel = prepare_matrices(c, s, mel_fb, win)
    outs = {}
    for name, wav in [("i16", i16), ("f32", f32)]:
        padded = reflect_pad_center(wav, win)
        wav2d = prepare_wav2d(padded, win, hop, n_pad)
        outs[name] = np.asarray(
            mel_spectrogram_pallas(
                jnp.asarray(wav2d),
                jnp.asarray(c3),
                jnp.asarray(s3),
                jnp.asarray(fb3),
                win=win,
                hop=hop,
                n_frames=n_pad,
                interpret=True,
            )
        )
    np.testing.assert_array_equal(outs["i16"], outs["f32"])


def test_auto_tile_f_caps_f32_operands_at_128():
    """f32 (parity) operands must never get a frame tile above 128: tf256
    with f32 blows Mosaic scoped VMEM on v5e even though the declared
    scratch fits the budget (measured; see _auto_tile_f docstring).  bf16
    operands take the larger VMEM-fitting tile at typical shapes."""
    from msv_tpu.kernels.spectrogram_pallas import TILE_F, _auto_tile_f

    # typical 48 kHz derived shapes: win_p=1920, hop_p=512, n_mel_p=128
    for n_frames in (256, 512, 1024, 4096):
        got = _auto_tile_f(n_frames, 1920, 512, 128, 4, 4, 4)
        assert got == TILE_F == 128, (n_frames, got)
    # bf16 operands at the same shapes fit 512-frame tiles
    assert _auto_tile_f(512, 1920, 512, 128, 4, 2, 4) == 512
    assert _auto_tile_f(1024, 1920, 512, 128, 4, 2, 2) == 512
    # non-dividing n_frames falls back to the largest divisor <= budget
    assert _auto_tile_f(256, 1920, 512, 128, 4, 2, 4) == 256


def _operands(sr, rng, seconds=0.5):
    p = derive_stft_params(sr, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    mel_fb = calc_mel_fb_default(sr, p.n_fft)
    wav = (rng.standard_normal(int(sr * seconds)) * 0.4).astype(np.float32)
    win, hop = p.win_length, p.hop_length
    n_frames = n_frames_for(len(wav), win, hop)
    n_frames_pad = round_up_to(n_frames, 512)  # divisible by every tile_f
    padded = reflect_pad_center(wav, win)
    ops = prepare_operands(padded, c, s, mel_fb, win, hop, n_frames_pad)
    return ops, win, hop, n_frames, n_frames_pad


@pytest.mark.parametrize("sr", [8000, 16000])
def test_resident_variant_matches_stream(sr, rng):
    """The VMEM-resident schedule must be bit-identical to the streaming
    schedule (same dots in the same order, only the operand delivery
    changes) — VERDICT r3 #2's persist-in-VMEM shot."""
    (wav2d, c_p, s_p, fb_p, n_mel), win, hop, n_frames, n_frames_pad = \
        _operands(sr, rng)
    args = [jnp.asarray(x) for x in (wav2d, c_p, s_p, fb_p)]
    kw = dict(win=win, hop=hop, n_frames=n_frames_pad, interpret=True)
    a = np.asarray(mel_spectrogram_pallas(*args, variant="stream",
                                          tile_f=128, **kw))
    b = np.asarray(mel_spectrogram_pallas(*args, variant="resident",
                                          tile_f=128, **kw))
    np.testing.assert_array_equal(a[:n_frames, :n_mel],
                                  b[:n_frames, :n_mel])
    # auto-select picks resident for these small buckets (parity f32 fits)
    c2 = np.asarray(mel_spectrogram_pallas(*args, **kw))
    np.testing.assert_array_equal(c2[:n_frames, :n_mel],
                                  a[:n_frames, :n_mel])


def test_resident_plan_budget():
    """Small bf16 buckets fit resident at large frame tiles; the 48 kHz
    bucket's ~11 MB bf16 operand set does not fit under the conservative
    2x double-buffer assumption; f32 caps at tile_f 128 (the measured
    Mosaic scoped-VMEM ceiling)."""
    from msv_tpu.kernels.spectrogram_pallas import _resident_plan

    # 16 kHz bucket: win_p 640, nk=3 (n_freq_p 768), n_mel_p 384, bf16
    fits, tf = _resident_plan(2048, 3, 640, 256, 384, 4, 2, 2)
    assert fits and tf == 512
    # same bucket, f32 (parity): fits but capped at 128
    fits, tf = _resident_plan(2048, 3, 640, 256, 384, 4, 4, 4)
    assert fits and tf == 128
    # 48 kHz bucket bf16: nk=5, win_p 1920, n_mel_p 512 -> ~11 MB x2: no
    fits, _ = _resident_plan(2048, 5, 1920, 512, 512, 4, 2, 2)
    assert not fits
    # forcing resident on a non-fitting shape raises
    with pytest.raises(ValueError, match="resident"):
        mel_spectrogram_pallas(
            jnp.zeros((2051, 512), jnp.float32),
            jnp.zeros((5, 1920, 256), jnp.bfloat16),
            jnp.zeros((5, 1920, 256), jnp.bfloat16),
            jnp.zeros((5, 256, 512), jnp.bfloat16),
            win=1920, hop=480, n_frames=2048, interpret=True,
            variant="resident",
        )


@pytest.mark.parametrize("variant", ["stream", "resident"])
def test_batched_launch_matches_per_row(variant, rng):
    """A stacked (B, rows, hop) input runs one (B, frame_tiles)-grid
    launch whose rows are bit-identical to B separate launches — the
    ML frontend's per-clip dispatch loop collapsed (VERDICT r3 #2)."""
    sr = 16000
    (wav2d, c_p, s_p, fb_p, n_mel), win, hop, n_frames, n_frames_pad = \
        _operands(sr, rng)
    rows = [wav2d]
    for _ in range(2):
        w = (rng.standard_normal(sr // 2) * 0.4).astype(np.float32)
        padded = reflect_pad_center(w, win)
        from msv_tpu.kernels.spectrogram_pallas import prepare_wav2d
        rows.append(prepare_wav2d(padded, win, hop, n_frames_pad))
    wav3d = jnp.asarray(np.stack(rows))
    ops = [jnp.asarray(x) for x in (c_p, s_p, fb_p)]
    kw = dict(win=win, hop=hop, n_frames=n_frames_pad, interpret=True,
              tile_f=128, variant=variant)
    got = np.asarray(mel_spectrogram_pallas(wav3d, *ops, **kw))
    assert got.shape[0] == 3
    for b in range(3):
        want = np.asarray(mel_spectrogram_pallas(
            jnp.asarray(rows[b]), *ops, **kw))
        np.testing.assert_array_equal(got[b], want, err_msg=f"row {b}")


@pytest.mark.parametrize("sr", [16000, 48000])
def test_split_mode_accuracy_between_fast_and_parity(sr, rng):
    """Split-f32 (bf16 hi/lo, 3 single-pass dots per f32 GEMM): accuracy
    must sit orders of magnitude inside fast mode and within one grey
    step of parity (round-5 VERDICT #9).  The residual error concentrates
    at deep spectral nulls (cancellation); everywhere else it is ~1e-3 dB."""
    import ml_dtypes

    from msv_tpu.kernels.spectrogram_pallas import (
        mel_spectrogram_pallas, prepare_matrices, prepare_matrices_split,
        prepare_wav2d)

    p = derive_stft_params(sr, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(sr, p.n_fft)
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 1367 * t)
           + 0.005 * rng.standard_normal(len(t))).astype(np.float32)
    n_frames = 128
    padded = reflect_pad_center(wav, p.win_length)
    wav2d = jnp.asarray(prepare_wav2d(padded, p.win_length, p.hop_length,
                                      n_frames))
    c3, s3, fb3, n_mel = prepare_matrices(
        np.asarray(c), np.asarray(s), np.asarray(fb), p.win_length)
    c4, s4, fb4, _ = prepare_matrices_split(
        np.asarray(c), np.asarray(s), np.asarray(fb), p.win_length)
    kw = dict(win=p.win_length, hop=p.hop_length, n_frames=n_frames,
              interpret=True, tile_f=128)
    par = np.asarray(mel_spectrogram_pallas(
        wav2d, jnp.asarray(c3), jnp.asarray(s3), jnp.asarray(fb3),
        mode="parity", **kw))[:, :n_mel]
    fast = np.asarray(mel_spectrogram_pallas(
        wav2d, jnp.asarray(c3.astype(ml_dtypes.bfloat16)),
        jnp.asarray(s3.astype(ml_dtypes.bfloat16)),
        jnp.asarray(fb3.astype(ml_dtypes.bfloat16)),
        mode="fast", **kw))[:, :n_mel]
    split = np.asarray(mel_spectrogram_pallas(
        wav2d, jnp.asarray(c4), jnp.asarray(s4), jnp.asarray(fb4),
        mode="split", **kw))[:, :n_mel]
    d_fast = np.abs(fast - par).max()
    d_split = np.abs(split - par).max()
    assert d_split < 0.47, d_split  # one 120dB/255 grey step
    assert d_split < d_fast / 20, (d_split, d_fast)
    # bulk accuracy: 99th percentile well under 0.01 dB
    assert np.percentile(np.abs(split - par), 99) < 0.01


def test_split_operand_validation(rng):
    from msv_tpu.kernels.spectrogram_pallas import (
        mel_spectrogram_pallas, prepare_matrices, prepare_matrices_split)

    sr = 16000
    p = derive_stft_params(sr, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(sr, p.n_fft)
    c4, s4, fb4, _ = prepare_matrices_split(
        np.asarray(c), np.asarray(s), np.asarray(fb), p.win_length)
    c3, s3, fb3, _ = prepare_matrices(
        np.asarray(c), np.asarray(s), np.asarray(fb), p.win_length)
    wav2d = jnp.zeros((200, 256), jnp.float32)
    with pytest.raises(ValueError):  # mixed split / plain operands
        mel_spectrogram_pallas(
            wav2d, jnp.asarray(c4), jnp.asarray(s3), jnp.asarray(fb3),
            win=p.win_length, hop=p.hop_length, n_frames=128,
            interpret=True)
