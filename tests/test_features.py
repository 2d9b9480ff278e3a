"""Batched log-mel frontend tests (msv_tpu/features.py)."""

import numpy as np
import pytest

from msv_tpu.features import log_mel_spectrogram


def test_shapes_batched_and_single(rng):
    wav = (rng.standard_normal((3, 16000)) * 0.3).astype(np.float32)
    out = log_mel_spectrogram(wav, 16000, n_mel=80)
    # 25 ms / 10 ms at 16 kHz -> win 400, hop 160 -> 101 frames for 1 s
    assert out.shape == (3, 101, 80)
    single = log_mel_spectrogram(wav[0], 16000, n_mel=80)
    assert single.shape == (101, 80)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(out)[0])


def test_matches_op_composition(rng):
    """The one-call frontend equals the manual composition of ops."""
    import jax.numpy as jnp

    from msv_tpu.ops.decibel import amp_to_db
    from msv_tpu.ops.mel import calc_mel_fb
    from msv_tpu.ops.stft import perform_stft
    from msv_tpu.ops.windows import hann

    sr, n_mel = 8000, 40
    wav = (rng.standard_normal(4000) * 0.4).astype(np.float32)
    win, hop, n_fft = 200, 80, 256
    got = np.asarray(
        log_mel_spectrogram(
            wav, sr, n_mel=n_mel, win_length=win, hop_length=hop, n_fft=n_fft
        )
    )
    spec = np.abs(
        np.asarray(perform_stft(wav, win, hop, n_fft, window=hann(win, False)))
    )
    fb = calc_mel_fb(sr, n_fft, n_mel, 0.0, None, "slaney", np.float32)
    expect = np.asarray(amp_to_db(jnp.asarray(spec @ fb)))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=2e-3, rtol=1e-4)


def test_log_modes_and_top_db(rng):
    wav = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    db = np.asarray(log_mel_spectrogram(wav, 8000, n_mel=32, log="amp_db"))
    pw = np.asarray(log_mel_spectrogram(wav, 8000, n_mel=32, log="power_db"))
    np.testing.assert_allclose(pw, db, atol=2e-2)  # 10*log10(x^2)==20*log10(x)
    ln = np.asarray(log_mel_spectrogram(wav, 8000, n_mel=32, log="ln"))
    np.testing.assert_allclose(ln * (20.0 / np.log(10.0)), db, atol=5e-2)
    capped = np.asarray(
        log_mel_spectrogram(wav, 8000, n_mel=32, top_db=30.0)
    )
    assert capped.max() - capped.min() <= 30.0 + 1e-3


def test_mel_norm_modes(rng):
    wav = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    a = np.asarray(log_mel_spectrogram(wav, 8000, n_mel=32, mel_norm="slaney"))
    b = np.asarray(log_mel_spectrogram(wav, 8000, n_mel=32, mel_norm="sum"))
    assert not np.allclose(a, b)  # genuinely different normalizations


def test_pallas_engine_features_match_xla(rng):
    """The fused-kernel features route (TPU default for amp_db +
    win%hop==0) must agree with the XLA oracle path."""
    from msv_tpu.config import set_engine

    sr = 8000
    wav = (rng.standard_normal((2, sr)) * 0.4).astype(np.float32)
    kw = dict(n_mel=64, win_ms=40.0, hop_ms=10.0)  # win=320=4*hop
    ref = log_mel_spectrogram(wav, sr, **kw)
    set_engine("pallas")  # forces the fused route (interpret mode on CPU)
    try:
        got = log_mel_spectrogram(wav, sr, **kw)
    finally:
        set_engine("auto")
    assert got.shape == ref.shape
    d = np.abs(np.asarray(got, np.float64) - np.asarray(ref, np.float64))
    # fast mode runs bf16 OPERANDS through the kernel: bounded under one
    # grey step (120/255 = 0.47 dB); measured ~0.2 dB max on noise
    assert d.max() < 0.47, d.max()
    # parity precision also supported through the kernel
    set_engine("pallas")
    try:
        got_p = log_mel_spectrogram(wav, sr, precision="parity", **kw)
    finally:
        set_engine("auto")
    dp = np.abs(np.asarray(got_p, np.float64)
                - np.asarray(log_mel_spectrogram(wav, sr,
                                                 precision="parity", **kw),
                             np.float64))
    # parity keeps f32 operands: only k-tile accumulation order differs
    assert dp.max() < 0.02


def test_features_precision_arg_validated(rng):
    wav = (rng.standard_normal(4000) * 0.3).astype(np.float32)
    with pytest.raises(ValueError):
        log_mel_spectrogram(wav, 8000, precision="double")


def test_features_short_signal_contract(rng):
    """Device-resident inputs keep the host path's short-signal error
    (reference panics below win//2 + 1 samples, lib.rs:412-433)."""
    import jax.numpy as jnp

    wav = (rng.standard_normal(10) * 0.3).astype(np.float32)
    with pytest.raises(ValueError, match="too short"):
        log_mel_spectrogram(wav, 8000, win_ms=25.0)
    with pytest.raises(ValueError, match="too short"):
        log_mel_spectrogram(jnp.asarray(wav)[None], 8000, win_ms=25.0)


def test_device_resident_input_matches_host(rng):
    """A jax-array input (device pipeline form) must produce the same
    features as the same samples passed as numpy, on both engines."""
    import jax.numpy as jnp

    from msv_tpu.config import set_engine

    sr = 8000
    wav = (rng.standard_normal((2, 2 * sr)) * 0.4).astype(np.float32)
    for kw in (dict(n_mel=48), dict(n_mel=48, win_ms=40.0, hop_ms=10.0)):
        host = np.asarray(log_mel_spectrogram(wav, sr, **kw))
        dev = np.asarray(log_mel_spectrogram(jnp.asarray(wav), sr, **kw))
        np.testing.assert_array_equal(dev, host, err_msg=str(kw))
    set_engine("pallas")  # fused route with device-side layout prep
    try:
        kw = dict(n_mel=48, win_ms=40.0, hop_ms=10.0)
        host = np.asarray(log_mel_spectrogram(wav, sr, **kw))
        dev = np.asarray(log_mel_spectrogram(jnp.asarray(wav), sr, **kw))
    finally:
        set_engine("auto")
    np.testing.assert_array_equal(dev, host)


def test_features_dp_sharded_batch(rng):
    """The ML frontend scales over a data-parallel mesh with no dedicated
    API: a batch device_put with P("dp") auto-partitions through the jit
    (batch-dim vmap), and the OUTPUT stays dp-sharded — no implicit
    all-gather re-centralizes the features mid-pipeline."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sr = 8000
    wav = (rng.standard_normal((8, 2 * sr)) * 0.4).astype(np.float32)
    host = np.asarray(log_mel_spectrogram(wav, sr, n_mel=48))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("dp",))
    dev = jax.device_put(jnp.asarray(wav), NamedSharding(mesh, P("dp")))
    with mesh:
        out = log_mel_spectrogram(dev, sr, n_mel=48)
    assert isinstance(out, jax.Array)
    shard_rows = {sh.data.shape[0] for sh in out.addressable_shards}
    assert shard_rows == {1}, shard_rows  # still 1 batch row per device
    np.testing.assert_array_equal(np.asarray(out), host)


def test_features_dp_sharded_batch_pallas_route(rng):
    """With engine='pallas' AND win%hop==0 (the fused-route conditions), a
    dp-sharded batch must STILL come back dp-sharded: the per-row kernel
    launch would gather the batch, so sharded inputs route to the
    partitioned XLA path (docs/API.md sharding contract)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from msv_tpu.config import set_engine

    sr = 8000
    kw = dict(n_mel=48, win_ms=40.0, hop_ms=10.0)
    wav = (rng.standard_normal((8, 2 * sr)) * 0.4).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("dp",))
    dev = jax.device_put(jnp.asarray(wav), NamedSharding(mesh, P("dp")))
    set_engine("pallas")
    try:
        # oracle: the same kernel route, unsharded (per-row loop)
        host = np.asarray(log_mel_spectrogram(wav, sr, **kw))
        with mesh:
            out = log_mel_spectrogram(dev, sr, **kw)
    finally:
        set_engine("auto")
    shard_rows = {sh.data.shape[0] for sh in out.addressable_shards}
    assert shard_rows == {1}, shard_rows
    np.testing.assert_array_equal(np.asarray(out), host)
    # (non-divisible batches cannot be constructed: device_put itself
    # rejects a P('dp') sharding whose dim isn't divisible by the axis,
    # so the XLA fallback gate only matters for multi-dim/tuple specs)


def test_features_default_follows_explicit_global_precision(rng):
    """precision=None defaults to 'fast', but an EXPLICIT session-wide
    set_precision_mode('parity') must win (the global knob is the
    documented bit-faithfulness switch; features must not silently ignore
    it)."""
    from msv_tpu import config as _cfg
    from msv_tpu.config import set_precision_mode

    sr = 8000
    wav = (rng.standard_normal(2 * sr) * 0.4).astype(np.float32)
    parity = np.asarray(log_mel_spectrogram(wav, sr, precision="parity"))
    fast = np.asarray(log_mel_spectrogram(wav, sr, precision="fast"))

    # untouched session: default is the documented 'fast'
    assert not _cfg.precision_mode_is_explicit()
    np.testing.assert_array_equal(
        np.asarray(log_mel_spectrogram(wav, sr)), fast
    )
    # explicit global parity: default now bit-matches the parity path
    set_precision_mode("parity")
    np.testing.assert_array_equal(
        np.asarray(log_mel_spectrogram(wav, sr)), parity
    )
    # explicit global fast keeps fast
    set_precision_mode("fast")
    np.testing.assert_array_equal(
        np.asarray(log_mel_spectrogram(wav, sr)), fast
    )


def test_ragged_batch_matches_individual_calls(rng):
    """log_mel_spectrogram_ragged: per-clip results equal individual
    calls (equal-length clips batch; odd lengths fall back), and top_db
    clamps per clip, not at the group max."""
    from msv_tpu import log_mel_spectrogram_ragged

    sr = 8000
    lens = [8000, 8000, 5000, 12345, 8000]
    wavs = [(rng.standard_normal(n) * (0.1 + 0.2 * i)).astype(np.float32)
            for i, n in enumerate(lens)]
    got = log_mel_spectrogram_ragged(wavs, sr, n_mel=48)
    assert len(got) == len(wavs)
    for w, f in zip(wavs, got):
        ref = np.asarray(log_mel_spectrogram(w, sr, n_mel=48))
        np.testing.assert_array_equal(f, ref)

    # per-clip top_db: each clip clamps at ITS own max
    got_t = log_mel_spectrogram_ragged(wavs, sr, n_mel=48, top_db=30.0)
    for w, f in zip(wavs, got_t):
        ref = np.asarray(log_mel_spectrogram(w, sr, n_mel=48, top_db=30.0))
        np.testing.assert_array_equal(f, ref)


def test_ragged_rejects_non_mono(rng):
    from msv_tpu import log_mel_spectrogram_ragged

    with pytest.raises(ValueError, match="1-D mono"):
        log_mel_spectrogram_ragged(
            [rng.standard_normal((2, 4000)).astype(np.float32)], 8000
        )


# ---------------------------------------------------------------- whisper


def test_whisper_log_mel_matches_transformers(rng):
    """whisper_log_mel is a drop-in for transformers'
    WhisperFeatureExtractor: same (n_mel, 3000) layout, numerically equal
    within f32 FFT-vs-GEMM rounding (~1e-5 at feature scale) across
    pad/truncate regimes, and bit-exact on silence (the clamp floor)."""
    pytest.importorskip("transformers")
    from transformers import WhisperFeatureExtractor

    from msv_tpu import whisper_log_mel

    fe = WhisperFeatureExtractor()
    for L in (400, 16000 * 2, 16000 * 31):  # short / pad / truncate
        x = (rng.standard_normal(L) * 0.2).astype(np.float32)
        want = fe(x, sampling_rate=16000,
                  return_tensors="np").input_features[0]
        got = np.asarray(whisper_log_mel(x))
        assert got.shape == want.shape == (80, 3000)
        # typical agreement ~1e-5; fresh-seed fuzz observed 1.3e-4 once
        # (f32 log-mel vs transformers' f64-heavy numpy pipeline)
        assert np.abs(got - want).max() < 3e-4

    # whisper-large-v3 geometry (128 mel bands)
    fe128 = WhisperFeatureExtractor(feature_size=128)
    x = (rng.standard_normal(16000 * 5) * 0.1).astype(np.float32)
    want = fe128(x, sampling_rate=16000,
                 return_tensors="np").input_features[0]
    got = np.asarray(whisper_log_mel(x, n_mel=128))
    assert got.shape == (128, 3000)
    assert np.abs(got - want).max() < 3e-4

    # silence: pure clamp arithmetic, exactly equal
    z = np.zeros(16000, np.float32)
    want = fe(z, sampling_rate=16000, return_tensors="np").input_features[0]
    np.testing.assert_array_equal(np.asarray(whisper_log_mel(z)), want)


def test_whisper_log_mel_batch_and_device_input(rng):
    """Batched (B, L) matches per-clip calls (the clamp is per CLIP, not
    per batch), and a device-resident input takes the on-device pad path
    to the same values."""
    import jax.numpy as jnp

    from msv_tpu import whisper_log_mel

    xs = (rng.standard_normal((3, 16000)) * [[0.2], [0.01], [0.5]]).astype(
        np.float32)
    batch = np.asarray(whisper_log_mel(xs))
    assert batch.shape == (3, 80, 3000)
    for i in range(3):
        np.testing.assert_array_equal(
            batch[i], np.asarray(whisper_log_mel(xs[i])))
    dev = np.asarray(whisper_log_mel(jnp.asarray(xs)))
    np.testing.assert_allclose(dev, batch, atol=2e-6)


def test_whisper_log_mel_validation(rng):
    from msv_tpu import whisper_log_mel

    with pytest.raises(ValueError, match="16 kHz"):
        whisper_log_mel(np.zeros(100, np.float32), 22050)
    with pytest.raises(ValueError, match="precision"):
        whisper_log_mel(np.zeros(100, np.float32), precision="exact")
    with pytest.raises(ValueError, match=r"\(L,\) or \(B, L\)"):
        whisper_log_mel(np.zeros((1, 2, 3), np.float32))
    # fast mode stays within a small bound of parity (bf16 operands)
    x = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    a = np.asarray(whisper_log_mel(x))
    b = np.asarray(whisper_log_mel(x, precision="fast"))
    assert np.abs(a - b).max() < 0.02  # feature units (range is 2.0)


def test_whisper_log_mel_dp_sharded_batch(rng):
    """A P('dp')-sharded batch partitions through the whisper core under
    GSPMD: output keeps the batch sharding (one clip per device here)
    and is bit-equal to the host-batch result — the per-clip max-8 clamp
    is local to each row, so no cross-device reduction is needed."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from msv_tpu import whisper_log_mel

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    x = (rng.standard_normal((n_dev, 16000 * 3)) * 0.2).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp")))
    out = whisper_log_mel(xd)
    assert {s.data.shape[0] for s in out.addressable_shards} == {1}
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(whisper_log_mel(x)))


# ------------------------------------------------------------ mfcc / delta


def test_mfcc_dct_stage_matches_scipy(rng):
    """mfcc == scipy.fft.dct(type 2, ortho) of our power-mel dB features,
    truncated to n_mfcc — the DCT stage pinned against an independent
    implementation (librosa's own mfcc is exactly this composition)."""
    from scipy.fft import dct

    from msv_tpu.features import mfcc

    wav = (0.3 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)
           + 0.01 * rng.standard_normal(8000)).astype(np.float32)
    feats = np.asarray(log_mel_spectrogram(
        wav, 16000, n_mel=64, log="power_db", spec="power",
        precision="parity"))
    ours = np.asarray(mfcc(wav, 16000, n_mfcc=13, n_mel=64,
                           precision="parity"))
    ref = dct(feats.astype(np.float64), type=2, norm="ortho",
              axis=-1)[:, :13]
    assert ours.shape == (feats.shape[0], 13)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_mfcc_batched_and_lifter(rng):
    from msv_tpu.features import mfcc

    wavs = rng.standard_normal((3, 4000)).astype(np.float32) * 0.2
    m = np.asarray(mfcc(wavs, 8000, n_mfcc=20, precision="parity"))
    assert m.shape[0] == 3 and m.shape[2] == 20
    # batch row == single call
    m0 = np.asarray(mfcc(wavs[0], 8000, n_mfcc=20, precision="parity"))
    np.testing.assert_allclose(m[0], m0, atol=1e-5)
    # librosa's sinusoidal liftering: 1 + (L/2) sin(pi (1..n) / L)
    lift = np.asarray(mfcc(wavs, 8000, n_mfcc=20, lifter=22.0,
                           precision="parity"))
    li = 1.0 + 11.0 * np.sin(np.pi * np.arange(1, 21) / 22.0)
    np.testing.assert_allclose(lift, m * li.astype(np.float32)[None, None],
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="lifter"):
        mfcc(wavs, 8000, lifter=-1.0)


def test_mel_spec_power_vs_magnitude_differ(rng):
    """spec='power' (mel of |X|^2) is NOT spec='magnitude' squared —
    the GEMM and the square don't commute."""
    wav = rng.standard_normal(4000).astype(np.float32) * 0.3
    p = np.asarray(log_mel_spectrogram(wav, 8000, log="power_db",
                                       spec="power", precision="parity"))
    mq = np.asarray(log_mel_spectrogram(wav, 8000, log="power_db",
                                        spec="magnitude",
                                        precision="parity"))
    assert p.shape == mq.shape
    assert np.abs(p - mq).max() > 0.1  # genuinely different quantities


def test_delta_matches_scipy_savgol(rng):
    from scipy.signal import savgol_filter

    from msv_tpu.features import delta

    x = rng.standard_normal((2, 50, 13)).astype(np.float32)
    for width, order in [(9, 1), (7, 2), (5, 1), (3, 1)]:
        ours = np.asarray(delta(x, width=width, order=order))
        ref = savgol_filter(x, width, order, deriv=order, axis=-2,
                            mode="nearest")
        np.testing.assert_allclose(ours, ref, atol=1e-5)
    # delta-of-delta == direct order-2 IS NOT generally true; but shapes
    # and the frame axis must hold for chained calls
    dd = np.asarray(delta(delta(x), axis=-2))
    assert dd.shape == x.shape
    # 2-D (n_frames, n_feat) input works too (axis=-2 default)
    one = np.asarray(delta(x[0]))
    np.testing.assert_allclose(one, np.asarray(delta(x))[0], atol=1e-6)


def test_delta_validation(rng):
    from msv_tpu.features import delta

    x = rng.standard_normal((10, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="odd"):
        delta(x, width=8)
    with pytest.raises(ValueError, match="order"):
        delta(x, width=5, order=0)
    with pytest.raises(ValueError, match="order"):
        delta(x, width=5, order=5)


def test_mfcc_linear_tone_energy_concentrates(rng):
    """Sanity on content: a pure tone's MFCC energy beyond c0 is small
    relative to broadband noise's spread (smoke check that the cepstral
    transform does what cepstra do)."""
    from msv_tpu.features import mfcc

    t = np.arange(16000) / 16000
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    m = np.asarray(mfcc(tone, 16000, n_mfcc=13, precision="parity"))
    assert np.isfinite(m).all()
    assert np.abs(m[:, 0]).mean() > np.abs(m[:, 7:]).mean()


def test_spectral_features_against_numpy_oracle(rng):
    """Every descriptor column pinned against a from-scratch numpy
    oracle over the same centered frames (librosa is not in this image)."""
    from msv_tpu.features import SPECTRAL_FEATURE_NAMES, spectral_features
    from msv_tpu.ops.framing import reflect_pad_center
    from msv_tpu.ops.windows import hann

    sr = 16000
    t = np.arange(sr // 2) / sr
    wav = (0.4 * np.sin(2 * np.pi * 1000 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    win = int(round(25.0 * sr / 1000.0))
    hop = int(round(10.0 * sr / 1000.0))
    n_fft = 512
    ours = np.asarray(spectral_features(wav, sr, precision="parity"))
    assert ours.shape[1] == len(SPECTRAL_FEATURE_NAMES) == 6

    padded = reflect_pad_center(wav, win)
    n_frames = ours.shape[0]
    w = np.asarray(hann(win, False), np.float64)
    freqs = np.arange(n_fft // 2 + 1) * sr / n_fft
    for i in range(0, n_frames, 7):  # sample frames
        fr = padded[i * hop: i * hop + win].astype(np.float64)
        spec = np.fft.rfft(fr * w, n_fft)
        p = np.abs(spec) ** 2
        tot = p.sum()
        centroid = (p * freqs).sum() / tot
        bandwidth = np.sqrt((p * (freqs - centroid) ** 2).sum() / tot)
        rolloff = freqs[np.searchsorted(np.cumsum(p), 0.85 * tot)]
        pc = np.maximum(p, 1e-10)
        flatness = np.exp(np.mean(np.log(pc))) / np.mean(pc)
        rms = np.sqrt(np.mean(fr * fr))
        sgn = np.where(fr >= 0, 1.0, -1.0)
        zcr = np.sum(np.abs(np.diff(sgn)) * 0.5) * sr / win
        got = ours[i]
        np.testing.assert_allclose(got[0], centroid, rtol=1e-4)
        np.testing.assert_allclose(got[1], bandwidth, rtol=1e-3)
        np.testing.assert_allclose(got[2], rolloff, rtol=1e-6)
        np.testing.assert_allclose(got[3], flatness, rtol=1e-3, atol=1e-7)
        np.testing.assert_allclose(got[4], rms, rtol=1e-4)
        np.testing.assert_allclose(got[5], zcr, rtol=1e-6)


def test_spectral_features_content_sanity(rng):
    """A 1 kHz tone centers near 1 kHz with low flatness; white noise is
    much flatter with a centroid far above."""
    from msv_tpu.features import spectral_features

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    noise = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    ft = np.asarray(spectral_features(tone, sr, precision="parity"))
    fn = np.asarray(spectral_features(noise, sr, precision="parity"))
    mid = slice(5, -5)  # skip edge frames (reflect padding artifacts)
    assert abs(ft[mid, 0].mean() - 1000.0) < 50.0   # centroid ~1 kHz
    assert fn[mid, 0].mean() > 2500.0               # noise centroid high
    assert ft[mid, 3].mean() < 0.01                 # tone: peaky
    assert fn[mid, 3].mean() > 0.1                  # noise: flat
    # tone zcr = 2 crossings per period = 2*f0
    assert abs(ft[mid, 5].mean() - 2000.0) < 60.0


def test_spectral_features_batch_and_validation(rng):
    from msv_tpu.features import spectral_features

    wavs = rng.standard_normal((2, 4000)).astype(np.float32) * 0.2
    out = np.asarray(spectral_features(wavs, 8000, precision="parity"))
    assert out.shape[0] == 2 and out.shape[2] == 6
    one = np.asarray(spectral_features(wavs[1], 8000, precision="parity"))
    np.testing.assert_allclose(out[1], one, atol=1e-5)
    with pytest.raises(ValueError, match="rolloff_pct"):
        spectral_features(wavs, 8000, rolloff_pct=0.0)
    with pytest.raises(ValueError, match="precision"):
        spectral_features(wavs, 8000, precision="half")


def test_chroma_pure_tones_land_in_their_pitch_class(rng):
    """C5/A4/E4 tones put the frame max in classes 0/9/4 (base C)."""
    from msv_tpu.features import chroma_stft

    sr = 22050
    t = np.arange(sr) / sr
    for hz, cls in [(523.25, 0), (440.0, 9), (329.63, 4)]:
        wav = (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)
        ch = np.asarray(chroma_stft(wav, sr))
        assert ch.shape[1] == 12
        mid = ch[10:-10]  # skip edge frames
        assert (mid.argmax(axis=1) == cls).mean() > 0.95
        # inf norm: every frame max is exactly 1
        np.testing.assert_allclose(ch.max(axis=1), 1.0, rtol=1e-6)
    # octave invariance: A3 maps to the same class as A4
    wav = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    ch = np.asarray(chroma_stft(wav, sr))
    assert (ch[10:-10].argmax(axis=1) == 9).mean() > 0.95


def test_chroma_matches_numpy_oracle(rng):
    """Full pipeline vs numpy rfft power @ filterbank on the same
    centered frames (parity precision)."""
    from msv_tpu.features import chroma_filterbank, chroma_stft
    from msv_tpu.ops.framing import reflect_pad_center
    from msv_tpu.ops.windows import hann

    sr = 16000
    t = np.arange(sr // 2) / sr
    wav = (0.4 * np.sin(2 * np.pi * 523.25 * t)
           + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
    win = int(round(25.0 * sr / 1000.0))
    hop = int(round(10.0 * sr / 1000.0))
    n_fft = 512
    ours = np.asarray(chroma_stft(wav, sr, precision="parity",
                                  norm="none"))
    fb = chroma_filterbank(sr, n_fft).astype(np.float64)
    padded = reflect_pad_center(wav, win)
    w = np.asarray(hann(win, False), np.float64)
    for i in range(0, ours.shape[0], 5):
        fr = padded[i * hop: i * hop + win].astype(np.float64)
        p = np.abs(np.fft.rfft(fr * w, n_fft)) ** 2
        np.testing.assert_allclose(ours[i], p @ fb, rtol=1e-4, atol=1e-6)


def test_chroma_norms_batch_and_validation(rng):
    from msv_tpu.features import chroma_stft

    wav = rng.standard_normal((2, 8000)).astype(np.float32)
    l2 = np.asarray(chroma_stft(wav, 16000, norm="l2"))
    assert l2.shape[0] == 2 and l2.shape[2] == 12
    np.testing.assert_allclose(
        np.sqrt((l2 * l2).sum(axis=2)), 1.0, rtol=1e-5)
    raw = np.asarray(chroma_stft(wav, 16000, norm="none"))
    assert (raw >= 0).all() and raw.max() != pytest.approx(1.0)
    with pytest.raises(ValueError, match="norm"):
        chroma_stft(wav, 16000, norm="max")
    with pytest.raises(ValueError, match="n_chroma"):
        from msv_tpu.features import chroma_filterbank

        chroma_filterbank(16000, 512, n_chroma=1)


def test_onset_detection_click_train(rng):
    """Clicks at known times are each found within one hop; a steady
    tone yields none (reflect padding makes a full-clip tone onset-free
    by construction, and the absolute 3 dB delta rejects its ~1 dB
    leakage wobble); the mixture finds exactly the clicks."""
    from msv_tpu.features import onset_detect, onset_strength

    sr = 16000
    n = 2 * sr
    truth = [0.25, 0.7, 1.1, 1.62]
    x = np.zeros(n, np.float32)
    for tt in truth:
        c = int(tt * sr)
        x[c:c + 40] = 0.8 * np.sin(
            2 * np.pi * 2000 * np.arange(40) / sr).astype(np.float32)
    got = onset_detect(x, sr)
    assert len(got) == len(truth)
    assert np.abs(np.asarray(got) - truth).max() <= 0.011  # one hop
    tone = (0.4 * np.sin(2 * np.pi * 440 * np.arange(n) / sr)
            ).astype(np.float32)
    assert len(onset_detect(tone, sr)) == 0
    mix = (0.5 * tone + x).astype(np.float32)
    assert len(onset_detect(mix, sr)) == len(truth)
    # frames units and envelope invariants
    fr = onset_detect(x, sr, units="frames")
    assert fr.dtype == np.int64 and (np.diff(fr) > 3).all()
    env = np.asarray(onset_strength(x, sr))
    assert (env >= 0).all() and env[0] == 0.0
    # the end-of-signal reflection corner is masked, not reported
    assert env[-1] == 0.0


def test_onset_validation(rng):
    from msv_tpu.features import onset_detect, onset_strength

    with pytest.raises(ValueError, match="lag"):
        onset_strength(np.zeros(4000, np.float32), 16000, lag=0)
    with pytest.raises(ValueError, match="units"):
        onset_detect(np.zeros(8000, np.float32), 16000, units="ms")
    with pytest.raises(ValueError, match="single"):
        onset_detect(np.zeros((2, 8000), np.float32), 16000)


def test_top_db_clamps_per_clip(rng):
    """A quiet clip's floor must come from its OWN max, not a loud
    batchmate's (regression: batch-global clamp coupled onset envelopes
    to batch composition)."""
    from msv_tpu.features import log_mel_spectrogram

    quiet = (0.01 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000.0)
             ).astype(np.float32)
    loud = (0.9 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000.0)
            ).astype(np.float32)
    alone = np.asarray(log_mel_spectrogram(quiet, 8000, n_mel=32,
                                           top_db=30.0,
                                           precision="parity"))
    batched = np.asarray(log_mel_spectrogram(
        np.stack([loud, quiet]), 8000, n_mel=32, top_db=30.0,
        precision="parity"))
    np.testing.assert_array_equal(batched[1], alone)
    for row in batched:
        assert row.max() - row.min() <= 30.0 + 1e-3


# -------------------------------------------------------------------- pcen
# librosa is not in this image: the oracle is a from-scratch f64 loop over
# pcen's documented spec (Wang et al. 2017 AGC + root compression with the
# equivalent-delay b mapping and M[0] = E[0] init), fed the SAME mel power
# plane the op consumes.

def _pcen_oracle_np(E, b, gain, bias, power, eps):
    E = np.asarray(E, np.float64)
    M = np.empty_like(E)
    M[0] = E[0]
    for t in range(1, len(E)):
        M[t] = (1.0 - b) * M[t - 1] + b * E[t]
    return (E / (eps + M) ** gain + bias) ** power - bias ** power


def test_pcen_matches_from_scratch_oracle(rng):
    import math

    from msv_tpu.features import pcen

    sr = 8000
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr)
         + 0.05 * rng.standard_normal(2 * sr)).astype(np.float32)
    got = np.asarray(pcen(x, sr, n_mel=40, precision="parity"))
    E = np.asarray(log_mel_spectrogram(
        x, sr, n_mel=40, spec="power", log="linear", precision="parity"))
    t = 0.4 * sr / 80  # time_constant * sr / hop(10 ms at 8 kHz)
    b = (math.sqrt(1.0 + 4.0 * t * t) - 1.0) / (2.0 * t * t)
    want = _pcen_oracle_np(E, b, 0.98, 2.0, 0.5, 1e-6)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pcen_loudness_invariant(rng):
    """gain=1: scaling the waveform by 10x cancels in E / M^gain — the
    property PCEN exists for.  Holds where M >> eps (the window is
    pre-scaled by 1/n_fft, so near-floor mel bands sit close to the 1e-6
    default eps — a small eps isolates the structural property).
    log-mel, by contrast, shifts by the full 20 dB."""
    from msv_tpu.features import pcen

    sr = 8000
    x = (0.3 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)
         + 0.05 * rng.standard_normal(sr)).astype(np.float32)
    a = np.asarray(pcen(x, sr, n_mel=32, gain=1.0, eps=1e-12,
                        precision="parity"))
    bq = np.asarray(pcen(10.0 * x, sr, n_mel=32, gain=1.0, eps=1e-12,
                         precision="parity"))
    np.testing.assert_allclose(a, bq, atol=2e-3)
    lm = np.asarray(log_mel_spectrogram(x, sr, n_mel=32,
                                        precision="parity"))
    lm10 = np.asarray(log_mel_spectrogram(10.0 * x, sr, n_mel=32,
                                          precision="parity"))
    assert np.median(lm10 - lm) == pytest.approx(20.0, abs=0.1)


def test_pcen_emphasizes_onsets(rng):
    """A tone switching on mid-clip: the onset frame's PCEN response in
    the tone's band exceeds the steady-state frames that follow (the
    smoother catches up and the AGC compresses)."""
    from msv_tpu.features import pcen

    sr = 8000
    x = np.zeros(2 * sr, np.float32)
    x[sr:] = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    out = np.asarray(pcen(x, sr, n_mel=40))
    band = out[:, np.argmax(out.max(axis=0))]
    onset_frame = np.argmax(band)
    assert abs(onset_frame - 100) <= 3          # tone starts at frame 100
    assert band[onset_frame] > 2.0 * band[150]  # steady state compressed


def test_pcen_batch_matches_solo_and_device_input(rng):
    import jax.numpy as jnp

    from msv_tpu.features import pcen

    sr = 8000
    wavs = (0.2 * rng.standard_normal((3, sr))).astype(np.float32)
    batched = np.asarray(pcen(wavs, sr, n_mel=32, precision="parity"))
    for i in range(3):
        solo = np.asarray(pcen(wavs[i], sr, n_mel=32, precision="parity"))
        np.testing.assert_array_equal(batched[i], solo)
    dev = np.asarray(pcen(jnp.asarray(wavs), sr, n_mel=32,
                          precision="parity"))
    np.testing.assert_array_equal(dev, batched)


def test_pcen_validation():
    from msv_tpu.features import pcen

    x = np.zeros(8000, np.float32)
    with pytest.raises(ValueError, match="gain"):
        pcen(x, 8000, gain=1.5)
    with pytest.raises(ValueError):
        pcen(x, 8000, power=0.0)
    with pytest.raises(ValueError):
        pcen(x, 8000, time_constant=-1.0)
    with pytest.raises(ValueError):
        pcen(x, 8000, eps=0.0)


def test_log_linear_option_consistent(rng):
    """log='linear' returns the raw mel spectrum: power_to_db of it
    equals the power_db path exactly."""
    from msv_tpu.ops.decibel import power_to_db

    x = (0.3 * rng.standard_normal(8000)).astype(np.float32)
    lin = log_mel_spectrogram(x, 8000, n_mel=32, spec="power",
                              log="linear", precision="parity")
    db = np.asarray(log_mel_spectrogram(x, 8000, n_mel=32, spec="power",
                                        log="power_db",
                                        precision="parity"))
    np.testing.assert_array_equal(np.asarray(power_to_db(lin)), db)


# ------------------------------------------------------------------ contrast

def test_spectral_contrast_against_numpy_oracle(rng):
    """Every band pinned against a from-scratch numpy oracle of the
    Jiang 2002 spec over the same centered frames (librosa is not in
    this image)."""
    from msv_tpu.features import spectral_contrast
    from msv_tpu.ops.framing import reflect_pad_center
    from msv_tpu.ops.windows import hann

    sr = 16000
    t = np.arange(sr // 2) / sr
    wav = (0.4 * np.sin(2 * np.pi * 1000 * t)
           + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
    win, hop, n_fft = 400, 160, 512
    quantile, n_bands, fmin = 0.02, 6, 200.0
    ours = np.asarray(spectral_contrast(wav, sr, precision="parity"))
    assert ours.shape[1] == n_bands + 1

    padded = reflect_pad_center(wav, win)
    w = np.asarray(hann(win, False), np.float64)
    n_freq = n_fft // 2 + 1
    freq = np.arange(n_freq) * sr / n_fft
    octa = np.concatenate([[0.0], fmin * 2.0 ** np.arange(n_bands + 1)])
    for i in range(0, ours.shape[0], 5):  # sample frames
        fr = padded[i * hop: i * hop + win].astype(np.float64)
        mag = np.abs(np.fft.rfft(fr * w, n_fft))
        for k in range(n_bands + 1):
            idx = np.flatnonzero((freq >= octa[k]) & (freq <= octa[k + 1]))
            lo = idx[0] - 1 if k > 0 else idx[0]
            hi = n_freq - 1 if k == n_bands else idx[-1]
            q = max(1, int(np.rint(quantile * (hi - lo + 1))))
            sub = mag[lo: hi + 1]
            if k < n_bands:
                sub = sub[:-1]
            srt = np.sort(sub)
            valley = max(srt[:q].mean(), 1e-10)
            peak = max(srt[-q:].mean(), 1e-10)
            want = 10.0 * np.log10(peak / valley)
            np.testing.assert_allclose(ours[i, k], want, rtol=1e-3,
                                       atol=2e-3)


def test_spectral_contrast_semantics(rng):
    """A tone has far higher contrast in its own octave band than white
    noise does; linear=True returns the raw ratio."""
    from msv_tpu.features import spectral_contrast

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    noise = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    ct = np.asarray(spectral_contrast(tone, sr, precision="parity"))
    cn = np.asarray(spectral_contrast(noise, sr, precision="parity"))
    mid = slice(5, -5)
    # 1 kHz sits in band 3 (800-1600 Hz)
    assert ct[mid, 3].mean() > cn[mid, 3].mean() + 15.0
    assert cn[mid, 1:].mean() < 25.0  # noise: low contrast everywhere
    lin = np.asarray(spectral_contrast(tone, sr, linear=True,
                                       precision="parity"))
    np.testing.assert_allclose(10.0 * np.log10(lin[mid]), ct[mid],
                               rtol=1e-4, atol=1e-4)


def test_spectral_contrast_batch_and_validation(rng):
    from msv_tpu.features import spectral_contrast

    wavs = rng.standard_normal((2, 8000)).astype(np.float32) * 0.2
    out = np.asarray(spectral_contrast(wavs, 16000, precision="parity"))
    assert out.shape[0] == 2 and out.shape[2] == 7
    one = np.asarray(spectral_contrast(wavs[1], 16000, precision="parity"))
    np.testing.assert_allclose(out[1], one, atol=1e-5)
    with pytest.raises(ValueError, match="quantile"):
        spectral_contrast(wavs, 16000, quantile=0.0)
    with pytest.raises(ValueError, match="Nyquist"):
        spectral_contrast(wavs, 8000)  # 200*2^6 = 12.8 kHz > 4 kHz
    with pytest.raises(ValueError, match="fmin"):
        spectral_contrast(wavs, 16000, fmin=-1.0)
    with pytest.raises(ValueError, match="n_bands"):
        spectral_contrast(wavs, 16000, n_bands=0)
