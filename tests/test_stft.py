"""STFT tests (reference: lib.rs:482-514 stft_works; realfft.rs tests)."""

import numpy as np
import pytest

from msv_tpu.ops.dft import rdft_reference_np, windowed_dft_matrices
from msv_tpu.ops.framing import reference_framing_oracle
from msv_tpu.ops.stft import perform_stft, stft_magnitude
from msv_tpu.ops.windows import default_stft_window


def impulse(size, location, dtype=np.float32):
    # utils.rs:21-34 test fixture
    x = np.zeros(size, dtype)
    x[location] = 1
    return x


def test_stft_impulse_golden():
    # lib.rs:491-514: perform_stft(impulse(4, 2), 4, 2, 4) exact values,
    # incl. the 1/n_fft scaling baked into the default window.
    out = np.asarray(perform_stft(impulse(4, 2), 4, 2, 4))
    expect = np.array(
        [
            [0.0, 0.0, 0.0],
            [0.25, -0.25, 0.25],
            [0.25, -0.25, 0.25],
        ],
        dtype=np.complex64,
    )
    assert out.shape == (3, 3)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_dft_matrices_match_numpy_rfft(rng):
    # Pattern from realfft.rs:253-272: verify the optimized path against a
    # trusted general implementation.
    for win, n_fft in [(16, 16), (12, 16), (320, 512), (884, 1024)]:
        window = default_stft_window(win, n_fft)
        frames = rng.standard_normal((7, win)).astype(np.float32)
        c, s = windowed_dft_matrices(window, n_fft)
        got = frames @ c + 1j * (frames @ s)

        from msv_tpu.ops.dft import n_pad_split

        pl, pr = n_pad_split(n_fft, win)
        padded = np.pad(frames * window, ((0, 0), (pl, pr)))
        expect = rdft_reference_np(padded)
        np.testing.assert_allclose(got, expect, atol=2e-5)


def test_perform_stft_vs_full_oracle(rng):
    # End-to-end: framing oracle + numpy rfft vs device pipeline.
    for L, win, hop, n_fft in [(1000, 320, 80, 512), (777, 100, 25, 128)]:
        wav = rng.standard_normal(L).astype(np.float32)
        window = default_stft_window(win, n_fft)
        got = np.asarray(perform_stft(wav, win, hop, n_fft))
        frames = reference_framing_oracle(wav, win, hop, n_fft, window)
        expect = rdft_reference_np(frames)
        assert got.shape == expect.shape
        np.testing.assert_allclose(got, expect, atol=2e-5)


def test_stft_magnitude_bucketing(rng):
    wav = rng.standard_normal(1000).astype(np.float32)
    mag, n_frames = stft_magnitude(wav, 320, 80, 512)
    assert mag.shape[0] % 256 == 0 and mag.shape[0] >= n_frames
    full = np.abs(np.asarray(perform_stft(wav, 320, 80, 512)))
    np.testing.assert_allclose(np.asarray(mag)[:n_frames], full, atol=2e-5)


def test_custom_window_and_validation(rng):
    wav = rng.standard_normal(256).astype(np.float32)
    w = np.hamming(64).astype(np.float32)
    out = np.asarray(perform_stft(wav, 64, 16, 64, window=w))
    frames = reference_framing_oracle(wav, 64, 16, 64, w)
    np.testing.assert_allclose(out, rdft_reference_np(frames), atol=2e-5)
    with pytest.raises(ValueError):
        perform_stft(wav, 64, 16, 64, window=np.ones(32, np.float32))


def test_inverse_rdft_roundtrip(rng):
    # realfft.rs:275-296 pattern: inverse of forward == identity (1/n scale)
    import jax.numpy as jnp

    from msv_tpu.ops.dft import inverse_rdft

    for n in [16, 256, 512]:
        x = rng.standard_normal((5, n)).astype(np.float32)
        spec = np.fft.rfft(x, axis=-1)
        got = np.asarray(inverse_rdft(jnp.asarray(spec.astype(np.complex64)), n))
        np.testing.assert_allclose(got, x, atol=2e-5)


def test_inverse_rdft_of_impulse_spectrum():
    import jax.numpy as jnp

    from msv_tpu.ops.dft import inverse_rdft

    # flat spectrum of ones -> impulse at 0 (realfft.rs test style)
    n = 8
    spec = jnp.ones(n // 2 + 1, dtype=jnp.complex64)
    got = np.asarray(inverse_rdft(spec, n))
    expect = np.zeros(n, np.float32)
    expect[0] = 1.0
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_inverse_stft_roundtrip(rng):
    """perform_stft -> inverse_stft reconstructs the signal (matched-window
    overlap-add; exact where the OLA denominator is well-conditioned)."""
    from msv_tpu.ops.stft import inverse_stft

    for L, win, hop, n_fft in [(1000, 320, 80, 512), (777, 100, 25, 128)]:
        wav = (rng.standard_normal(L) * 0.5).astype(np.float32)
        spec = perform_stft(wav, win, hop, n_fft)
        out = np.asarray(
            inverse_stft(spec, win, hop, n_fft, length=L)
        )
        assert out.shape == (L,)
        # hann OLA edges are attenuated over the first/last half window
        inner = slice(win, L - win)
        np.testing.assert_allclose(out[inner], wav[inner], atol=1e-4)


def test_inverse_stft_custom_window(rng):
    from msv_tpu.ops.stft import inverse_stft

    L, win, hop, n_fft = 640, 128, 32, 128
    w = np.hanning(win).astype(np.float32) + 0.01  # strictly positive-ish
    wav = (rng.standard_normal(L) * 0.5).astype(np.float32)
    spec = perform_stft(wav, win, hop, n_fft, window=w)
    out = np.asarray(inverse_stft(spec, win, hop, n_fft, window=w, length=L))
    inner = slice(win, L - win)
    np.testing.assert_allclose(out[inner], wav[inner], atol=1e-4)


def test_fft_module_injection(rng):
    """perform_stft's fft_module slot (lib.rs:394's Option<RealFFT>
    equivalent): an injected transform receives the reference-exact
    windowed frames and its output IS the result — agreeing with the
    default DFT-GEMM path when the module is a true rfft, and passing
    through verbatim otherwise.  Objects with .process (RealFFT's shape)
    work too; bad callables and wrong shapes are rejected."""
    import jax.numpy as jnp

    from msv_tpu.ops.stft import perform_stft

    wav = (rng.standard_normal(1000) * 0.5).astype(np.float32)
    win, hop, n_fft = 320, 80, 512
    base = np.asarray(perform_stft(wav, win, hop, n_fft))

    calls = {"n": 0}

    def rfft_module(frames):
        calls["n"] += 1
        assert frames.shape[1] == n_fft
        return np.fft.rfft(frames, axis=1)

    via_mod = np.asarray(perform_stft(wav, win, hop, n_fft,
                                      fft_module=rfft_module))
    assert calls["n"] == 1
    assert via_mod.shape == base.shape
    np.testing.assert_allclose(via_mod, base, atol=2e-6)

    class Module:  # RealFFT-shaped object
        def process(self, frames):
            return jnp.fft.rfft(jnp.asarray(frames), axis=1)

    via_obj = np.asarray(perform_stft(wav, win, hop, n_fft,
                                      fft_module=Module()))
    np.testing.assert_allclose(via_obj, base, atol=2e-6)

    with pytest.raises(TypeError):
        perform_stft(wav, win, hop, n_fft, fft_module=object())
    with pytest.raises(ValueError, match="shape"):
        perform_stft(wav, win, hop, n_fft,
                     fft_module=lambda f: f[:, : n_fft // 2])


def test_frame_device_gcd_decomposition_matches_gather(rng):
    """frame_device's zero-gather gcd slice form is element-equal to the
    direct gather indexing for win % hop != 0 geometries (whisper's
    400/160 among them), and still exact when win % hop == 0."""
    import jax.numpy as jnp

    from msv_tpu.ops.stft import frame_device

    for win, hop, n_frames in [(400, 160, 13), (300, 140, 7),
                               (320, 160, 9), (251, 100, 5)]:
        need = (n_frames - 1) * hop + win
        x = rng.standard_normal(need + 3).astype(np.float32)
        got = np.asarray(frame_device(jnp.asarray(x), win, hop, n_frames))
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(win)[None, :])
        np.testing.assert_array_equal(got, x[idx])
