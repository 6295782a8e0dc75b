"""Metric contracts: PSNR/SSIM/MSE per the reference's formulas
(GAN_functions.py:724-759, test_autoencoder.py:49-66). SSIM is validated against an
independent numpy transcription of skimage.structural_similarity's default float
path (7x7 uniform window, sample covariance)."""

import jax.numpy as jnp
import numpy as np

from contextual_image_compression_tpu.ops import metrics as M


def _ssim_numpy(a, b, data_range=1.0, win=7):
    """Independent reference implementation (skimage defaults, float input)."""
    from numpy.lib.stride_tricks import sliding_window_view

    def filt(x):
        return sliding_window_view(x, (win, win)).mean(axis=(-2, -1))

    n = win * win
    cov_norm = n / (n - 1)
    ux, uy = filt(a), filt(b)
    uxx, uyy, uxy = filt(a * a), filt(b * b), filt(a * b)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s.mean()


def test_psnr_formula(rng):
    a = rng.rand(32, 32).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(32, 32).astype(np.float32), 0, 1)
    expected = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    got = float(M.psnr(jnp.asarray(a), jnp.asarray(b), 1.0))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_psnr_identical_is_large(rng):
    a = rng.rand(16, 16).astype(np.float32)
    assert float(M.psnr(jnp.asarray(a), jnp.asarray(a), 1.0)) > 100


def test_ssim_matches_reference_impl():
    rng = np.random.RandomState(1234)  # decoupled from the shared session rng
    a = rng.rand(48, 48).astype(np.float32)
    b = np.clip(a + 0.05 * rng.randn(48, 48).astype(np.float32), 0, 1)
    got = float(M.ssim(jnp.asarray(a), jnp.asarray(b), 1.0))
    # our filter is exact in fp32; the residual is fp32-vs-fp64 input rounding
    expected = _ssim_numpy(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_ssim_identity(rng):
    a = rng.rand(32, 32).astype(np.float32)
    np.testing.assert_allclose(float(M.ssim(jnp.asarray(a), jnp.asarray(a), 1.0)), 1.0, atol=1e-5)


def test_gan_metrics_batched(rng):
    a = (rng.rand(3, 32, 32, 3) * 2 - 1).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(3, 32, 32, 3).astype(np.float32), -1, 1)
    out = M.gan_metrics(jnp.asarray(a), jnp.asarray(b))
    assert out["psnr"].shape == (3,)
    assert out["ssim"].shape == (3,)
    assert out["mse"].shape == (3,)
    # mse on [0,1]-converted images
    expected_mse = np.mean((((a + 1) / 2) - ((b + 1) / 2)) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(out["mse"]), expected_mse, rtol=1e-5)


def test_ae_metrics_uint8(rng):
    a = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    b = np.clip(a.astype(int) + rng.randint(-20, 20, a.shape), 0, 255).astype(np.uint8)
    out = M.ae_metrics(jnp.asarray(a), jnp.asarray(b))
    expected_mse = np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(out["mse"]), expected_mse, rtol=1e-4)
    assert np.all(np.asarray(out["ssim"]) <= 1.0)
