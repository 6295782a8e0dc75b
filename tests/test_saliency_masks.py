"""Saliency engine and mask-creation behavior (reference: GAN_functions.py:52-208)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.config import SaliencyConfig
from contextual_image_compression_tpu.ops import masks, saliency


def _blob_image(h=128, w=128, cy=40, cx=80, r=15):
    """[-1,1] image: dark background, bright blob."""
    img = np.full((h, w, 3), -0.6, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    m = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
    img[m] = 0.9
    return img


@pytest.mark.parametrize("method", ["spectral_residual", "fine_grained", "combined"])
def test_saliency_localizes_blob(method):
    img = jnp.asarray(_blob_image())
    sal = np.asarray(saliency.compute_saliency_map(img, method))
    assert sal.shape == (128, 128)
    assert 0.0 <= sal.min() and sal.max() <= 1.0 + 1e-6
    blob_mean = sal[30:50, 70:90].mean()
    bg_mean = sal[90:120, 5:35].mean()
    assert blob_mean > bg_mean * 2, f"{method}: {blob_mean} vs {bg_mean}"


def test_saliency_batched_consistency():
    imgs = np.stack([_blob_image(cx=40), _blob_image(cx=90)])
    batched = np.asarray(saliency.compute_saliency_map(jnp.asarray(imgs), "combined"))
    single0 = np.asarray(saliency.compute_saliency_map(jnp.asarray(imgs[0]), "combined"))
    np.testing.assert_allclose(batched[0], single0, atol=1e-5)


def test_spectral_dft_matmul_matches_fft(rng):
    """The DFT-by-matmul spectral core (config.spectral_dft_matmul) is the
    same linear algebra as jnp.fft evaluated on the MXU; parity to f32
    rounding on natural-ish and structured inputs."""
    imgs = np.stack(
        [_blob_image(cx=40), _blob_image(cy=90, cx=30, r=25)]
    ) + rng.randn(2, 128, 128, 3).astype(np.float32) * 0.05
    x = jnp.asarray(imgs)
    a = np.asarray(saliency.spectral_residual_saliency(x, dft_matmul=True))
    b = np.asarray(saliency.spectral_residual_saliency(x, dft_matmul=False))
    np.testing.assert_allclose(a, b, atol=2e-4)

    cfg = SaliencyConfig(spectral_dft_matmul=True, mask_use_pallas=False)
    m_dft = np.asarray(masks.compute_contextual_mask(x, cfg))
    cfg_fft = SaliencyConfig(spectral_dft_matmul=False, mask_use_pallas=False)
    m_fft = np.asarray(masks.compute_contextual_mask(x, cfg_fft))
    np.testing.assert_allclose(m_dft, m_fft, atol=1e-4)


def test_resize_op_matrix_rows_sum_to_one():
    """normalize-at-64^2-then-upsample == the reference's order ONLY because
    the linear resize is affine-preserving (each output is a convex
    combination of inputs). Guard that precondition for the shapes the
    pipeline uses, both directions."""
    for src, dst in [(256, 64), (64, 256), (128, 64), (64, 128), (512, 64)]:
        m = np.asarray(saliency._resize_op_matrix(src, dst))
        assert m.shape == (dst, src)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
        assert m.min() >= -1e-6  # convex weights: no overshoot off the data


def test_saliency_invalid_method_raises():
    with pytest.raises(ValueError):
        saliency.compute_saliency_map(jnp.zeros((8, 8, 3)), "nope")


def test_otsu_matches_cv2(rng):
    for _ in range(5):
        sal = np.clip(
            rng.rand(64, 64) * 0.6 + 0.4 * (rng.rand(64, 64) > 0.6), 0, 1
        ).astype(np.float32)
        u8 = (sal * 255).astype(np.uint8)
        t_cv, _ = cv2.threshold(u8, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        t_ours = float(masks.otsu_threshold(jnp.asarray(sal))) * 255
        assert abs(t_cv - t_ours) <= 1.0, (t_cv, t_ours)


def test_percentile_threshold_matches_numpy(rng):
    sal = rng.rand(64, 64).astype(np.float32)
    hist, bins = np.histogram(sal.flatten(), 50, range=(0, 1))
    cumsum = np.cumsum(hist) / np.cumsum(hist)[-1]
    expected = bins[np.argmax(cumsum > 0.7)]
    got = float(masks.percentile_threshold(jnp.asarray(sal), 0.7))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_adaptive_threshold_clamped(rng):
    sal = rng.rand(32, 32).astype(np.float32)
    t = float(masks.adaptive_threshold(jnp.asarray(sal)))
    assert 0.05 <= t <= 0.5


def test_smooth_mask_matches_cv2_pipeline(rng):
    """The smooth path is bilateral(9,75,75) -> Gaussian 31x31 -> /max
    (reference: GAN_functions.py:198-203)."""
    sal = rng.rand(64, 64).astype(np.float32)
    ours = np.asarray(masks.create_saliency_mask(jnp.asarray(sal), smooth=True))
    ref = cv2.bilateralFilter(sal, 9, 75, 75)
    ref = cv2.GaussianBlur(ref, (31, 31), 0)
    if ref.max() > 0:
        ref = ref / ref.max()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_binary_mask(rng):
    sal = rng.rand(64, 64).astype(np.float32)
    m = np.asarray(masks.create_saliency_mask(jnp.asarray(sal), threshold=0.5, smooth=False))
    np.testing.assert_array_equal(m, (sal > 0.5).astype(np.float32))


def test_enhance_saliency_map_range(rng):
    sal = rng.rand(64, 64).astype(np.float32)
    e = np.asarray(masks.enhance_saliency_map(jnp.asarray(sal)))
    assert e.min() >= 0.0 and e.max() <= 1.0
