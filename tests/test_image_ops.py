"""Filter parity against OpenCV (the reference's actual implementation substrate)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.ops import image_ops as iops


@pytest.fixture
def smap(rng):
    return rng.rand(64, 64).astype(np.float32)


def test_gaussian_blur_matches_cv2_31(smap):
    ours = np.asarray(iops.gaussian_blur(jnp.asarray(smap), 31, 0.0))
    ref = cv2.GaussianBlur(smap, (31, 31), 0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("k", [3, 9, 15])
def test_gaussian_blur_matches_cv2_multi(smap, k):
    ours = np.asarray(iops.gaussian_blur(jnp.asarray(smap), k, 0.0))
    ref = cv2.GaussianBlur(smap, (k, k), 0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilateral_matches_cv2(smap):
    ours = np.asarray(iops.bilateral_filter(jnp.asarray(smap), 9, 75.0, 75.0))
    ref = cv2.bilateralFilter(smap, 9, 75, 75)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilateral_matches_cv2_real_color_sigma(smap):
    # A small sigma_color actually engages the range kernel.
    ours = np.asarray(iops.bilateral_filter(jnp.asarray(smap), 9, 0.1, 3.0))
    ref = cv2.bilateralFilter(smap, 9, 0.1, 3.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("k", [3, 5, 7, 9, 13])
def test_box_filter_matches_cv2(smap, k):
    ours = np.asarray(iops.box_filter(jnp.asarray(smap), k))
    ref = cv2.blur(smap, (k, k))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_filters_are_batched(smap, rng):
    batch = rng.rand(3, 32, 32).astype(np.float32)
    out = np.asarray(iops.gaussian_blur(jnp.asarray(batch), 9, 0.0))
    for i in range(3):
        single = np.asarray(iops.gaussian_blur(jnp.asarray(batch[i]), 9, 0.0))
        np.testing.assert_allclose(out[i], single, atol=1e-6)


def test_rgb_to_gray_matches_cv2(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.float32)
    ours = np.asarray(iops.rgb_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_normalization_round_trips(rng):
    u8 = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    gan = iops.to_gan_range(jnp.asarray(u8))
    assert float(gan.min()) >= -1.0 and float(gan.max()) <= 1.0
    back = np.asarray(iops.from_gan_range(gan))
    np.testing.assert_array_equal(back, u8)
    unit = iops.to_unit_range(jnp.asarray(u8))
    back2 = np.asarray(iops.from_unit_range(unit))
    np.testing.assert_array_equal(back2, u8)
