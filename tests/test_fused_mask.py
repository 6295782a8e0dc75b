"""Fused Pallas contextual-mask kernels vs the jnp reference path (interpret mode
on CPU; bit-exactness on real TPU was verified separately: smooth 0.0, contextual
8.3e-7 maxdiff at 256^2)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.config import SaliencyConfig
from contextual_image_compression_tpu.ops import image_ops as iops
from contextual_image_compression_tpu.ops import masks
from contextual_image_compression_tpu.ops.fused_mask import (
    contextual_mask_pallas,
    smooth_mask_pallas,
)
from contextual_image_compression_tpu.ops.saliency import (
    spectral_residual_saliency,
)


def test_smooth_mask_pallas_matches_jnp(rng):
    sal = jnp.asarray(rng.rand(2, 64, 64).astype(np.float32))
    ref = iops.normalize_max(
        iops.gaussian_blur(iops.bilateral_filter(sal, 9, 75.0, 75.0), 31, 0.0)
    )
    got = smooth_mask_pallas(sal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_contextual_mask_pallas_matches_jnp(rng):
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    cfg = SaliencyConfig()
    spec = spectral_residual_saliency(imgs, cfg.spectral_resolution,
                                      cfg.spectral_blur_sigma)
    gray = iops.rgb_to_gray((imgs + 1.0) * 127.5)
    got = contextual_mask_pallas(gray, spec, scales=cfg.fine_grained_scales)

    ref = masks.compute_contextual_mask(
        imgs, dataclasses.replace(cfg, mask_use_pallas=False)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_contextual_mask_small_spec_matches_full(rng):
    """Small-spec form (64^2 spectral map + in-kernel operator-matrix
    upsample, config.mask_spec_small) == the full-size-spec form: the same
    linear maps run inside VMEM instead of through HBM."""
    from contextual_image_compression_tpu.ops.saliency import (
        spectral_residual_small,
    )

    imgs = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1)
    cfg = SaliencyConfig()
    gray = iops.rgb_to_gray((imgs + 1.0) * 127.5)
    spec_full = spectral_residual_saliency(
        imgs, cfg.spectral_resolution, cfg.spectral_blur_sigma
    )
    spec_small = spectral_residual_small(
        imgs, cfg.spectral_resolution, cfg.spectral_blur_sigma
    )
    assert spec_small.shape == (2, 64, 64)
    m_full = contextual_mask_pallas(gray, spec_full, scales=cfg.fine_grained_scales)
    m_small = contextual_mask_pallas(gray, spec_small, scales=cfg.fine_grained_scales)
    np.testing.assert_allclose(
        np.asarray(m_small), np.asarray(m_full), atol=2e-5
    )


def test_uint8_input_exact(rng):
    """uint8 images (the production wire format) must produce the SAME mask as
    the [-1,1] float path: gray255 from u8 is the identical f32 value."""
    u8 = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 127.5 - 1.0
    cfg = SaliencyConfig()
    m_u8 = masks.compute_contextual_mask(jnp.asarray(u8), cfg)
    m_f32 = masks.compute_contextual_mask(jnp.asarray(f32), cfg)
    np.testing.assert_allclose(np.asarray(m_u8), np.asarray(m_f32), atol=1e-5)


def test_non_square_supported(rng):
    """The lane-offset column-pass formulation handles non-square maps (the
    earlier transpose-scratch version was square-only)."""
    sal = jnp.asarray(rng.rand(1, 32, 64).astype(np.float32))
    got = smooth_mask_pallas(sal)
    ref = masks.create_saliency_mask(sal, smooth=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_compute_contextual_mask_dispatches_to_jnp_off_tpu(rng):
    """On CPU the fused path must not engage (interpret would be slow); the
    public entry point still produces the right mask."""
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    out = masks.compute_contextual_mask(imgs, SaliencyConfig())
    assert out.shape == (2, 32, 32)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0 + 1e-6


def test_bf16_engine_close_to_f32(rng):
    """The bf16-compute mask engine option (measured-and-rejected for speed,
    kept as an option) must stay within bf16 noise of the f32 path."""
    gray = jnp.asarray(rng.rand(2, 64, 64).astype(np.float32) * 255)
    spec = jnp.asarray(rng.rand(2, 64, 64).astype(np.float32))
    m32 = contextual_mask_pallas(gray, spec)
    mbf = contextual_mask_pallas(gray, spec, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(mbf), np.asarray(m32), atol=5e-2)
