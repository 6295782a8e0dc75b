"""Adaptive quantizer: forward semantics (reference: GAN_functions.py:436-446) and
the two gradient modes, with Pallas(interpret)/jnp agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.config import QuantizerConfig
from contextual_image_compression_tpu.ops import quantize as Q


@pytest.fixture
def data(rng):
    lat = jnp.asarray(rng.randn(4, 128).astype(np.float32))
    score = jnp.asarray(rng.rand(4, 1).astype(np.float32))
    strength = jnp.asarray(rng.rand(4, 1).astype(np.float32))
    return lat, score, strength


def test_forward_formula(data):
    lat, score, strength = data
    out = np.asarray(Q.adaptive_quantize_reference_jnp(lat, score, strength))
    scale = np.exp(3.0 * np.asarray(strength) * (1 - np.asarray(score)))
    expected = np.round(np.asarray(lat) * scale) / scale
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_high_saliency_coarser_grid(data):
    """The reference's sign quirk: saliency=1 => scale=1 => integer grid (coarse);
    saliency=0 => fine grid (SURVEY.md section 2.2)."""
    lat, _, _ = data
    strength = jnp.full((4, 1), 0.9)
    err_hi = jnp.abs(Q.adaptive_quantize_reference_jnp(lat, jnp.ones((4, 1)), strength) - lat).max()
    err_lo = jnp.abs(Q.adaptive_quantize_reference_jnp(lat, jnp.zeros((4, 1)), strength) - lat).max()
    assert float(err_hi) > float(err_lo)


@pytest.mark.parametrize("grad_mode", ["reference", "ste"])
def test_pallas_matches_jnp(data, grad_mode):
    lat, score, strength = data
    cfg_p = QuantizerConfig(use_pallas=True, grad_mode=grad_mode)
    cfg_j = QuantizerConfig(use_pallas=False, grad_mode=grad_mode)
    out_p = Q.adaptive_quantize(lat, score, strength, cfg_p)
    out_j = Q.adaptive_quantize(lat, score, strength, cfg_j)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j), atol=1e-6)

    def loss(fn_cfg):
        return lambda l, s, t: jnp.sum(Q.adaptive_quantize(l, s, t, fn_cfg) ** 2)

    gp = jax.grad(loss(cfg_p), argnums=(0, 1, 2))(lat, score, strength)
    gj = jax.grad(loss(cfg_j), argnums=(0, 1, 2))(lat, score, strength)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_reference_mode_latent_grad_is_zero(data):
    lat, score, strength = data
    g = jax.grad(
        lambda l: jnp.sum(Q.adaptive_quantize_reference_jnp(l, score, strength))
    )(lat)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_reference_mode_scale_path_grad_nonzero(data):
    """The scale path (through the saliency score) DOES carry gradient in the
    reference -- this is how encoders get any bottleneck signal at all."""
    lat, score, strength = data
    g = jax.grad(
        lambda s: jnp.sum(Q.adaptive_quantize_reference_jnp(lat, s, strength) ** 2)
    )(score)
    assert float(jnp.abs(g).max()) > 0


def test_ste_mode_latent_grad_is_identity(data):
    lat, score, strength = data
    g = jax.grad(lambda l: jnp.sum(Q.adaptive_quantize_ste_jnp(l, score, strength)))(lat)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_ste_forward_equals_reference_forward(data):
    lat, score, strength = data
    a = Q.adaptive_quantize_ste_jnp(lat, score, strength)
    b = Q.adaptive_quantize_reference_jnp(lat, score, strength)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
