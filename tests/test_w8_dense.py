"""Weight-only int8 dense serving path (ModelConfig.dense_w8).

Contract: `quantize_dense_w8` pre-quantizes exactly the giant Dense kernels
(symmetric per-output-column), `KDense(w8=True)` evaluates
y = x @ (q_w * s_w) + b from the converted tree, and the full codec forward
under dense_w8 matches the fp32 forward within the weight-rounding budget.
The reference has no quantized-serving tier at all; this accelerates the
latent/fc projections of GAN_functions.py:329 (Dense(latent)) and :247
(Dense(16*16*512)) whose weight stream dominates their cost on TPU
(scripts/r3_w8_dense.py: 4-layer stack 1.253 -> 0.675 ms at b128 on v5e).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.config import ModelConfig, QuantizerConfig
from contextual_image_compression_tpu.models import AdaptiveCodec
from contextual_image_compression_tpu.models.layers import (
    KDense,
    quantize_dense_w8,
)

SMALL = ModelConfig(
    img_size=(64, 64),
    base_latent_dim=32,
    generator_base_hw=4,
    attention_use_pallas=False,
    quantizer=QuantizerConfig(use_pallas=False),
)


def _leaf_dtypes(tree):
    return [getattr(x, "dtype", None) for x in jax.tree_util.tree_leaves(tree)]


def test_kdense_w8_matches_quantized_reference():
    """Converted-path output == explicit numpy quantization formula."""
    rng = np.random.RandomState(0)
    k, n, b = 384, 96, 4
    x = jnp.asarray(rng.randn(b, k).astype(np.float32))

    dense_fp = KDense(n)
    v = dense_fp.init(jax.random.PRNGKey(1), x)
    vq = quantize_dense_w8(v, min_elems=1)  # force conversion of this layer

    w32 = np.asarray(v["params"]["Dense_0"]["kernel"], np.float32)
    bias = np.asarray(v["params"]["Dense_0"]["bias"], np.float32)
    s = np.max(np.abs(w32), axis=0, keepdims=True) / 127.0
    q = np.round(w32 / np.maximum(s, 1e-12))
    assert np.all(np.abs(q) <= 127)
    expected = np.asarray(x) @ (q * s) + bias

    got = KDense(n, w8=True).apply(vq, x)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)

    # Rounding budget vs the fp32 layer: |w - q*s| <= s/2 elementwise.
    y_fp = dense_fp.apply(v, x)
    bound = np.abs(np.asarray(x)) @ (np.broadcast_to(s / 2, w32.shape)) + 1e-5
    assert np.all(np.abs(np.asarray(got - y_fp)) <= bound)


def test_kdense_w8_trace_time_fallback():
    """An UNCONVERTED fp kernel under w8=True quantizes at trace time to the
    same numerics (no bandwidth win, but never wrong)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 128).astype(np.float32))
    dense = KDense(64, w8=True)
    v = dense.init(jax.random.PRNGKey(0), x)
    assert v["params"]["Dense_0"]["kernel"].dtype == jnp.float32
    vq = quantize_dense_w8(v, min_elems=1)
    np.testing.assert_allclose(
        np.asarray(dense.apply(v, x)),
        np.asarray(dense.apply(vq, x)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_quantizer_selects_only_giant_kernels():
    """Default threshold converts exactly the codec's 4 latent/fc kernels
    (the next-largest Dense in the zoo is ~4M elements)."""
    codec = AdaptiveCodec(SMALL)
    v = codec.init(jax.random.PRNGKey(0), batch_size=1)
    # At the SMALL scale nothing crosses the production threshold ...
    vq_default = quantize_dense_w8(v)
    assert not any(d == jnp.int8 for d in _leaf_dtypes(vq_default))
    # ... and with a scaled-down threshold, exactly the 4 projections do.
    # Smallest of the 4 projections at this scale: LQ latent/fc = 8192 * 32.
    thr = 4 * 4 * 512 * SMALL.base_latent_dim
    vq = quantize_dense_w8(v, min_elems=thr)
    n_int8 = sum(1 for d in _leaf_dtypes(vq) if d == jnp.int8)
    assert n_int8 == 4
    # Idempotent: int8 kernels are not re-quantized.
    vq2 = quantize_dense_w8(vq, min_elems=thr)
    assert sum(1 for d in _leaf_dtypes(vq2) if d == jnp.int8) == 4
    # Structure: every converted Dense_0 gained a sibling w8_scale.
    flat = jax.tree_util.tree_leaves_with_path(vq)
    scales = [p for p, _ in flat if any("w8_scale" in str(k) for k in p)]
    assert len(scales) == 4


def test_codec_forward_w8_close_to_fp32():
    """Full adaptive-codec forward under dense_w8 stays within the rounding
    budget of the fp32 forward; train path is untouched by the flag."""
    codec_fp = AdaptiveCodec(SMALL)
    codec_w8 = AdaptiveCodec(dataclasses.replace(SMALL, dense_w8=True))
    v = codec_fp.init(jax.random.PRNGKey(0), batch_size=2)
    vq = quantize_dense_w8(v, min_elems=1 << 18)

    rng = np.random.RandomState(2)
    img = jnp.asarray(np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    bpp = jnp.full((2, 1), 1.0, jnp.float32)

    out_fp, _ = codec_fp.apply(v, img, mask, bpp, train=False)
    out_w8, _ = codec_w8.apply(vq, img, mask, bpp, train=False)
    # Decoded images live in [-1, 1] (tanh head); the weight-rounding error is
    # ~1e-2 relative per projection pre-activation, far under this bound.
    diff = float(jnp.max(jnp.abs(out_fp.blended - out_w8.blended)))
    assert diff < 0.15, diff
    rms = float(
        jnp.sqrt(jnp.mean((out_fp.blended - out_w8.blended) ** 2))
    )
    assert rms < 0.03, rms

    # Under train=True the w8 flag must be inert (gradients flow through the
    # fp kernel; quantization is inference-only).
    out_tr, _ = codec_w8.apply(v, img, mask, bpp, train=True)
    out_tr_fp, _ = codec_fp.apply(v, img, mask, bpp, train=True)
    np.testing.assert_allclose(
        np.asarray(out_tr.blended), np.asarray(out_tr_fp.blended), atol=1e-6
    )
