"""Mixed-precision (bfloat16-activation) training.

Round-1 measured bf16-compute training going NaN within a few steps. The NaN
source was losses computed in the activation dtype: keras-semantics BCE clips
probabilities to [1e-7, 1 - 1e-7] (reference: GAN_train.py:210-218 uses Keras
BinaryCrossentropy), but 1 - 1e-7 is not representable in bf16 -- the clip rounds
back to exactly 1.0 and log(1 - p) = -inf. The fix is the standard TPU recipe:
bf16 activations, fp32 parameters + optimizer states + BN statistics (flax
computes normalization stats in fp32) + all losses in fp32 (losses._f32).

These tests pin that recipe: saturated-bf16 BCE stays finite, a multi-step
mixed-precision train run at tiny scale stays finite, and parameters/optimizer
moments remain fp32 throughout.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from contextual_image_compression_tpu.config import (
    ModelConfig,
    QuantizerConfig,
    TrainConfig,
)
from contextual_image_compression_tpu.train import losses as L
from contextual_image_compression_tpu.train.gan_trainer import Batch, GANStepBuilder

TINY_BF16 = ModelConfig(
    img_size=(32, 32),
    base_latent_dim=16,
    encoder_channels=(8, 16, 24, 32),
    generator_channels=(24, 16, 8, 8),
    generator_base_hw=2,
    generator_base_ch=32,
    attention_use_pallas=False,
    quantizer=QuantizerConfig(use_pallas=False, grad_mode="ste"),
    dtype="bfloat16",
    param_dtype="float32",
)
CFG = TrainConfig(model=TINY_BF16, batch_size=4, use_perceptual=False)


def _batch(seed=7, b=4):
    rng = np.random.RandomState(seed)
    return Batch(
        image=jnp.asarray(rng.rand(b, 32, 32, 3).astype(np.float32) * 2 - 1),
        mask=jnp.asarray(rng.rand(b, 32, 32, 1).astype(np.float32)),
        bpp=jnp.asarray(rng.choice([0.1, 1.0, 2.0], (b, 1)).astype(np.float32)),
    )


def test_bce_saturated_bf16_is_finite():
    """BCE on bf16 probabilities that saturate to exactly 0.0 / 1.0 must stay
    finite (the round-1 NaN source: clip eps below bf16 resolution)."""
    probs = jnp.asarray([0.0, 1.0, 0.5, 1.0], jnp.bfloat16)
    labels = jnp.asarray([1.0, 0.0, 1.0, 1.0], jnp.bfloat16)
    val = L.bce(labels, probs)
    assert val.dtype == jnp.float32
    assert bool(jnp.isfinite(val))
    # gradient through the clip is finite too
    g = jax.grad(lambda p: L.bce(labels.astype(jnp.float32), p))(
        probs.astype(jnp.float32)
    )
    assert bool(jnp.all(jnp.isfinite(g)))


def test_losses_return_f32_on_bf16_inputs():
    a = jnp.ones((4, 8, 8, 3), jnp.bfloat16)
    b = jnp.zeros((4, 8, 8, 3), jnp.bfloat16)
    for val in (L.mse(a, b), L.mae(a, b)):
        assert val.dtype == jnp.float32
        assert bool(jnp.isfinite(val))


def test_mixed_precision_training_stays_finite():
    """Multiple fused train steps with bf16 activations: finite metrics, fp32
    params and Adam moments throughout, and bf16 actually used in the forward."""
    builder = GANStepBuilder(CFG, bn_mode="train", disc_bn_mode="frozen")
    state = builder.init_state(jax.random.PRNGKey(0), batch_size=4)

    # params are stored fp32
    leaves = jax.tree.leaves(state.codec_vars)
    assert all(x.dtype == jnp.float32 for x in leaves if jnp.issubdtype(x.dtype, jnp.floating))

    # forward runs in bf16 (blended output dtype is the compute dtype)
    out, _ = builder.codec.apply(
        state.codec_vars, _batch().image, _batch().mask, _batch().bpp, train=False
    )
    assert out.blended.dtype == jnp.bfloat16

    step_d, step_g = builder.jitted_steps(donate=False)
    for i in range(6):
        fn = step_d if i % 2 == 0 else step_g
        state, metrics = fn(state, _batch(seed=i))
        assert all(np.isfinite(float(v)) for v in metrics.values()), (
            i,
            {k: float(v) for k, v in metrics.items()},
        )

    # params and Adam moments still fp32 after updates
    for tree in (state.codec_vars, state.g_opt, state.d_opt):
        for x in jax.tree.leaves(tree):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                assert x.dtype == jnp.float32


def test_mixed_matches_fp32_loosely():
    """One mixed step's metrics should track the fp32 step's within bf16 noise
    (same seeds, same data) -- guards against an accidental semantic change."""
    fp32_cfg = TrainConfig(
        model=dataclasses.replace(TINY_BF16, dtype="float32"),
        batch_size=4,
        use_perceptual=False,
    )
    b = _batch()
    out = {}
    for name, cfg in (("mixed", CFG), ("fp32", fp32_cfg)):
        builder = GANStepBuilder(cfg, bn_mode="frozen")
        state = builder.init_state(jax.random.PRNGKey(0), batch_size=4)
        _, step_g = builder.jitted_steps(donate=False)
        _, metrics = step_g(state, b)
        out[name] = {k: float(v) for k, v in metrics.items()}
    for k in out["fp32"]:
        ref = out["fp32"][k]
        got = out["mixed"][k]
        assert abs(got - ref) <= max(0.05, 0.08 * abs(ref)), (k, got, ref)
