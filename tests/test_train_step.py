"""GAN training step: loss formulas, the single-backward gradient-routing
equivalence with the reference's three GradientTapes, and smoke training."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.config import (
    LossConfig,
    ModelConfig,
    QuantizerConfig,
    TrainConfig,
)
from contextual_image_compression_tpu.models.adaptive import (
    GENERATOR_COMPONENTS,
    LATENT_SALIENCY_COMPONENTS,
    RD_COMPONENTS,
    AdaptiveCodec,
)
from contextual_image_compression_tpu.train import losses as L
from contextual_image_compression_tpu.train.gan_trainer import Batch, GANStepBuilder

TINY = ModelConfig(
    img_size=(32, 32),
    base_latent_dim=16,
    encoder_channels=(8, 16, 24, 32),
    generator_channels=(24, 16, 8, 8),
    generator_base_hw=2,
    generator_base_ch=32,
    attention_use_pallas=False,
    quantizer=QuantizerConfig(use_pallas=False, grad_mode="ste"),
)
CFG = TrainConfig(model=TINY, batch_size=4, use_perceptual=False)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(7)
    return Batch(
        image=jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32) * 2 - 1),
        mask=jnp.asarray(rng.rand(4, 32, 32, 1).astype(np.float32)),
        bpp=jnp.asarray(rng.choice([0.1, 1.0, 2.0], (4, 1)).astype(np.float32)),
    )


@pytest.fixture(scope="module")
def builder():
    return GANStepBuilder(CFG, bn_mode="frozen")


@pytest.fixture(scope="module")
def state(builder):
    return builder.init_state(jax.random.PRNGKey(0), batch_size=4)


def test_loss_weights_sum(batch):
    """g = 0.35 recon + 0.15 l1 + 0.15 perc + 0.15 adv + 0.20 bitrate (+ floor)
    (reference: GAN_train.py:351-361)."""
    lcfg = LossConfig()
    g = L.combine_generator_loss(
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
        jnp.float32(1.0), lcfg,
    )
    np.testing.assert_allclose(float(g), 1.0, atol=1e-6)  # sum of weights = 1, > floor
    g_small = L.combine_generator_loss(
        *([jnp.float32(0.1)] * 5), lcfg
    )  # 0.1 < 0.5 floor => offset (0.5-0.1)*0.5
    np.testing.assert_allclose(float(g_small), 0.1 + 0.2, atol=1e-6)


def test_analytic_bpp_range():
    """bpp in [0.25, 0.5] for D=512 at 256^2 (reference: GAN_test.py:314-325)."""
    alloc0 = jnp.zeros((1, 256, 256, 1))
    alloc1 = jnp.ones((1, 256, 256, 1))
    lo = float(L.analytic_bpp_from_allocation(alloc0, 512, (256, 256))[0])
    hi = float(L.analytic_bpp_from_allocation(alloc1, 512, (256, 256))[0])
    np.testing.assert_allclose(lo, 0.25, atol=1e-6)
    np.testing.assert_allclose(hi, 0.50, atol=1e-6)


def test_bce_keras_semantics():
    labels = jnp.array([[1.0], [0.0]])
    probs = jnp.array([[0.9], [0.1]])
    expected = -np.mean([np.log(0.9), np.log(0.9)])
    np.testing.assert_allclose(float(L.bce(labels, probs)), expected, rtol=1e-5)
    # extreme probs are clipped, no inf
    assert np.isfinite(float(L.bce(labels, jnp.array([[1.0], [0.0]]))))


def test_gradient_routing_matches_three_tapes(builder, state, batch):
    """The fused single-backward gradients must equal the reference's three
    per-tape gradients (GAN_train.py:369-389) computed independently."""
    codec: AdaptiveCodec = builder.codec
    lcfg = CFG.loss
    mcfg = CFG.model
    disc_vars = state.disc_vars

    codec_vars = state.codec_vars
    all_params = {n: v["params"] for n, v in codec_vars.items()}
    rest = {n: {k: v for k, v in codec_vars[n].items() if k != "params"} for n in codec_vars}

    def forward(params, detach):
        cv = {n: dict(rest[n], params=params[n]) for n in params}
        out, _ = codec.apply(cv, batch.image, batch.mask, batch.bpp, train=False,
                             detach_for_training=detach)
        return out

    def g_loss_of(out):
        fake_preds = builder.disc.apply(disc_vars, out.blended, train=False)
        recon = L.mse(batch.image, out.blended)
        adv = L.adversarial_loss(fake_preds)
        l1 = L.mae(batch.image, out.blended)
        bitrate, _ = L.bitrate_losses(out.dynamic_threshold, batch.bpp,
                                      mcfg.base_latent_dim, mcfg.img_size, lcfg)
        return L.combine_generator_loss(recon, l1, jnp.float32(0.0), adv, bitrate, lcfg)

    def ls_loss_of(out):
        return lcfg.ls_loss_weight * L.latent_saliency_loss(
            out.hq_saliency_loss, out.lq_saliency_loss, batch.mask, lcfg)

    def rd_loss_of(out):
        bitrate, underutil = L.bitrate_losses(out.dynamic_threshold, batch.bpp,
                                              mcfg.base_latent_dim, mcfg.img_size, lcfg)
        return lcfg.rd_loss_weight * L.rd_loss(out.rd_params, batch.bpp, lcfg) \
            + lcfg.rd_bitrate_weight * bitrate + underutil

    # --- fused: single grad of the total through the detached forward -------
    def total_loss(params):
        out = forward(params, detach=True)
        return g_loss_of(out) + ls_loss_of(out) + rd_loss_of(out)

    fused = jax.grad(total_loss)(all_params)

    # --- three independent "tapes": differentiate only one group each, with the
    # NON-detached forward (the reference's graph) ----------------------------
    def tape(loss_of, names):
        def fn(sub):
            params = dict(all_params)
            params.update(sub)
            return loss_of(forward(params, detach=False))
        return jax.grad(fn)({n: all_params[n] for n in names})

    g_expected = tape(g_loss_of, GENERATOR_COMPONENTS)
    ls_expected = tape(ls_loss_of, LATENT_SALIENCY_COMPONENTS)
    rd_expected = tape(rd_loss_of, RD_COMPONENTS)

    for expected, names in [
        (g_expected, GENERATOR_COMPONENTS),
        (ls_expected, LATENT_SALIENCY_COMPONENTS),
        (rd_expected, RD_COMPONENTS),
    ]:
        for n in names:
            a = jax.tree.leaves(fused[n])
            b = jax.tree.leaves(expected[n])
            for x, y in zip(a, b):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), atol=1e-5,
                    err_msg=f"gradient mismatch in {n}",
                )


def test_train_steps_run_and_update(builder, state, batch):
    step_d, step_nd = builder.jitted_steps(donate=False)
    s1, m1 = step_d(state, batch)
    s2, m2 = step_nd(s1, batch)
    for k, v in {**m1, **m2}.items():
        assert np.isfinite(float(v)), k
    # params actually moved in every optimizer group
    for n in GENERATOR_COMPONENTS + LATENT_SALIENCY_COMPONENTS + RD_COMPONENTS:
        before = jax.tree.leaves(state.codec_vars[n]["params"])
        after = jax.tree.leaves(s2.codec_vars[n]["params"])
        assert any(bool(jnp.any(a != b)) for a, b in zip(before, after)), n
    assert bool(
        jnp.any(
            jax.tree.leaves(state.disc_vars["params"])[0]
            != jax.tree.leaves(s1.disc_vars["params"])[0]
        )
    )
    assert int(s2.step) == 2
    assert "d_loss" in m1 and "d_loss" not in m2  # D every other step


def test_broadcast_quirk_mode(batch):
    """Bug-compatible mode reproduces the reference's (B,B) broadcast means."""
    lcfg_quirk = LossConfig(reference_broadcast_quirk=True)
    lcfg_fixed = LossConfig()
    hq = jnp.asarray(np.random.RandomState(0).rand(4, 1).astype(np.float32))
    lq = 1.0 - hq
    quirk = L.latent_saliency_loss(hq, lq, batch.mask, lcfg_quirk)
    fixed = L.latent_saliency_loss(hq, lq, batch.mask, lcfg_fixed)
    # numpy emulation of the TF broadcast
    fm = np.mean(np.asarray(batch.mask), axis=(1, 2, 3))
    expected_quirk = np.mean((np.asarray(hq) - fm) ** 2) + np.mean(
        (np.asarray(lq) - (1 - fm)) ** 2
    )
    np.testing.assert_allclose(float(quirk), expected_quirk, rtol=1e-5)
    assert abs(float(quirk) - float(fixed)) > 0 or np.allclose(fm, fm[0])


def test_reference_faithful_mode_trains(batch):
    """All reference-faithful flags together: frozen BN, zero-grad quantizer,
    (B,B) broadcast losses -- 2 steps run finite and update params."""
    cfg = dataclasses.replace(
        CFG,
        model=dataclasses.replace(
            TINY, quantizer=QuantizerConfig(use_pallas=False, grad_mode="reference")
        ),
        loss=dataclasses.replace(CFG.loss, reference_broadcast_quirk=True),
    )
    builder = GANStepBuilder(cfg, bn_mode="frozen")
    state = builder.init_state(jax.random.PRNGKey(1), batch_size=4)
    step_d, step_nd = builder.jitted_steps(donate=False)
    s1, m1 = step_d(state, batch)
    s2, m2 = step_nd(s1, batch)
    for k, v in {**m1, **m2}.items():
        assert np.isfinite(float(v)), k
    # generators still learn (through skips; the latent path is dead by design)
    before = jax.tree.leaves(state.codec_vars["hq_generator"]["params"])
    after = jax.tree.leaves(s2.codec_vars["hq_generator"]["params"])
    assert any(bool(jnp.any(a != b)) for a, b in zip(before, after))


def test_branch_recon_loss_value_and_gradient(builder, state, batch):
    """LossConfig.branch_recon_weight=w adds exactly w*(MSE(img,hq_out) +
    MSE(img,lq_out)) to g_loss (measured on the round-5 checkpoint: the
    reference's blended-only recon leaves the HQ branch at 14.65 dB vs LQ's
    22.50 dB because the training blend map is ~all-LQ), and w=0 stays
    bit-identical faithful."""
    cfg_on = dataclasses.replace(
        CFG, loss=dataclasses.replace(CFG.loss, branch_recon_weight=0.2)
    )
    builder_on = GANStepBuilder(cfg_on, bn_mode="frozen")
    # identical state: same init key
    state0 = builder.init_state(jax.random.PRNGKey(3), batch_size=4)
    state1 = builder_on.init_state(jax.random.PRNGKey(3), batch_size=4)

    _, step_off = builder.jitted_steps(donate=False)
    _, step_on = builder_on.jitted_steps(donate=False)
    s_off, m_off = step_off(state0, batch)
    s_on, m_on = step_on(state1, batch)

    # the added term equals w * (mse_hq + mse_lq) of the pre-update forward
    codec = AdaptiveCodec(TINY)
    out, _ = codec.apply(state0.codec_vars, batch.image, batch.mask, batch.bpp,
                         train=False)
    expected = 0.2 * (
        float(L.mse(batch.image, out.hq_output))
        + float(L.mse(batch.image, out.lq_output))
    )
    got = float(m_on["g_loss"]) - float(m_off["g_loss"])
    np.testing.assert_allclose(got, expected, rtol=2e-2)

    # and it moves the generators differently (extra gradient through both)
    for n in ("hq_generator", "lq_generator"):
        a = jax.tree.leaves(s_off.codec_vars[n]["params"])
        b = jax.tree.leaves(s_on.codec_vars[n]["params"])
        assert any(bool(jnp.any(x != y)) for x, y in zip(a, b)), n
