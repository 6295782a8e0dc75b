"""Model zoo shape/behavior contracts (reference shapes from SURVEY.md section 2.2).

Tests use a reduced 64x64 config for speed; one test pins the exact reference
256x256 shapes via shape inference (jax.eval_shape -- no FLOPs spent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.config import ModelConfig, QuantizerConfig
from contextual_image_compression_tpu.models import (
    AdaptiveCodec,
    Autoencoder,
    Discriminator,
    Encoder,
    Generator,
    LatentSaliency,
    RDOptimizer,
)
from contextual_image_compression_tpu.models.spectral_norm import SpectralNormDense
from contextual_image_compression_tpu.ops.attention import (
    attention_core_jnp,
    attention_core_pallas,
    sagan_block_jnp,
    sagan_block_pallas,
    sagan_block_spatial_jnp,
    sagan_block_spatial_pallas,
)

SMALL = ModelConfig(
    img_size=(64, 64),
    base_latent_dim=32,
    generator_base_hw=4,
    attention_use_pallas=False,
    quantizer=QuantizerConfig(use_pallas=False),
)


def test_reference_shapes_256():
    """Exact reference shape contract at full scale, via abstract evaluation."""
    cfg = ModelConfig()  # 256x256, D=512
    codec = AdaptiveCodec(cfg)
    img = jax.ShapeDtypeStruct((2, 256, 256, 3), jnp.float32)

    enc = codec.hq_encoder
    out_shapes = jax.eval_shape(
        lambda x: enc.init_with_output(jax.random.PRNGKey(0), x, train=False)[0], img
    )
    latent, (s1, s2, s3) = out_shapes
    assert latent.shape == (2, 1024)  # HQ latent = 2*512
    assert s1.shape == (2, 128, 128, 64)
    assert s2.shape == (2, 64, 64, 128)
    assert s3.shape == (2, 32, 32, 256)


def test_adaptive_codec_outputs():
    codec = AdaptiveCodec(SMALL)
    vars_ = codec.init(jax.random.PRNGKey(0), batch_size=2)
    img = jnp.zeros((2, 64, 64, 3))
    mask = jnp.full((2, 64, 64, 1), 0.5)
    bpp = jnp.ones((2, 1))
    out, updates = codec.apply(vars_, img, mask, bpp, train=True)
    assert out.blended.shape == (2, 64, 64, 3)
    assert out.hq_latent_q.shape == (2, 64)
    assert out.lq_latent_q.shape == (2, 32)
    assert out.rd_params.shape == (2, 3)
    assert out.dynamic_threshold.shape == (2, 64, 64, 1)
    assert float(jnp.abs(out.blended).max()) <= 1.0  # tanh range
    assert set(updates) == {"hq_encoder", "lq_encoder", "hq_generator", "lq_generator"}


def test_encoder_s2d_convs_exact_same_function():
    """encoder_s2d_convs lowers conv2/conv3 via space-to-depth + remapped
    k3/s1 kernels (models/layers.py::conv4s2_s2d_kernel); same variables tree,
    same outputs (up to float reassociation)."""
    import dataclasses

    from contextual_image_compression_tpu.models.encoder import Encoder

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    base = Encoder(latent_dim=32, add_attention=False, s2d_convs=False)
    s2d = Encoder(latent_dim=32, add_attention=False, s2d_convs=True)
    vars_ = base.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(
        s2d.init(jax.random.PRNGKey(0), x, train=False)
    ) == jax.tree_util.tree_structure(vars_)
    lat_a, skips_a = base.apply(vars_, x, train=False)
    lat_b, skips_b = s2d.apply(vars_, x, train=False)
    np.testing.assert_allclose(np.asarray(lat_b), np.asarray(lat_a), atol=2e-4)
    for sa, sb in zip(skips_a, skips_b):
        np.testing.assert_allclose(np.asarray(sb), np.asarray(sa), atol=2e-4)

    # differentiable: a train-mode grad through the s2d form is finite
    cfg = dataclasses.replace(SMALL, encoder_s2d_convs=True)
    codec = AdaptiveCodec(cfg)
    cv = codec.init(jax.random.PRNGKey(0), batch_size=2)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 0.1)
    mask = jnp.full((2, 64, 64, 1), 0.5)
    bpp = jnp.ones((2, 1))

    def loss(v):
        out, _ = codec.apply(v, img, mask, bpp, train=True)
        return jnp.mean(out.blended**2)

    g = jax.grad(loss)(cv)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_rd_schedule_reference_formulas():
    """(reference: GAN_functions.py:631-649)"""
    codec = AdaptiveCodec(SMALL)
    bpp = jnp.array([[0.1], [1.0], [2.0], [10.0]])
    overall, thr, qs = codec.rd_schedule(bpp)
    b = np.clip(np.array([0.1, 1.0, 2.0, 10.0]) / 5.0, 0, 1)[:, None]
    np.testing.assert_allclose(np.asarray(overall), 1 - 0.8 * b, atol=1e-6)
    np.testing.assert_allclose(np.asarray(thr), 0.9 - 0.85 * b, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qs), 0.9 - 0.8 * b, atol=1e-6)


def test_rd_schedule_fixed_mode_monotone():
    """rate_mode='fixed': quant_strength -- hence the quantizer grid scale
    exp(3*q*(1-s)) and the entropy-coded latent rate -- RISES with target bpp,
    while the threshold/overall legs stay faithful (see ModelConfig.rate_mode;
    the reference schedule GAN_functions.py:631-649 is anti-monotone on the
    real-bitstream axis, runs/r4_skipfree)."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, rate_mode="fixed")
    codec = AdaptiveCodec(cfg)
    bpp = jnp.array([[0.1], [0.5], [1.0], [2.0], [5.0]])
    overall, thr, qs = codec.rd_schedule(bpp)
    q = np.asarray(qs)[:, 0]
    assert np.all(np.diff(q) > 0), q  # strictly rising over the sweep range
    assert np.all(q <= cfg.fixed_quant_max + 1e-6)
    b = np.clip(np.array([0.1, 0.5, 1.0, 2.0, 5.0]) / 5.0, 0, 1)[:, None]
    # threshold / overall legs identical to the reference schedule
    np.testing.assert_allclose(np.asarray(overall), 1 - 0.8 * b, atol=1e-6)
    np.testing.assert_allclose(np.asarray(thr), 0.9 - 0.85 * b, atol=1e-6)
    # the resulting grid is strictly finer at higher target bpp, so the
    # quantized latent carries strictly more resolution
    z = jnp.asarray(np.random.RandomState(1).randn(5, 32).astype(np.float32))
    s = jnp.full((5, 1), 0.4)
    from contextual_image_compression_tpu.ops.quantize import (
        adaptive_quantize_reference_jnp,
    )
    err = np.asarray(
        jnp.mean(jnp.abs(adaptive_quantize_reference_jnp(z, s, qs) - z), axis=1)
    )
    assert np.all(np.diff(err) < 0), err  # quantization error falls with bpp


def test_mask_skip_mode_shapes_and_content():
    """skip_mode='mask': same skip shapes/param tree as 'zero', channel 0/1
    carry the resized mask and blend map, the rest are zero; decode_latents
    uses the same construction so bitstream decode matches the forward pass."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, skip_mode="mask")
    codec = AdaptiveCodec(cfg)
    vars_ = codec.init(jax.random.PRNGKey(0), batch_size=2)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 0.3)
    mask = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    bpp = jnp.ones((2, 1))
    out, _ = codec.apply(vars_, img, mask, bpp, train=False)
    assert out.blended.shape == (2, 64, 64, 3)

    skips = codec._mask_skips(mask, out.dynamic_threshold, jnp.float32)
    ch = cfg.encoder_channels
    for i, s in enumerate(skips, start=1):
        assert s.shape == (2, 64 >> i, 64 >> i, ch[i - 1])
        assert float(jnp.abs(s[..., 2:]).max()) == 0.0  # only 2 signal planes
        assert float(jnp.abs(s[..., 0]).max()) > 0.0    # mask plane populated

    # decode-only path reconstructs the forward output exactly (same latents,
    # same full-res mask -> same skips)
    dec = codec.decode_latents(
        vars_, out.hq_latent_q, out.lq_latent_q, mask, bpp
    )
    np.testing.assert_allclose(
        np.asarray(dec), np.asarray(out.blended), atol=1e-5
    )

    # checkpoint-compatibility: the variables tree is identical to 'zero'
    zero_vars = AdaptiveCodec(
        dataclasses.replace(SMALL, skip_mode="zero")
    ).init(jax.random.PRNGKey(0), batch_size=2)
    assert jax.tree_util.tree_structure(vars_) == jax.tree_util.tree_structure(
        zero_vars
    )


def test_quant_bypass_ceiling_flag():
    """quant_bypass=True feeds unquantized latents to the generators; with a
    fine grid the bypassed and quantized outputs converge, and bypass always
    reconstructs at least as faithfully from the latents' viewpoint."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, skip_mode="zero")
    codec_q = AdaptiveCodec(cfg)
    codec_b = AdaptiveCodec(dataclasses.replace(cfg, quant_bypass=True))
    vars_ = codec_q.init(jax.random.PRNGKey(0), batch_size=1)
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 0.3)
    mask = jnp.full((1, 64, 64, 1), 0.5)
    bpp = jnp.ones((1, 1))
    out_q, _ = codec_q.apply(vars_, img, mask, bpp, train=False)
    out_b, _ = codec_b.apply(vars_, img, mask, bpp, train=False)
    # bypass returns the raw latents as 'quantized'
    np.testing.assert_allclose(
        np.asarray(out_b.hq_latent_q), np.asarray(out_b.hq_latent), atol=0
    )
    # quantized path differs (the grid is real at this scale)
    assert float(jnp.abs(out_q.blended - out_b.blended).max()) > 0


def test_dynamic_threshold_monotone_in_bpp():
    """Higher target bpp -> lower threshold -> more HQ area
    (the reference's rate-control contract, hq_ratio_by_bpp.png)."""
    codec = AdaptiveCodec(SMALL)
    mask = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 1).astype(np.float32))
    ratios = []
    for bpp in [0.1, 1.0, 2.0]:
        _, thr, _ = codec.rd_schedule(jnp.full((1, 1), bpp))
        ratios.append(float(jnp.mean(codec.dynamic_threshold(mask, thr))))
    assert ratios[0] < ratios[1] < ratios[2]


def test_hard_threshold_mode():
    import dataclasses

    cfg = dataclasses.replace(SMALL, threshold_mode="hard")
    codec = AdaptiveCodec(cfg)
    mask = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 1).astype(np.float32))
    thr = jnp.full((1, 1), 0.5)
    out = np.asarray(codec.dynamic_threshold(mask, thr))
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_discriminator_sigmoid_and_stages():
    disc = Discriminator()
    img = jnp.zeros((2, 64, 64, 3))
    v = disc.init(jax.random.PRNGKey(0), img, train=False)
    p = disc.apply(v, img, train=False)
    assert p.shape == (2, 1)
    assert 0.0 <= float(p.min()) and float(p.max()) <= 1.0
    # 64 -> 4 stages (log2(64/4) = 4)
    assert sum(1 for k in v["params"] if k.startswith("conv")) == 4


def test_discriminator_non_power_of_two():
    disc = Discriminator()
    img = jnp.zeros((1, 96, 96, 3))
    v = disc.init(jax.random.PRNGKey(0), img, train=False)
    p = disc.apply(v, img, train=False)
    assert p.shape == (1, 1)


def test_latent_saliency_range():
    m = LatentSaliency()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32)))
    s = m.apply(v, jnp.ones((2, 32)) * 10)
    assert s.shape == (2, 1)
    assert 0.0 < float(s.min()) and float(s.max()) < 1.0


def test_rd_optimizer_outputs():
    m = RDOptimizer()
    img = jnp.zeros((2, 64, 64, 3))
    sal = jnp.zeros((2, 64, 64, 1))
    bpp = jnp.ones((2, 1))
    v = m.init(jax.random.PRNGKey(0), img, sal, bpp)
    out = m.apply(v, img, sal, bpp)
    assert out.shape == (2, 3)
    assert 0.0 < float(out.min()) and float(out.max()) < 1.0


def test_autoencoder_shapes():
    ae = Autoencoder()
    x = jnp.zeros((2, 128, 128, 3))
    v = ae.init(jax.random.PRNGKey(0), x)
    y = ae.apply(v, x)
    assert y.shape == (2, 128, 128, 3)
    assert 0.0 <= float(y.min()) and float(y.max()) <= 1.0
    z = ae.apply(v, x, method=ae.encode)
    assert z.shape == (2, 32, 32, 64)  # reference bottleneck (train_autoencoder.py:18)


def test_attention_pallas_matches_jnp(rng):
    q = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    out_p = attention_core_pallas(q, k, v)
    out_j = attention_core_jnp(q, k, v)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j), atol=1e-5)
    # gradients flow
    g = jax.grad(lambda q_: jnp.sum(attention_core_pallas(q_, k, v) ** 2))(q)
    gj = jax.grad(lambda q_: jnp.sum(attention_core_jnp(q_, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gj), atol=1e-4)


def test_sagan_block_pallas_matches_jnp(rng):
    """The fully fused SAGAN block (projections + attention + gamma epilogue
    in one kernel) matches the composed jnp formulation, fwd and bwd, on both
    the (B, N, C) and spatial (B, H, W, C) views."""
    b, n, c, inner, dv = 2, 64, 32, 4, 32
    xf = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    wq = jnp.asarray(rng.randn(c, inner).astype(np.float32) * 0.1)
    bq = jnp.asarray(rng.randn(inner).astype(np.float32) * 0.1)
    wk = jnp.asarray(rng.randn(c, inner).astype(np.float32) * 0.1)
    bk = jnp.asarray(rng.randn(inner).astype(np.float32) * 0.1)
    wv = jnp.asarray(rng.randn(c, dv).astype(np.float32) * 0.1)
    bv = jnp.asarray(rng.randn(dv).astype(np.float32) * 0.1)
    gamma = jnp.float32(0.7)
    args = (xf, wq, bq, wk, bk, wv, bv, gamma)

    out_p = sagan_block_pallas(*args)
    out_j = sagan_block_jnp(*args)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j), atol=1e-5)

    gp = jax.grad(lambda x_: jnp.sum(sagan_block_pallas(x_, *args[1:]) ** 2))(xf)
    gj = jax.grad(lambda x_: jnp.sum(sagan_block_jnp(x_, *args[1:]) ** 2))(xf)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj), atol=1e-4)

    x4 = xf.reshape(b, 8, 8, c)
    sp = sagan_block_spatial_pallas(x4, *args[1:])
    sj = sagan_block_spatial_jnp(x4, *args[1:])
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sj), atol=1e-5)
    g4p = jax.grad(lambda x_: jnp.sum(sagan_block_spatial_pallas(x_, *args[1:]) ** 2))(x4)
    g4j = jax.grad(lambda x_: jnp.sum(sagan_block_spatial_jnp(x_, *args[1:]) ** 2))(x4)
    np.testing.assert_allclose(np.asarray(g4p), np.asarray(g4j), atol=1e-4)


def test_spectral_norm_normalizes():
    sn = SpectralNormDense(16)
    v = sn.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))
    out, mut = sn.apply(v, jnp.ones((2, 8)), update_stats=True, mutable=["spectral_stats"])
    assert out.shape == (2, 16)
    assert bool(jnp.any(mut["spectral_stats"]["u"] != v["spectral_stats"]["u"]))


def test_polyphase_convtranspose_equivalence(rng):
    """Polyphase lowering of ConvTranspose(4,4,s2,SAME): identical outputs,
    gradients, and parameter tree to the nn.ConvTranspose path."""
    from contextual_image_compression_tpu.models.generator import Generator

    lat = jnp.asarray(rng.randn(2, 64).astype(np.float32))
    skips = (
        jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32)),
        jnp.asarray(rng.randn(2, 4, 4, 24).astype(np.float32)),
    )
    g_poly = Generator(channels=(24, 16, 8, 8), base_hw=2, base_ch=32, polyphase=True)
    g_ref = Generator(channels=(24, 16, 8, 8), base_hw=2, base_ch=32, polyphase=False)
    v = g_poly.init(jax.random.PRNGKey(0), lat, skips, train=False)
    y1 = g_poly.apply(v, lat, skips, train=False)
    y2 = g_ref.apply(v, lat, skips, train=False)  # same params, different lowering
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    v2 = g_ref.init(jax.random.PRNGKey(0), lat, skips, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)


def test_dense_int8_close_to_fp(rng):
    """W8A8 KDense: same param tree as the fp path, output within int8
    quantization error."""
    from contextual_image_compression_tpu.models.layers import KDense

    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    d_fp = KDense(32)
    d_q = KDense(32, int8=True)
    v = d_fp.init(jax.random.PRNGKey(0), x)
    y_fp = d_fp.apply(v, x)
    y_q = d_q.apply(v, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        d_q.init(jax.random.PRNGKey(0), x)
    )
    rel = float(jnp.max(jnp.abs(y_q - y_fp)) / (jnp.max(jnp.abs(y_fp)) + 1e-9))
    assert rel < 0.05, rel
