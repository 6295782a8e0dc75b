"""MXU-packed generator tail (models/packed_tail.py).

The packed lowering must be numerically identical (up to float reassociation)
to the native deconv4 -> BN -> LeakyReLU -> out_conv -> tanh pixel-space path
(reference semantics: GAN_functions.py:266-273), with the SAME parameter tree,
so a trained checkpoint can be served through the packed path unchanged.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.models.generator import Generator
from contextual_image_compression_tpu.models.packed_tail import (
    boundary_masks,
    deconv4x4s2_planar,
    depth_to_space4,
    packed_conv4x4s2_s2d,
    packed_conv4x4s2_strided,
    packed_tail_forward,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_deconv_planar_matches_convtranspose(rng):
    x = _rand(rng, 2, 8, 8, 16)
    k = _rand(rng, 4, 4, 16, 12) * 0.2
    yall = deconv4x4s2_planar(x, k)
    assert yall.shape == (2, 9, 9, 48)
    # interleave the phases and compare against flax's ConvTranspose
    z = np.zeros((2, 16, 16, 12), np.float32)
    yn = np.asarray(yall)
    for a in (0, 1):
        for b in (0, 1):
            slab = (a * 2 + b) * 12
            z[:, a::2, b::2, :] = yn[:, a : 8 + a, b : 8 + b, slab : slab + 12]
    ref = nn.ConvTranspose(12, (4, 4), strides=(2, 2), padding="SAME", use_bias=False)
    y_ref = ref.apply({"params": {"kernel": k}}, x)
    np.testing.assert_allclose(z, np.asarray(y_ref), atol=1e-4)


def test_packed_out_conv_matches_conv(rng):
    """masked planar -> strided packed 4x4 conv -> d2s must equal the
    pixel-space SAME conv of the interleaved deconv output."""
    cin, cout = 8, 3
    x = _rand(rng, 2, 8, 8, 16)
    k4 = _rand(rng, 4, 4, 16, cin) * 0.2
    ko = _rand(rng, 4, 4, cin, cout) * 0.2
    bo = _rand(rng, cout)

    yall = deconv4x4s2_planar(x, k4)
    row_m, col_m = boundary_masks(8, cin)
    yall = yall * jnp.asarray(row_m)[None, :, None, :]
    yall = yall * jnp.asarray(col_m)[None, None, :, :]
    y_packed = depth_to_space4(packed_conv4x4s2_strided(yall, ko, bo), cout)

    # reference: interleave to pixels, then a plain SAME conv
    z = np.zeros((2, 16, 16, cin), np.float32)
    yn = np.asarray(yall)
    for a in (0, 1):
        for b in (0, 1):
            slab = (a * 2 + b) * cin
            z[:, a::2, b::2, :] = yn[:, a : 8 + a, b : 8 + b, slab : slab + cin]
    conv = nn.Conv(cout, (4, 4), strides=(1, 1), padding="SAME")
    y_ref = conv.apply({"params": {"kernel": ko, "bias": bo}}, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_ref), atol=1e-4)


def test_packed_out_conv_s2d_matches_strided(rng):
    """The space-to-depth formulation of the packed out-conv is the same
    function as the stride-2 read (both lower packed_conv4x4s2; see
    s2d_wstr's tap-mapping derivation)."""
    cin, cout = 8, 3
    x = _rand(rng, 2, 8, 8, 16)
    k4 = _rand(rng, 4, 4, 16, cin) * 0.2
    ko = _rand(rng, 4, 4, cin, cout) * 0.2
    bo = _rand(rng, cout)
    yall = deconv4x4s2_planar(x, k4)
    row_m, col_m = boundary_masks(8, cin)
    yall = yall * jnp.asarray(row_m)[None, :, None, :]
    yall = yall * jnp.asarray(col_m)[None, None, :, :]
    y_strided = packed_conv4x4s2_strided(yall, ko, bo)
    y_s2d = packed_conv4x4s2_s2d(yall, ko, bo)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_strided), atol=1e-4
    )


def test_packed_tail_full_pipeline(rng):
    cmid, cout = 8, 3
    x = _rand(rng, 2, 8, 8, 16)
    k4 = _rand(rng, 4, 4, 16, cmid) * 0.2
    b4 = _rand(rng, cmid) * 0.1
    ko = _rand(rng, 4, 4, cmid, cout) * 0.2
    bo = _rand(rng, cout) * 0.1
    scale = jnp.abs(_rand(rng, cmid)) + 0.5
    bias = _rand(rng, cmid) * 0.1
    mean = _rand(rng, cmid) * 0.1
    var = jnp.abs(_rand(rng, cmid)) + 0.5

    got = packed_tail_forward(x, k4, b4, scale, bias, mean, var, ko, bo)

    dc = nn.ConvTranspose(cmid, (4, 4), strides=(2, 2), padding="SAME")
    z = dc.apply({"params": {"kernel": k4, "bias": b4}}, x)
    z = scale * (z - mean) * jax.lax.rsqrt(var + 1e-3) + bias
    z = nn.leaky_relu(z, negative_slope=0.2)
    conv = nn.Conv(cout, (4, 4), strides=(1, 1), padding="SAME")
    want = jnp.tanh(conv.apply({"params": {"kernel": ko, "bias": bo}}, z))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_tail_pallas_matches_xla_path(rng):
    """The single-kernel Pallas tail (interpret mode off-TPU) must equal the
    two-conv XLA formulation and the native pixel path."""
    cmid, cout = 8, 3
    x = _rand(rng, 2, 8, 8, 16)
    k4 = _rand(rng, 4, 4, 16, cmid) * 0.2
    b4 = _rand(rng, cmid) * 0.1
    ko = _rand(rng, 4, 4, cmid, cout) * 0.2
    bo = _rand(rng, cout) * 0.1
    scale = jnp.abs(_rand(rng, cmid)) + 0.5
    bias = _rand(rng, cmid) * 0.1
    mean = _rand(rng, cmid) * 0.1
    var = jnp.abs(_rand(rng, cmid)) + 0.5

    got = packed_tail_forward(
        x, k4, b4, scale, bias, mean, var, ko, bo, use_pallas=True
    )
    want = packed_tail_forward(
        x, k4, b4, scale, bias, mean, var, ko, bo, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_tail_pallas_real_scale(rng):
    """Real channel sizes (Cin=128, Cmid=32, 256^2 output) through the Pallas
    kernel in interpret mode."""
    x = _rand(rng, 1, 128, 128, 128) * 0.3
    k4 = _rand(rng, 4, 4, 128, 32) * 0.05
    b4 = _rand(rng, 32) * 0.1
    ko = _rand(rng, 4, 4, 32, 3) * 0.05
    bo = _rand(rng, 3) * 0.1
    ones = jnp.ones((32,))
    zeros = jnp.zeros((32,))
    got = packed_tail_forward(
        x, k4, b4, ones, zeros, zeros, ones, ko, bo, use_pallas=True
    )
    want = packed_tail_forward(
        x, k4, b4, ones, zeros, zeros, ones, ko, bo, use_pallas=False
    )
    assert got.shape == (1, 256, 256, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_packed_tail_int8_planar_within_quantization_bound(rng):
    """int8_planar stores the phase-planar intermediate as int8 with
    per-channel scales amax = max(|bn_bias|, |shift|) + 8|bn_scale| (the
    folded-BN 8-sigma envelope centered on the BN output mean). The output
    must stay within the analytic quantization bound: per output channel,
    |err_pre_tanh| <= sum_taps |w_str| * step/2 with step = amax/127 per
    input channel, and tanh is 1-Lipschitz. BN stats are calibrated on the
    data itself so the envelope actually describes yall."""
    cmid, cout = 8, 3
    x = _rand(rng, 4, 8, 8, 16) * 0.5
    k4 = _rand(rng, 4, 4, 16, cmid) * 0.1
    b4 = _rand(rng, cmid) * 0.1
    ko = _rand(rng, 4, 4, cmid, cout) * 0.1
    bo = _rand(rng, cout) * 0.1
    scale = jnp.abs(_rand(rng, cmid)) * 0.3 + 0.2
    bias = _rand(rng, cmid) * 0.2
    # calibrate mean/var from the actual deconv output so post-BN channels
    # really are ~N(bias, scale^2) and the 8-sigma envelope holds
    dc = nn.ConvTranspose(cmid, (4, 4), strides=(2, 2), padding="SAME")
    z = dc.apply({"params": {"kernel": k4, "bias": b4}}, x)
    mean = jnp.mean(z, axis=(0, 1, 2))
    var = jnp.var(z, axis=(0, 1, 2))

    want = packed_tail_forward(x, k4, b4, scale, bias, mean, var, ko, bo)
    got = packed_tail_forward(
        x, k4, b4, scale, bias, mean, var, ko, bo, int8_planar=True
    )
    assert got.shape == want.shape
    # analytic bound: shift is the folded bias term; post-BN+fold the channel
    # mean is bias and std is |scale| (by calibration), so amax matches the
    # implementation's envelope
    inv = 1.0 / np.sqrt(np.asarray(var, np.float64) + 1e-3)
    shift = np.asarray(bias, np.float64) + (
        np.asarray(b4, np.float64) - np.asarray(mean, np.float64)
    ) * np.asarray(scale, np.float64) * inv
    amax = np.maximum(
        np.maximum(np.abs(np.asarray(bias, np.float64)), np.abs(shift))
        + 8.0 * np.abs(np.asarray(scale)),
        1e-6,
    )
    step = amax / 127.0  # per mid-channel
    ko_abs = np.abs(np.asarray(ko, np.float64))  # (4,4,cmid,cout)
    bound = (ko_abs * step[None, None, :, None] * 0.5).sum(axis=(0, 1, 2)).max()
    err = np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64)).max()
    assert err <= bound * 1.05 + 1e-6, (err, bound)
    # no sample should have hit the clip rails (the envelope must cover the
    # calibrated data)
    assert err < 0.5


def test_packed_tail_int8_envelope_centers_on_bn_bias(rng):
    """Regression for the mis-centered envelope (advisor round-4 medium
    finding): when the deconv's kernel-part running mean opposes bn_bias,
    shift = bn_bias + (deconv_bias - bn_mean)*scale can be ~0 while the
    data's post-fold mean is bn_bias -- the old amax = |shift| + 8|bn_scale|
    then rails whole channels at +-127 (error O(bn_bias)); the fixed
    envelope max(|bn_bias|, |shift|) + 8|bn_scale| covers them.
    Construction: constant positive input and kernel -> interior deconv
    output M = 16 per channel; bn_mean = M (stats describe the data),
    bn_bias = M*gamma*inv => shift == 0 exactly while the data sits at
    bn_bias = 0.8, double the old envelope 8*gamma = 0.4."""
    cmid, cout = 8, 3
    gamma = 0.05
    x = jnp.ones((2, 8, 8, 16)) + _rand(rng, 2, 8, 8, 16) * 0.01
    k4 = jnp.full((4, 4, 16, cmid), 0.25)  # interior: 2x2 taps x 16ch x 0.25 = 16
    b4 = jnp.zeros((cmid,))
    ko = _rand(rng, 4, 4, cmid, cout) * 0.1
    bo = _rand(rng, cout) * 0.1
    scale = jnp.full((cmid,), gamma)
    mean = jnp.full((cmid,), 16.0)  # the interior deconv output (true center)
    var = jnp.ones((cmid,))
    inv = jax.lax.rsqrt(var + 1e-3)
    bias = mean * scale * inv  # => shift = bias - mean*scale*inv = 0
    shift = bias + (b4 - mean) * scale * inv
    np.testing.assert_allclose(np.asarray(shift), 0.0, atol=1e-5)
    # the post-fold data really is centered at bn_bias (~0.8), far outside
    # the old shift-centered envelope |shift| + 8|gamma| = 0.4
    old_amax = np.abs(np.asarray(shift)) + 8.0 * np.abs(np.asarray(scale))
    assert (np.abs(np.asarray(bias)) > 1.5 * old_amax).all(), (
        "construction failed to exceed the old envelope"
    )

    want = packed_tail_forward(x, k4, b4, scale, bias, mean, var, ko, bo)
    got = packed_tail_forward(
        x, k4, b4, scale, bias, mean, var, ko, bo, int8_planar=True
    )
    amax = np.maximum(
        np.maximum(np.abs(np.asarray(bias, np.float64)),
                   np.abs(np.asarray(shift, np.float64)))
        + 8.0 * np.abs(np.asarray(scale)),
        1e-6,
    )
    step = amax / 127.0
    ko_abs = np.abs(np.asarray(ko, np.float64))
    bound = (ko_abs * step[None, None, :, None] * 0.5).sum(axis=(0, 1, 2)).max()
    err = np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64)).max()
    assert err <= bound * 1.05 + 1e-6, (err, bound)


def test_generator_packed_tail_int8_close_to_native(rng):
    """Generator(packed_tail=True, packed_tail_int8=True) at inference: same
    param tree as native, output within the ANALYTIC int8-planar quantization
    bound of the exact path (serving lowering; training never sees it).

    BN running stats are calibrated from a forward pass first (EMA-solve of
    one train-mode step: new = 0.99*old + 0.01*batch), so the folded-BN
    envelope describes the data it quantizes and the bound is tight -- the
    earlier fresh-stats version of this test could only assert a loose 0.1
    (advisor round-4 low finding)."""
    lat = _rand(rng, 2, 64)
    skips = (
        _rand(rng, 2, 16, 16, 8),
        _rand(rng, 2, 8, 8, 16),
        _rand(rng, 2, 4, 4, 24),
    )
    g_int8 = Generator(
        channels=(24, 16, 8, 8), base_hw=2, base_ch=32,
        packed_tail=True, packed_tail_int8=True,
    )
    g_ref = Generator(channels=(24, 16, 8, 8), base_hw=2, base_ch=32)
    v = g_ref.init(jax.random.PRNGKey(0), lat, skips, train=False)
    # calibrate ALL BN running stats to this batch's statistics: with every
    # layer's running stats equal to its batch stats, the inference pass
    # reproduces the train-mode intermediates exactly, so bn4's stats
    # describe the tensor the int8 envelope quantizes
    _, mut = g_ref.apply(v, lat, skips, train=True, mutable=["batch_stats"])
    cal = jax.tree.map(
        lambda o, n: 100.0 * (n - 0.99 * o),
        v["batch_stats"], mut["batch_stats"],
    )
    v = {**v, "batch_stats": cal}
    y_ref = g_ref.apply(v, lat, skips, train=False)
    y_int8 = g_int8.apply(v, lat, skips, train=False)
    assert y_int8.shape == y_ref.shape
    # analytic bound from the calibrated envelope (tanh is 1-Lipschitz)
    p = v["params"]
    b4 = np.asarray(p["deconv4"]["ConvTranspose_0"]["bias"], np.float64)
    bn = p["bn4"]["BatchNorm_0"]
    mean = np.asarray(cal["bn4"]["BatchNorm_0"]["mean"], np.float64)
    var = np.asarray(cal["bn4"]["BatchNorm_0"]["var"], np.float64)
    scale = np.asarray(bn["scale"], np.float64)
    bias = np.asarray(bn["bias"], np.float64)
    inv = 1.0 / np.sqrt(var + 1e-3)
    shift = bias + (b4 - mean) * scale * inv
    amax = np.maximum(
        np.maximum(np.abs(bias), np.abs(shift)) + 8.0 * np.abs(scale),
        1e-6,
    )
    step = amax / 127.0
    ko_abs = np.abs(np.asarray(p["out_conv"]["Conv_0"]["kernel"], np.float64))
    bound = (ko_abs * step[None, None, :, None] * 0.5).sum(axis=(0, 1, 2)).max()
    err = np.abs(np.asarray(y_int8) - np.asarray(y_ref)).max()
    assert err <= bound * 1.05 + 1e-5, (err, bound)
    assert err < 0.1, err  # sanity: nothing railed
    # init through the int8 path must create the identical tree
    v2 = g_int8.init(jax.random.PRNGKey(0), lat, skips, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)


def test_generator_packed_tail_equivalence(rng):
    """Generator(packed_tail=True) at inference == native path, same param tree
    (checkpoint-interchangeable)."""
    lat = _rand(rng, 2, 64)
    skips = (
        _rand(rng, 2, 16, 16, 8),
        _rand(rng, 2, 8, 8, 16),
        _rand(rng, 2, 4, 4, 24),
    )
    g_packed = Generator(channels=(24, 16, 8, 8), base_hw=2, base_ch=32, packed_tail=True)
    g_ref = Generator(channels=(24, 16, 8, 8), base_hw=2, base_ch=32)
    v = g_ref.init(jax.random.PRNGKey(0), lat, skips, train=False)
    y_ref = g_ref.apply(v, lat, skips, train=False)
    y_packed = g_packed.apply(v, lat, skips, train=False)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_ref), atol=1e-5)
    # init through the packed path must create the identical tree
    v2 = g_packed.init(jax.random.PRNGKey(0), lat, skips, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2))
    )


def test_generator_packed_tail_train_mode_falls_back(rng):
    """train=True must use the native path (BN batch stats) and mutate stats."""
    lat = _rand(rng, 2, 64)
    skips = (
        _rand(rng, 2, 16, 16, 8),
        _rand(rng, 2, 8, 8, 16),
        _rand(rng, 2, 4, 4, 24),
    )
    g = Generator(channels=(24, 16, 8, 8), base_hw=2, base_ch=32, packed_tail=True)
    v = g.init(jax.random.PRNGKey(0), lat, skips, train=False)
    y, mut = g.apply(v, lat, skips, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 32, 32, 3)
    assert "bn4" in mut["batch_stats"]


def test_generator_packed_tail_nonsquare_batch(rng):
    """Full 256-scale shape smoke (single example, real channel sizes)."""
    lat = _rand(rng, 1, 128)
    skips = (
        _rand(rng, 1, 128, 128, 64),
        _rand(rng, 1, 64, 64, 128),
        _rand(rng, 1, 32, 32, 256),
    )
    g_packed = Generator(packed_tail=True)
    g_ref = Generator()
    v = g_ref.init(jax.random.PRNGKey(1), lat, skips, train=False)
    y_ref = g_ref.apply(v, lat, skips, train=False)
    y_packed = g_packed.apply(v, lat, skips, train=False)
    assert y_packed.shape == (1, 256, 256, 3)
    np.testing.assert_allclose(
        np.asarray(y_packed), np.asarray(y_ref), atol=3e-5
    )
