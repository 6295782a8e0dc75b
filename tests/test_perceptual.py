"""Perceptual (VGG19) loss path: preprocess, tap shapes, loss wiring, the
loaded-weights code path via a deterministic pseudo-weight .npz, the converter's
layout mapping, and a full GAN training step with the perceptual term live
(reference: GAN_train.py:168-195,256-287)."""

import dataclasses
import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.config import (
    ModelConfig,
    QuantizerConfig,
    TrainConfig,
)
from contextual_image_compression_tpu.models import vgg as vgg_mod
from contextual_image_compression_tpu.models.vgg import (
    _VGG19_LAYOUT,
    VGG19Features,
    load_vgg19_features,
    load_vgg19_params,
    preprocess_caffe,
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
    quantizer=QuantizerConfig(use_pallas=False),
)


def _pseudo_weights() -> dict:
    """Deterministic small-magnitude VGG19 weights in the converter's .npz layout
    (scripts/convert_vgg_weights.py output contract)."""
    rng = np.random.RandomState(0)
    out = {}
    in_ch = 3
    for bi, (width, n_convs) in enumerate(_VGG19_LAYOUT, start=1):
        for ci in range(1, n_convs + 1):
            # small std keeps 16 stacked convs numerically tame without BN
            out[f"block{bi}_conv{ci}_kernel"] = (
                rng.randn(3, 3, in_ch, width).astype(np.float32) * 0.05
            )
            out[f"block{bi}_conv{ci}_bias"] = np.zeros(width, np.float32)
            in_ch = width
    return out


@pytest.fixture(scope="module")
def vgg_npz(tmp_path_factory):
    path = tmp_path_factory.mktemp("vgg") / "vgg19_pseudo.npz"
    np.savez(str(path), **_pseudo_weights())
    return str(path)


def test_preprocess_caffe_matches_keras_semantics():
    """[-1,1] RGB -> x255 -> BGR -> subtract ImageNet BGR means
    (reference: GAN_train.py:258-263 + keras preprocess_input 'caffe' mode)."""
    img = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (2, 4, 4, 3)))
    got = np.asarray(preprocess_caffe(img))
    x = (np.asarray(img) + 1.0) * 127.5
    expected = x[..., ::-1] - np.array([103.939, 116.779, 123.68], np.float32)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_tap_shapes_match_reference():
    """Taps = block1_conv2, block2_conv2, block3_conv4, block4_conv4, block5_conv4
    (reference: GAN_train.py:177-183): channels 64/128/256/512/512 at strides
    1/2/4/8/16."""
    model = VGG19Features()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    taps = model.apply(variables, x)
    shapes = [t.shape for t in taps]
    assert shapes == [
        (1, 64, 64, 64),
        (1, 32, 32, 128),
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 512),
    ]
    # 16 conv layers in the tower
    assert len(variables["params"]) == 16


def test_perceptual_loss_formula():
    """sum_i w_i * MSE(zscore(o_i), zscore(g_i)) * 0.5 (reference: GAN_train.py:256-287)."""
    rng = np.random.RandomState(2)
    o = [jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32)) for _ in range(3)]
    g = [jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32)) for _ in range(3)]
    w = (0.2, 0.3, 0.5)
    got = float(L.perceptual_loss(o, g, w, scale=0.5))
    expected = 0.0
    for wi, oi, gi in zip(w, o, g):
        oz = (np.asarray(oi) - np.mean(np.asarray(oi))) / (np.std(np.asarray(oi)) + 1e-8)
        gz = (np.asarray(gi) - np.mean(np.asarray(gi))) / (np.std(np.asarray(gi)) + 1e-8)
        expected += wi * np.mean((oz - gz) ** 2)
    np.testing.assert_allclose(got, expected * 0.5, rtol=1e-5)
    # identical features => zero
    assert float(L.perceptual_loss(o, o, w)) == 0.0


def test_load_vgg19_weights_path(vgg_npz):
    """The loaded-weights code path end-to-end: .npz -> params dict -> forward."""
    bundle = load_vgg19_features(vgg_npz)
    assert bundle is not None
    model, variables = bundle
    taps = model.apply(variables, jnp.ones((1, 32, 32, 3)))
    assert len(taps) == 5
    for t in taps:
        assert bool(jnp.all(jnp.isfinite(t)))
    # kernels came from the file, not an initializer
    k = variables["params"]["block1_conv1"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(k), _pseudo_weights()["block1_conv1_kernel"], atol=0
    )


def test_load_vgg19_missing_or_partial(tmp_path):
    assert load_vgg19_features("") is None
    assert load_vgg19_features(str(tmp_path / "nope.npz")) is None
    # partial file (missing keys) -> None, triggering the disabled-fallback
    partial = tmp_path / "partial.npz"
    np.savez(str(partial), block1_conv1_kernel=np.zeros((3, 3, 3, 64), np.float32))
    assert load_vgg19_params(str(partial)) is None


def test_converter_torch_layout(monkeypatch, tmp_path):
    """convert_torch maps torchvision's features.{idx} OIHW tensors to the
    block{i}_conv{j} HWIO .npz contract (tiny layout to keep the test fast)."""
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "convert_vgg_weights",
        Path(__file__).resolve().parent.parent / "scripts" / "convert_vgg_weights.py",
    )
    conv_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv_mod)
    tiny_layout = ((4, 2), (8, 2))
    monkeypatch.setattr(conv_mod, "_VGG19_LAYOUT", tiny_layout)

    # torchvision indexing: conv,relu per conv; maxpool after each block
    rng = np.random.RandomState(3)
    state, idx, in_ch = {}, 0, 3
    expected = {}
    for bi, (width, n_convs) in enumerate(tiny_layout, start=1):
        for ci in range(1, n_convs + 1):
            w = rng.randn(width, in_ch, 3, 3).astype(np.float32)  # OIHW
            b = rng.randn(width).astype(np.float32)
            state[f"features.{idx}.weight"] = torch.from_numpy(w)
            state[f"features.{idx}.bias"] = torch.from_numpy(b)
            expected[f"block{bi}_conv{ci}_kernel"] = np.transpose(w, (2, 3, 1, 0))
            expected[f"block{bi}_conv{ci}_bias"] = b
            idx += 2
            in_ch = width
        idx += 1
    pth = tmp_path / "fake_vgg.pth"
    torch.save(state, str(pth))

    out = conv_mod.convert_torch(str(pth))
    assert set(out) == set(expected)
    for k in expected:
        np.testing.assert_allclose(out[k], expected[k], atol=0)


def test_gan_step_with_perceptual(vgg_npz):
    """Full fused train step with the VGG path live: perceptual loss is nonzero,
    all metrics and updated params finite, generator params move
    (reference: GAN_train.py:226-391 with use_perceptual_loss=True)."""
    cfg = TrainConfig(model=TINY, batch_size=2, use_perceptual=True,
                      vgg_weights_path=vgg_npz)
    vgg, vgg_vars = load_vgg19_features(vgg_npz)
    builder = GANStepBuilder(cfg, vgg=vgg, vgg_vars=vgg_vars, bn_mode="frozen")
    state = builder.init_state(jax.random.PRNGKey(0), batch_size=2)
    rng = np.random.RandomState(4)
    batch = Batch(
        image=jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        mask=jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32)),
        bpp=jnp.asarray(np.full((2, 1), 1.0, np.float32)),
    )
    step_d, _ = builder.jitted_steps(donate=False)
    s1, metrics = step_d(state, batch)
    assert float(metrics["perceptual_loss"]) > 0.0
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    for leaf in jax.tree.leaves(s1.codec_vars):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    before = jax.tree.leaves(state.codec_vars["hq_generator"]["params"])
    after = jax.tree.leaves(s1.codec_vars["hq_generator"]["params"])
    assert any(bool(jnp.any(a != b)) for a, b in zip(before, after))


def test_trainer_loads_vgg_from_config(vgg_npz, tmp_path):
    """GANTrainer wires the perceptual model from TrainConfig.vgg_weights_path
    (the reference's load-or-disable contract, GAN_train.py:168-195)."""
    from contextual_image_compression_tpu.train.loop import GANTrainer

    cfg = TrainConfig(
        model=TINY, batch_size=2, use_perceptual=True, vgg_weights_path=vgg_npz,
        results_dir=str(tmp_path / "results"), model_dir=str(tmp_path / "models"),
    )
    logs = []
    trainer = GANTrainer(cfg, bn_mode="frozen", log_fn=logs.append)
    assert trainer.builder.vgg is not None
    assert any("VGG19 weights loaded" in m for m in logs)
    # and the no-weights fallback still disables it
    cfg_off = dataclasses.replace(cfg, vgg_weights_path=str(tmp_path / "missing.npz"))
    logs2 = []
    trainer2 = GANTrainer(cfg_off, bn_mode="frozen", log_fn=logs2.append)
    assert trainer2.builder.vgg is None
    assert any("perceptual loss disabled" in m for m in logs2)


def test_load_vgg19_random_seeded():
    """'random:<seed>' gives a deterministic randomly-initialized VGG19 -- the
    no-egress substitute that lets training log a nonzero perceptual loss."""
    m1, v1 = load_vgg19_features("random:7")
    m2, v2 = load_vgg19_features("random:7")
    k1 = v1["params"]["block1_conv1"]["kernel"]
    k2 = v2["params"]["block1_conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    _, v3 = load_vgg19_features("random:8")
    assert not np.array_equal(
        np.asarray(k1), np.asarray(v3["params"]["block1_conv1"]["kernel"])
    )
    taps = m1.apply(v1, jnp.ones((1, 32, 32, 3)))
    assert len(taps) == 5 and all(bool(jnp.all(jnp.isfinite(t))) for t in taps)
    # nonzero perceptual loss on distinct inputs
    taps2 = m1.apply(v1, jnp.zeros((1, 32, 32, 3)))
    val = L.perceptual_loss(taps, taps2, [0.1, 0.1, 0.2, 0.3, 0.3])
    assert float(val) > 0.0


# ------------------------------------------------------------- fingerprinting
def test_fingerprint_roundtrip_and_corruption_detection(tmp_path):
    """The converter stores a tap-activation fingerprint inside the npz;
    load_vgg19_features re-verifies it (models/vgg.py) -- a corrupted kernel
    must be refused at load, a faithful file must load."""
    weights = _pseudo_weights()
    params = {
        name[: -len("_kernel")]: {
            "kernel": jnp.asarray(weights[name]),
            "bias": jnp.asarray(weights[name[: -len("_kernel")] + "_bias"]),
        }
        for name in weights
        if name.endswith("_kernel")
    }
    fp = vgg_mod.compute_tap_fingerprint(VGG19Features(), {"params": params})
    assert fp.shape == (5, 2) and np.all(np.isfinite(fp))

    good = tmp_path / "good.npz"
    np.savez(str(good), **weights, **{vgg_mod._FINGERPRINT_KEY: fp})
    bundle = load_vgg19_features(str(good))
    assert bundle is not None  # fingerprint verified at load

    # corrupt ONE kernel with a transpose (shape-preserving on 3x3xCxC blocks
    # only when C_in == C_out, so scale instead: wrong magnitude, same shape)
    bad_weights = dict(weights)
    bad_weights["block3_conv2_kernel"] = weights["block3_conv2_kernel"] * 3.0
    bad = tmp_path / "bad.npz"
    np.savez(str(bad), **bad_weights, **{vgg_mod._FINGERPRINT_KEY: fp})
    with pytest.raises(ValueError, match="fingerprint"):
        load_vgg19_features(str(bad))

    # a legacy npz with NO fingerprint still loads (backward compatible)
    legacy = tmp_path / "legacy.npz"
    np.savez(str(legacy), **weights)
    assert load_vgg19_features(str(legacy)) is not None


def test_fingerprint_determinism():
    """Same weights => identical fingerprint across calls (fixed batch)."""
    model = VGG19Features()
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))
    f1 = vgg_mod.compute_tap_fingerprint(model, variables)
    f2 = vgg_mod.compute_tap_fingerprint(model, variables)
    np.testing.assert_array_equal(f1, f2)
    vgg_mod.verify_tap_fingerprint(model, variables, f1)  # must not raise


def test_real_imagenet_vgg_weights_if_present():
    """When a converted ImageNet weights file exists (CIC_VGG19_NPZ env var or
    ./vgg19_imagenet.npz), its stored fingerprint must verify and the loader
    must accept it. Skipped in the no-egress container."""
    import os

    path = os.environ.get("CIC_VGG19_NPZ", "vgg19_imagenet.npz")
    if not os.path.exists(path):
        pytest.skip("no ImageNet VGG19 weights file in this environment")
    bundle = load_vgg19_features(path)
    assert bundle is not None
    data = np.load(path)
    assert vgg_mod._FINGERPRINT_KEY in data, (
        "real weights file lacks a fingerprint -- re-run "
        "scripts/convert_vgg_weights.py to produce a verified file"
    )
