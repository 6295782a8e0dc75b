"""Distributed training over the 8-virtual-device CPU mesh: the sharded step must be
numerically identical to the replicated one (SPMD correctness), with both DP and TP
axes exercised."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from contextual_image_compression_tpu.config import ModelConfig, QuantizerConfig, TrainConfig
from contextual_image_compression_tpu.parallel import create_mesh, sharding
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
CFG = TrainConfig(model=TINY, batch_size=8, use_perceptual=False)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(3)
    return Batch(
        image=jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1),
        mask=jnp.asarray(rng.rand(8, 32, 32, 1).astype(np.float32)),
        bpp=jnp.asarray(rng.choice([0.1, 1.0, 2.0], (8, 1)).astype(np.float32)),
    )


def test_mesh_shapes(eight_devices):
    mesh = create_mesh(model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(model_parallel=3)


def test_leaf_spec_rules(eight_devices):
    mesh = create_mesh(model_parallel=2)
    # largest divisible axis gets the model axis
    assert sharding.leaf_spec((4096, 1024), mesh, min_shard_elems=1 << 20) == P("model", None)
    assert sharding.leaf_spec((1024, 4096), mesh, min_shard_elems=1 << 20) == P(None, "model")
    assert sharding.leaf_spec((8, 8), mesh, min_shard_elems=1 << 20) == P()
    assert sharding.leaf_spec((), mesh) == P()
    # odd dims that don't divide stay replicated
    assert sharding.leaf_spec((3, 5), mesh, min_shard_elems=1) == P()


def test_sharded_step_matches_replicated(eight_devices, batch):
    builder = GANStepBuilder(CFG, bn_mode="frozen")
    state_r = builder.init_state(jax.random.PRNGKey(0), batch_size=8)
    step_d, _ = builder.jitted_steps(donate=False)

    # replicated single-logical-device result
    _, m_ref = step_d(state_r, batch)

    mesh = create_mesh(model_parallel=2)
    state_s = sharding.shard_state(
        builder.init_state(jax.random.PRNGKey(0), batch_size=8), mesh,
        min_shard_elems=1 << 12,  # low threshold so TP actually engages on the tiny model
    )
    n_sharded = sum(
        1
        for leaf in jax.tree.leaves(state_s)
        if hasattr(leaf, "sharding") and leaf.sharding.spec != P()
    )
    assert n_sharded > 0, "expected some tensors sharded over the model axis"

    batch_s = sharding.shard_batch(batch, mesh)
    assert batch_s.image.sharding.spec == P("data", None, None, None)

    _, m_sharded = step_d(state_s, batch_s)
    for k in m_ref:
        np.testing.assert_allclose(
            float(m_sharded[k]), float(m_ref[k]), atol=2e-4, err_msg=k
        )


def test_trainer_loop_on_mesh(eight_devices, tmp_path):
    """Full GANTrainer.fit loop (2 epochs) on the DP+TP virtual mesh, with
    checkpointing, then a resumed trainer that restores components AND optimizer
    state and continues for 1 more epoch (loop-level mesh coverage, not just one
    step)."""
    from contextual_image_compression_tpu.data.pipeline import CompressionDataset
    from contextual_image_compression_tpu.train.loop import GANTrainer

    rng = np.random.RandomState(11)
    images = (rng.rand(16, 32, 32, 3).astype(np.float32) * 2 - 1)
    masks = rng.rand(16, 32, 32, 1).astype(np.float32)
    cfg = TrainConfig(
        model=TINY, batch_size=8, use_perceptual=False, epochs=2,
        checkpoint_every=1,
        results_dir=str(tmp_path / "results"), model_dir=str(tmp_path / "models"),
    )
    ds = CompressionDataset(images, masks, batch_size=8)
    mesh = create_mesh(model_parallel=2)

    trainer = GANTrainer(cfg, mesh=mesh, bn_mode="frozen")
    trainer.init_state(resume=False)
    history = trainer.fit(ds, epochs=2, artifacts=False)
    assert len(history["g_loss"]) == 2
    assert all(np.isfinite(v) for v in history["g_loss"])
    assert int(trainer.state.step) == 2 * ds.steps_per_epoch

    # resume: components + optimizer state + history restored, epoch count sane
    trainer2 = GANTrainer(cfg, mesh=mesh, bn_mode="frozen")
    trainer2.init_state(resume=True)
    assert len(trainer2.history["g_loss"]) == 2
    assert int(trainer2.state.step) == int(trainer.state.step)
    # Adam moments actually restored (non-zero after 2 epochs of updates)
    mu_leaves = jax.tree.leaves(trainer2.state.g_opt)
    assert any(bool(jnp.any(leaf != 0)) for leaf in mu_leaves)
    history2 = trainer2.fit(ds, epochs=1, artifacts=False)
    assert len(history2["g_loss"]) == 3  # global epoch count, no double-add
    meta = trainer2.store.latest_metadata()
    assert meta["epoch"] == 3


def test_evaluator_on_mesh(eight_devices, batch):
    """Data-parallel evaluation: sharded evaluator matches the single-device one."""
    from contextual_image_compression_tpu.config import EvalConfig
    from contextual_image_compression_tpu.eval.harness import CodecEvaluator
    import numpy as np

    ecfg = EvalConfig(model=TINY, batch_size=8, model_dir="/nonexistent")
    ev_single = CodecEvaluator(ecfg)
    variables, _ = ev_single.load_models()
    images = np.asarray(batch.image)
    masks = np.asarray(batch.mask)
    r_single = ev_single.compress_and_reconstruct(variables, images, masks, 1.0)

    mesh = create_mesh(model_parallel=2)
    ev_mesh = CodecEvaluator(ecfg, mesh=mesh)
    variables_m, _ = ev_mesh.load_models()
    r_mesh = ev_mesh.compress_and_reconstruct(variables_m, images, masks, 1.0)
    np.testing.assert_allclose(r_mesh["psnr"], r_single["psnr"], atol=1e-3)
    np.testing.assert_allclose(r_mesh["hq_ratio"], r_single["hq_ratio"], atol=1e-5)
