"""End-to-end integration on tiny configs: GANTrainer epoch loop with artifacts +
checkpoints + resume, the CodecEvaluator sweep, and the AE trainer/eval
(reference flows: GAN_train.py:410-693, GAN_test.py:342-693, train/test_autoencoder.py)."""

import dataclasses
import glob
import os

import jax
import numpy as np
import pytest

from contextual_image_compression_tpu.config import (
    AutoencoderConfig,
    EvalConfig,
    ModelConfig,
    QuantizerConfig,
    SaliencyConfig,
    TrainConfig,
)
from contextual_image_compression_tpu.data import images as image_io
from contextual_image_compression_tpu.data.pipeline import (
    CompressionDataset,
    prepare_masks,
)
from contextual_image_compression_tpu.eval.harness import CodecEvaluator

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


@pytest.fixture(scope="module")
def tiny_data():
    imgs = image_io.synthetic_images(8, (32, 32), seed=0)
    masks = prepare_masks(imgs, SaliencyConfig())
    return imgs, masks


def test_gan_trainer_epoch_with_artifacts_and_resume(tmp_path, tiny_data):
    from contextual_image_compression_tpu.train.loop import GANTrainer

    imgs, masks = tiny_data
    cfg = TrainConfig(
        model=TINY, batch_size=4, epochs=1, use_perceptual=False,
        results_dir=str(tmp_path / "results"), model_dir=str(tmp_path / "ckpt"),
        checkpoint_every=1, sample_visualizations=2,
    )
    ds = CompressionDataset(imgs, masks, batch_size=4, seed=0)
    trainer = GANTrainer(cfg, log_fn=lambda *_: None)
    trainer.init_state(resume=False)
    hist = trainer.fit(ds, epochs=1)
    assert len(hist["g_loss"]) == 1 and np.isfinite(hist["g_loss"][0])
    # artifact contract
    assert os.path.exists(tmp_path / "results" / "loss_history_epoch_1.png")
    assert os.path.exists(tmp_path / "results" / "final_loss_history.png")
    assert os.path.exists(tmp_path / "results" / "rate_control_test.png")
    assert len(glob.glob(str(tmp_path / "results" / "training_samples" / "*.png"))) == 2
    # 8 components + discriminator + optimizers, final tag
    assert len(glob.glob(str(tmp_path / "ckpt" / "*_final.msgpack"))) == 9

    # resume restores and advances epoch counter
    trainer2 = GANTrainer(cfg, log_fn=lambda *_: None)
    trainer2.init_state(resume=True)
    assert trainer2.start_epoch == 1

    # probe is monotone in bpp
    probe = trainer.rate_control_probe(ds.first_samples(1))
    ratios = [r[1] for r in probe]
    assert ratios[0] <= ratios[1] <= ratios[2]


def test_codec_evaluator_sweep(tmp_path, tiny_data):
    imgs, masks = tiny_data
    cfg = EvalConfig(
        model=TINY, results_dir=str(tmp_path / "eval"),
        model_dir=str(tmp_path / "nockpt"), bpp_values=(0.1, 2.0),
        rate_control_bpps=3, rate_control_max_images=2, batch_size=4,
    )
    ev = CodecEvaluator(cfg)
    variables, provenance = ev.load_models()
    assert all(p == "init" for p in provenance.values())  # nothing saved yet
    names = [f"img_{i}.png" for i in range(len(imgs))]
    os.makedirs(cfg.results_dir, exist_ok=True)
    results = ev.test_compression(variables, imgs, masks, names)
    assert set(results["avg_metrics"]) == {0.1, 2.0}
    # analytic model range for this config: [D*32/HW, 2D*32/HW]
    hw = TINY.img_size[0] * TINY.img_size[1]
    lo = TINY.base_latent_dim * 32 / hw
    hi = 2 * TINY.base_latent_dim * 32 / hw
    for bpp, m in results["avg_metrics"].items():
        assert np.isfinite(m["psnr"]) and 0 <= m["hq_ratio"] <= 1
        assert lo - 1e-6 <= m["actual_bpp"] <= hi + 1e-6
    # hq ratio increases with target bpp (rate control contract)
    assert results["avg_metrics"][2.0]["hq_ratio"] > results["avg_metrics"][0.1]["hq_ratio"]
    assert os.path.exists(tmp_path / "eval" / "bpp_0.1" / "metrics.txt")
    assert len(glob.glob(str(tmp_path / "eval" / "bpp_2.0" / "compressed" / "*.png"))) == 8

    rc = ev.test_rate_control(variables, imgs, masks, names)
    assert len(rc["target_bpp"]) == 3 * 2  # 3 bpps x 2 images
    assert os.path.exists(tmp_path / "eval" / "rate_control_test" / "hq_ratio_by_bpp.png")

    from contextual_image_compression_tpu.eval import plots

    plots.plot_rate_distortion_curve(results["avg_metrics"], cfg.results_dir)
    assert os.path.exists(tmp_path / "eval" / "rate_distortion_curves.png")
    assert os.path.exists(tmp_path / "eval" / "rate_distortion_data.csv")


def test_ae_train_and_eval(tmp_path):
    from contextual_image_compression_tpu.eval.ae_eval import evaluate_autoencoder
    from contextual_image_compression_tpu.train.ae_trainer import AETrainer

    imgs = (image_io.synthetic_images(12, (32, 32), seed=1) + 1) / 2
    cfg = AutoencoderConfig(img_size=(32, 32), epochs=2, batch_size=4)
    trainer = AETrainer(cfg, log_fn=lambda *_: None)
    trainer.init()
    hist = trainer.fit(imgs)
    assert len(hist["loss"]) == 2
    assert hist["loss"][1] < hist["loss"][0]  # learning

    trainer.save(str(tmp_path / "ae"))
    trainer2 = AETrainer(cfg, log_fn=lambda *_: None)
    trainer2.load(str(tmp_path / "ae"))
    r1 = trainer.reconstruct(imgs[:2])
    r2 = trainer2.reconstruct(imgs[:2])
    np.testing.assert_allclose(r1, r2, atol=1e-6)

    # eval flow with real files for the size-reduction metric
    paths = []
    for i in range(3):
        p = str(tmp_path / f"t{i}.jpg")
        image_io.save_image_unit(imgs[i], p)
        paths.append(p)
    results = evaluate_autoencoder(
        trainer, imgs[:3], paths, output_dir=str(tmp_path / "out")
    )
    assert np.isfinite(results["psnr"]) and np.isfinite(results["size_reduction"])
    assert len(glob.glob(str(tmp_path / "out" / "*.jpg"))) == 3
