#!/usr/bin/env python
"""Codec shootout: AE vs adaptive GAN vs DCT/JPEG Pallas baseline on batched TPU
inference (BASELINE.json config #5: 'Full codec shootout on batched TPU inference:
AE vs GAN vs DCT/JPEG baseline, rate-distortion bench').

Produces a rate-distortion table + plot: for each codec, (bpp, PSNR, SSIM) points:
  * DCT at a quality sweep (entropy bpp + measured range-coder bpp)
  * GAN codec at the target-bpp sweep (analytic bpp per the reference's model +
    measured latent-bitstream bpp)
  * AE at its single operating point (bottleneck entropy bpp)

With untrained GAN/AE checkpoints this measures the *pipeline*, not learned RD
quality; pass --model-dir/--ae-dir to use trained weights.
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test-dir", default="")
    p.add_argument("--synthetic", type=int, default=16)
    p.add_argument("--model-dir", default="models_ckpt")
    p.add_argument("--ae-dir", default="ae_model")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--out", default="codec_shootout.json")
    p.add_argument("--plot", default="codec_shootout.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from contextual_image_compression_tpu.config import (
        AutoencoderConfig, DCTCodecConfig, EvalConfig, ModelConfig,
    )
    from contextual_image_compression_tpu.data import images as image_io
    from contextual_image_compression_tpu.data.pipeline import prepare_masks
    from contextual_image_compression_tpu.eval.harness import CodecEvaluator
    from contextual_image_compression_tpu.ops import bitstream
    from contextual_image_compression_tpu.ops import metrics as M
    from contextual_image_compression_tpu.ops.dct import DCTCodec
    from contextual_image_compression_tpu.train.ae_trainer import AETrainer

    size = (args.img_size, args.img_size)
    if args.test_dir:
        images, names, _ = image_io.load_folder_gan(args.test_dir, size)
    else:
        images = image_io.synthetic_images(args.synthetic, size, seed=0)
    print(f"{len(images)} images at {size}")
    imgs = jnp.asarray(images)
    results = {"dct": [], "gan": [], "ae": []}

    # ------------------------------------------------------------------- DCT
    for q in (10, 20, 30, 50, 75, 90):
        codec = DCTCodec(DCTCodecConfig(quality=q))
        ev = jax.jit(codec.evaluate)(imgs)
        m = M.gan_metrics(imgs, ev["reconstruction"])
        sym = np.asarray(ev["symbols"])
        measured = float(np.mean([
            codec.measured_bpp(sym[i], size) for i in range(min(4, len(sym)))
        ]))
        results["dct"].append({
            "quality": q,
            "bpp_entropy": float(jnp.mean(ev["bpp"])),
            "bpp_measured": measured,
            "psnr": float(jnp.mean(m["psnr"])),
            "ssim": float(jnp.mean(m["ssim"])),
        })
        print("dct", results["dct"][-1])

    # ------------------------------------------------------------------- GAN
    mcfg = ModelConfig(
        img_size=size, generator_base_hw=args.img_size // 16,
    )
    ecfg = EvalConfig(model=mcfg, model_dir=args.model_dir)
    evaluator = CodecEvaluator(ecfg)
    variables, provenance = evaluator.load_models()
    trained = any(v != "init" for v in provenance.values())
    print("GAN weights:", "trained" if trained else "UNTRAINED (pipeline-only numbers)")
    masks = prepare_masks(images, ecfg.saliency)
    for bpp in (0.1, 0.5, 1.0, 2.0):
        r = evaluator.compress_and_reconstruct(variables, images, masks, bpp)
        # real latent bitstream for the first few images
        k = min(4, len(images))
        outs = evaluator.run_batch(variables, images[:k], masks[:k], bpp)
        out0 = outs[0]
        qs = np.asarray(out0.quant_strength)[:, 0]
        hq_scales = np.exp(3.0 * qs * (1 - np.asarray(out0.hq_saliency_quant)[:, 0]))
        lq_scales = np.exp(3.0 * qs * (1 - np.asarray(out0.lq_saliency_quant)[:, 0]))
        streams = bitstream.pack_codec_latents(
            np.asarray(out0.hq_latent_q)[:k], np.asarray(out0.lq_latent_q)[:k],
            hq_scales[:k], lq_scales[:k],
        )
        results["gan"].append({
            "target_bpp": bpp,
            "bpp_analytic": float(np.mean(r["actual_bpp"])),
            "bpp_measured": float(np.mean(bitstream.measured_bpp(streams, size))),
            "psnr": float(np.mean(r["psnr"])),
            "ssim": float(np.mean(r["ssim"])),
            "hq_ratio": float(np.mean(r["hq_ratio"])),
            "trained": trained,
        })
        print("gan", results["gan"][-1])

    # -------------------------------------------------------------------- AE
    acfg = AutoencoderConfig(img_size=(128, 128))
    trainer = AETrainer(acfg, log_fn=lambda *_: None)
    try:
        trainer.load(args.ae_dir)
        ae_trained = True
    except FileNotFoundError:
        trainer.init()
        ae_trained = False
    imgs01 = np.asarray(
        jax.image.resize(imgs, (len(images), 128, 128, 3), "linear") * 0.5 + 0.5
    )
    recon = trainer.reconstruct(imgs01)
    m = M.gan_metrics(jnp.asarray(imgs01) * 2 - 1, jnp.asarray(recon) * 2 - 1)
    # bottleneck entropy at 8-bit quantization as the AE's bpp accounting
    z = trainer.model.apply(trainer.params, jnp.asarray(imgs01[:4]),
                            method=trainer.model.encode)
    zq = np.clip(np.round(np.asarray(z) * 32), -32768, 32767).astype(np.int16)
    bpps = []
    for i in range(len(zq)):
        stream = DCTCodec.serialize(zq[i].ravel())
        bpps.append(8 * len(stream) / (128 * 128))
    results["ae"].append({
        "bpp_measured": float(np.mean(bpps)),
        "psnr": float(jnp.mean(m["psnr"])),
        "ssim": float(jnp.mean(m["ssim"])),
        "trained": ae_trained,
    })
    print("ae", results["ae"][-1])

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)

    # ------------------------------------------------------------------ plot
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 6))
    plt.plot([r["bpp_entropy"] for r in results["dct"]],
             [r["psnr"] for r in results["dct"]], "ko-", label="DCT/JPEG (Pallas)")
    plt.plot([r["bpp_measured"] for r in results["gan"]],
             [r["psnr"] for r in results["gan"]], "bs-",
             label=f"GAN codec ({'trained' if trained else 'untrained'})")
    plt.plot([r["bpp_measured"] for r in results["ae"]],
             [r["psnr"] for r in results["ae"]], "r^", markersize=10,
             label=f"AE ({'trained' if ae_trained else 'untrained'})")
    plt.xlabel("bpp"); plt.ylabel("PSNR (dB)")
    plt.title("Codec shootout (rate-distortion)")
    plt.grid(True, alpha=0.3); plt.legend()
    fig.savefig(args.plot, dpi=150)
    print(f"wrote {args.out} and {args.plot}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
