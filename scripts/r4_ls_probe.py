#!/usr/bin/env python
"""Round-4 latent-saliency convergence probe (round-3 verdict item 4).

Question: the reference's committed artifact shows the RAW latent-saliency
loss (GAN_train.py:391,481 records it unweighted) sitting at ~0.56 after a
jump from ~0.1 at epoch 13 (BASELINE.md); every convergence run of this
framework equilibrates at ~0.007-0.022. Explain the ~26-80x gap.

The loss (GAN_train.py:296-309, with the (B,1)-(B,) -> (B,B) TF broadcast)
has two analytically distinct fixed points:

  * healthy fit: each score matches the BATCH-MEAN mask mean, leaving
        floor = 2 * E[Var_batch(mask_means)]
    (the quirk compares every score against every sample's mask mean, so the
    per-batch variance of mask means is irreducible);
  * score collapse: if the LS MLPs' sigmoids saturate (e.g. the unnormalized
    latent inputs drift until the pre-sigmoid logits pin), scores freeze at a
    constant c and the loss locks at E[(c-m)^2] + E[(c-(1-m))^2] -- for c=0
    that is E[m^2] + E[(1-m)^2], which for mask means around 0.4-0.55 lands
    at ~0.5-0.6, exactly the artifact's post-jump plateau. A jump-and-stick
    trajectory is the signature of this mode: once saturated, sigmoid
    gradients vanish and the nets cannot recover.

This probe trains the FULL faithful pole (frozen BN everywhere, zero-gradient
reference quantizer, broadcast quirk, no perceptual -- the reference's own
fallback) and logs, per epoch: the raw quirk LS loss, both analytic fixed
points measured on the same batches, the LS score statistics (mean/std/
min/max), the pre-sigmoid logit magnitude, and the latent RMS -- enough to
say WHICH fixed point this framework converges to and whether the latent
drift that plausibly saturated the reference's nets occurs here at all.

Usage:
  python scripts/r4_ls_probe.py --synthetic 2048 --epochs 15 \
      --out runs/r4_ls_probe/probe.json
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--synthetic", type=int, default=2048)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=None, help="smoke-test override")
    p.add_argument("--base-latent-dim", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="runs/r4_ls_probe/probe.json")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from contextual_image_compression_tpu.config import (
        LossConfig, ModelConfig, QuantizerConfig, TrainConfig,
    )
    from contextual_image_compression_tpu.data.images import rich_synthetic_images
    from contextual_image_compression_tpu.data.pipeline import (
        CompressionDataset, prepare_masks,
    )
    from contextual_image_compression_tpu.train.gan_trainer import GANStepBuilder

    mcfg = ModelConfig()
    if args.img_size:
        mcfg = dataclasses.replace(
            mcfg, img_size=(args.img_size, args.img_size),
            generator_base_hw=args.img_size // 16,
        )
    if args.base_latent_dim:
        mcfg = dataclasses.replace(mcfg, base_latent_dim=args.base_latent_dim)
    mcfg = dataclasses.replace(
        mcfg, quantizer=QuantizerConfig(grad_mode="reference")
    )
    cfg = TrainConfig(
        model=mcfg,
        seed=args.seed,
        batch_size=args.batch_size,
        use_perceptual=False,
        loss=LossConfig(reference_broadcast_quirk=True),
    )

    images = rich_synthetic_images(args.synthetic, mcfg.img_size, args.seed)
    print(f"{len(images)} rich synthetic images")
    masks = prepare_masks(images, cfg.saliency)
    masks_np = np.asarray(masks)

    # Corpus-level mask statistics: both fixed points, computed once.
    m = masks_np.mean(axis=(1, 2, 3))  # (N,) per-image mask means
    n_b = (len(m) // args.batch_size) * args.batch_size
    batch_vars = m[:n_b].reshape(-1, args.batch_size).var(axis=1)
    floor_healthy = 2.0 * float(batch_vars.mean())
    collapse_c0 = float(np.mean(m**2) + np.mean((1.0 - m) ** 2))
    cs = np.linspace(0.0, 1.0, 101)
    collapse_curve = [
        float(np.mean((c - m) ** 2) + np.mean((c - (1.0 - m)) ** 2)) for c in cs
    ]
    print(f"mask means: mean {m.mean():.4f} std {m.std():.4f}")
    print(f"healthy-fit floor  2*E[Var_batch(m)] = {floor_healthy:.5f}")
    print(f"collapse fixed point at c=0: E[m^2]+E[(1-m)^2] = {collapse_c0:.4f}")
    print(f"collapse fixed point, worst c: {max(collapse_curve):.4f} (c={cs[int(np.argmax(collapse_curve))]:.2f}); "
          f"best constant c: {min(collapse_curve):.4f} (c={cs[int(np.argmin(collapse_curve))]:.2f})")

    ds = CompressionDataset(
        images=np.asarray(images), masks=masks_np, batch_size=args.batch_size,
        seed=args.seed, device_resident=jax.default_backend() == "tpu",
    )
    builder = GANStepBuilder(cfg, bn_mode="frozen", disc_bn_mode="frozen")
    state = builder.init_state(jax.random.PRNGKey(args.seed), batch_size=args.batch_size)
    step_with_d, step_no_d = builder.jitted_steps(donate=True)

    probe_batch = next(ds.epoch(shuffle=False))

    @jax.jit
    def diagnose(codec_vars, batch):
        out, _ = builder.codec.apply(
            codec_vars, batch.image, batch.mask, batch.bpp, train=False
        )
        s_hq = out.hq_saliency_loss[:, 0].astype(jnp.float32)
        s_lq = out.lq_saliency_loss[:, 0].astype(jnp.float32)
        eps = 1e-7
        logit_hq = jnp.log(jnp.clip(s_hq, eps, 1 - eps) / (1 - jnp.clip(s_hq, eps, 1 - eps)))
        return {
            "hq_score": (jnp.mean(s_hq), jnp.std(s_hq), jnp.min(s_hq), jnp.max(s_hq)),
            "lq_score": (jnp.mean(s_lq), jnp.std(s_lq), jnp.min(s_lq), jnp.max(s_lq)),
            "hq_logit_absmean": jnp.mean(jnp.abs(logit_hq)),
            "hq_latent_rms": jnp.sqrt(jnp.mean(out.hq_latent.astype(jnp.float32) ** 2)),
            "lq_latent_rms": jnp.sqrt(jnp.mean(out.lq_latent.astype(jnp.float32) ** 2)),
        }

    hist = []
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        ls_vals = []
        for i, batch in enumerate(ds.epoch()):
            state, metrics = (step_with_d if i % 2 == 0 else step_no_d)(state, batch)
            ls_vals.append(metrics["latent_saliency_loss"])
        ls_epoch = float(np.mean([float(v) for v in ls_vals]))
        d = jax.device_get(diagnose(state.codec_vars, probe_batch))
        row = {
            "epoch": epoch,
            "ls_raw_quirk": ls_epoch,
            "hq_score_mean": float(d["hq_score"][0]),
            "hq_score_std": float(d["hq_score"][1]),
            "hq_score_min": float(d["hq_score"][2]),
            "hq_score_max": float(d["hq_score"][3]),
            "lq_score_mean": float(d["lq_score"][0]),
            "lq_score_std": float(d["lq_score"][1]),
            "hq_logit_absmean": float(d["hq_logit_absmean"]),
            "hq_latent_rms": float(d["hq_latent_rms"]),
            "lq_latent_rms": float(d["lq_latent_rms"]),
        }
        hist.append(row)
        print(
            f"epoch {epoch}: LS {ls_epoch:.5f} | hq_s {row['hq_score_mean']:.3f}"
            f"+-{row['hq_score_std']:.3f} [{row['hq_score_min']:.3f},{row['hq_score_max']:.3f}]"
            f" | lq_s {row['lq_score_mean']:.3f} | |logit| {row['hq_logit_absmean']:.2f}"
            f" | z_rms hq {row['hq_latent_rms']:.3f} lq {row['lq_latent_rms']:.3f}"
            f" ({time.time() - t0:.1f}s)",
            flush=True,
        )

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({
            "config": {"epochs": args.epochs, "batch_size": args.batch_size,
                       "images": args.synthetic, "seed": args.seed,
                       "mode": "faithful pole: frozen BN, reference quantizer grads, "
                               "broadcast quirk, no perceptual"},
            "mask_stats": {"mean": float(m.mean()), "std": float(m.std()),
                           "floor_healthy": floor_healthy,
                           "collapse_c0": collapse_c0,
                           "collapse_best_c": float(min(collapse_curve)),
                           "collapse_worst_c": float(max(collapse_curve))},
            "history": hist,
        }, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
