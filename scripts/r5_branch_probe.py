#!/usr/bin/env python
"""Per-branch decode probe: HQ-generator-only vs LQ-generator-only vs blended
PSNR from a storable-codec checkpoint (bytes->image latents, zero/mask skips).

Round-5 mechanism evidence for LossConfig.branch_recon_weight: on checkpoints
trained the reference way (blend-only recon loss, GAN_train.py:247) the HQ
branch decodes at ~14.65 dB vs LQ 22.50 dB because the training-time blend is
~all-LQ (runs/r5_rate_control/RUN.md) -- so eval-time shifts toward HQ lower
quality. With branch_recon_weight > 0 both branches receive full-image
reconstruction signal; this probe measures the per-branch PSNR that results.

Usage:
  python scripts/r5_branch_probe.py runs/r5_zero_fixed/models_ckpt [out.json] [rate_mode]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import dataclasses

import numpy as np


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/r5_zero_fixed/models_ckpt"
    out = sys.argv[2] if len(sys.argv) > 2 else ""
    rate_mode = sys.argv[3] if len(sys.argv) > 3 else "fixed"

    import jax
    import jax.numpy as jnp

    from contextual_image_compression_tpu.config import ModelConfig
    from contextual_image_compression_tpu.data.images import rich_synthetic_images
    from contextual_image_compression_tpu.ops.metrics import psnr
    from contextual_image_compression_tpu.serve import CompressionPipeline

    mcfg = dataclasses.replace(ModelConfig(), skip_mode="zero", rate_mode=rate_mode)
    pipe = CompressionPipeline(model_dir=model_dir, model_config=mcfg)
    print(f"checkpoint {model_dir}: {pipe.provenance}")

    imgs = rich_synthetic_images(32, (256, 256), seed=7)
    imgs_u8 = np.clip(np.round((imgs + 1.0) * 127.5), 0, 255).astype(np.uint8)
    ref = jnp.asarray(imgs_u8.astype(np.float32) / 255.0)

    codec = pipe.codec
    results = {"model_dir": model_dir, "rate_mode": rate_mode, "rows": []}
    for bpp in (0.1, 2.0):
        streams = pipe.encode_to_bitstream(imgs_u8, target_bpp=bpp, mask_downsample=8)
        # Unpack latents+mask the same way decode_from_bitstream does, then
        # decode each generator alone by forcing the blend to one branch.
        from contextual_image_compression_tpu.ops import bitstream

        parts = [bitstream.unpack_container(s) for s in streams]
        hq_l = np.stack([p["hq_latent"] for p in parts])
        lq_l = np.stack([p["lq_latent"] for p in parts])
        mask_s = np.stack([p["mask_small"] for p in parts])
        mask = jax.image.resize(
            jnp.asarray(mask_s), (len(imgs), 256, 256), "bilinear"
        )[..., None]
        tbv = jnp.asarray([[p["target_bpp"]] for p in parts], jnp.float32)

        @jax.jit
        def branches(variables, zq_hq, zq_lq, mask, tbv):
            ct = jnp.dtype(codec.cfg.dtype)
            _, threshold, _ = codec.rd_schedule(tbv.astype(ct))
            dyn = codec.dynamic_threshold(mask.astype(ct), threshold)
            skips = codec._zero_skips(zq_hq.shape[0], ct)
            hq = codec.hq_generator.apply(
                variables["hq_generator"], zq_hq.astype(ct), skips, train=False)
            lq = codec.lq_generator.apply(
                variables["lq_generator"], zq_lq.astype(ct), skips, train=False)
            blend = hq * dyn + lq * (1.0 - dyn)
            return hq, lq, blend, jnp.mean(dyn)

        hq, lq, blend, mdyn = branches(
            pipe.variables, jnp.asarray(hq_l), jnp.asarray(lq_l), mask, tbv)

        def p(x):
            x01 = jnp.clip(x.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
            return float(jnp.mean(psnr(ref, x01)))

        row = {"target_bpp": bpp, "hq_only_psnr": p(hq), "lq_only_psnr": p(lq),
               "blend_psnr": p(blend), "mean_dyn_thr": float(mdyn)}
        results["rows"].append(row)
        print(f"bpp {bpp}: blend {row['blend_psnr']:.2f}, hq {row['hq_only_psnr']:.2f}, "
              f"lq {row['lq_only_psnr']:.2f} | mean dyn_thr {row['mean_dyn_thr']:.4f}")

    if out:
        Path(out).write_text(json.dumps(results, indent=2))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
