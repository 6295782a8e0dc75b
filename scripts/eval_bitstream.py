#!/usr/bin/env python
"""Storable-codec evaluation: bytes -> image with NO encoder in the loop.

Measures what the container format (ops/bitstream.pack_container) actually
delivers from a trained checkpoint: encode a held-out corpus to self-contained
per-image streams, decode each FROM THE BYTES ALONE via
serve.CompressionPipeline.decode_from_bitstream, and report PSNR / SSIM of the
bitstream-decoded images against the originals plus the true container bpp
(container bytes / pixels -- mask + header included, unlike the latent-only
"measured bpp" column of eval/harness.py).

This quantifies the skip-free codec's end-to-end quality (ModelConfig.
skip_mode='zero'); run it against an 'encoder'-skip checkpoint to see the cost
of decoding without the skips the generator was trained to consume. The
reference only ever computes analytic bpp with the encoder in the loop
(GAN_test.py:314-325) -- this path has no reference counterpart.

Usage:
  python scripts/eval_bitstream.py --model-dir runs/r4_skipfree/ste/models_ckpt \
      --skip-mode zero --synthetic 8 --synthetic-rich --seed 7
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--synthetic", type=int, default=8)
    p.add_argument("--synthetic-rich", action="store_true")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--skip-mode", choices=["encoder", "zero", "mask"],
                   default="zero")
    p.add_argument("--rate-mode", choices=["reference", "fixed"],
                   default="reference",
                   help="quantizer rate schedule (ModelConfig.rate_mode); must "
                   "match what the checkpoint was trained/fine-tuned with")
    p.add_argument("--quant-bypass", action="store_true",
                   help="measure the architecture CEILING: run the forward "
                   "path with unquantized latents (no bitstream columns -- "
                   "nothing storable corresponds to fp32 latents)")
    p.add_argument("--bpps", type=float, nargs="+", default=[0.1, 1.0, 2.0])
    p.add_argument("--base-latent-dim", type=int, default=None,
                   help="LQ latent width (HQ = 2x); must match the checkpoint "
                   "(round-5 latent-capacity sweep, runs/r5_latent_sweep)")
    p.add_argument("--mask-downsample", type=int, default=8)
    p.add_argument("--out", default="",
                   help="optional JSON path for the per-bpp results table")
    args = p.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from contextual_image_compression_tpu.config import ModelConfig
    from contextual_image_compression_tpu.data.images import (
        rich_synthetic_images,
        synthetic_images,
    )
    from contextual_image_compression_tpu.ops.metrics import psnr, ssim_rgb_channel_mean
    from contextual_image_compression_tpu.serve import CompressionPipeline

    gen = rich_synthetic_images if args.synthetic_rich else synthetic_images
    imgs = gen(args.synthetic, (256, 256), seed=args.seed)  # [-1, 1] float
    imgs_u8 = np.clip(np.round((imgs + 1.0) * 127.5), 0, 255).astype(np.uint8)

    mcfg = dataclasses.replace(
        ModelConfig(), skip_mode=args.skip_mode, rate_mode=args.rate_mode,
        quant_bypass=args.quant_bypass,
    )
    if args.base_latent_dim:
        mcfg = dataclasses.replace(mcfg, base_latent_dim=args.base_latent_dim)
    pipe = CompressionPipeline(model_dir=args.model_dir, model_config=mcfg)
    print(f"Loaded components: {pipe.provenance}")
    print(f"skip_mode={args.skip_mode}, rate_mode={args.rate_mode}, "
          f"{args.synthetic} held-out images (seed {args.seed})"
          + (" [QUANT BYPASSED: ceiling measurement]" if args.quant_bypass else ""))

    ref = jnp.asarray(imgs_u8.astype(np.float32) / 255.0)
    npix = imgs_u8.shape[1] * imgs_u8.shape[2]
    rows = []
    for bpp in args.bpps:
        # Forward-path decode (encoder in the loop) for comparison.
        fwd_u8, _ = pipe(imgs_u8, target_bpp=bpp)
        fwd = jnp.asarray(fwd_u8.astype(np.float32) / 255.0)
        fwd_psnr = float(jnp.mean(psnr(ref, fwd)))

        if args.quant_bypass:
            fwd_ssim = float(jnp.mean(ssim_rgb_channel_mean(ref, fwd)))
            rows.append({
                "target_bpp": bpp,
                "ceiling_psnr": fwd_psnr,
                "ceiling_ssim": fwd_ssim,
            })
            print(f"bpp {bpp}: CEILING (unquantized latents) "
                  f"PSNR {fwd_psnr:.2f} dB, SSIM {fwd_ssim:.4f}")
            continue

        # The storable path: bytes -> image only.
        streams = pipe.encode_to_bitstream(
            imgs_u8, target_bpp=bpp, mask_downsample=args.mask_downsample
        )
        dec_u8 = pipe.decode_from_bitstream(streams)
        dec = jnp.asarray(dec_u8.astype(np.float32) / 255.0)
        dec_psnr = float(jnp.mean(psnr(ref, dec)))
        dec_ssim = float(jnp.mean(ssim_rgb_channel_mean(ref, dec)))
        container_bpp = float(
            np.mean([len(s) * 8.0 / npix for s in streams])
        )
        rows.append({
            "target_bpp": bpp,
            "bitstream_decode_psnr": dec_psnr,
            "bitstream_decode_ssim": dec_ssim,
            "container_bpp": container_bpp,
            "forward_path_psnr": fwd_psnr,
        })
        print(
            f"bpp {bpp}: bitstream-decode PSNR {dec_psnr:.2f} dB, "
            f"SSIM {dec_ssim:.4f}, container bpp {container_bpp:.4f} "
            f"(forward-path PSNR {fwd_psnr:.2f} dB, "
            f"delta {dec_psnr - fwd_psnr:+.2f} dB)"
        )
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump({
                "model_dir": args.model_dir, "skip_mode": args.skip_mode,
                "rate_mode": args.rate_mode,
                "quant_bypass": args.quant_bypass,
                "base_latent_dim": mcfg.base_latent_dim,
                "images": args.synthetic, "seed": args.seed,
                "mask_downsample": args.mask_downsample, "rows": rows,
            }, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
