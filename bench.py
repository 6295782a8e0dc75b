#!/usr/bin/env python
"""Headline benchmark: full contextual compression pipeline throughput on one chip.

Measures the flagship path end-to-end ON DEVICE -- batched saliency (spectral
residual + fine grained + combined) -> smooth mask -> adaptive dual-branch GAN codec
encode+decode (dual encoders with Pallas attention, Pallas adaptive quantization,
dual generators, saliency blend) -- in bfloat16 at the reference scale (256x256,
D=512/1024). The reference runs this per image: host OpenCV saliency + TF predict
(SURVEY.md section 3.3).

Prints ONE JSON line:
  {"metric": "contextual_gan_codec_256_e2e", "value": <img/s/chip>,
   "unit": "images/sec/chip", "vs_baseline": <value / 5000>}
(5000 img/s/chip is BASELINE.json's north-star target; the reference itself
publishes no throughput numbers.) Detailed sub-benchmarks (saliency engine, AE
codec, DCT Pallas codec, fp32 variants) go to BENCH_DETAILS.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, args, warmup=3, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from contextual_image_compression_tpu.config import (
        DCTCodecConfig,
        ModelConfig,
        SaliencyConfig,
    )
    from contextual_image_compression_tpu.data.images import synthetic_images
    from contextual_image_compression_tpu.models.adaptive import AdaptiveCodec
    from contextual_image_compression_tpu.models.autoencoder import Autoencoder
    from contextual_image_compression_tpu.ops import masks as mask_ops
    from contextual_image_compression_tpu.ops import saliency as saliency_ops
    from contextual_image_compression_tpu.ops.dct import DCTCodec
    from contextual_image_compression_tpu.utils.tree import cast_floats

    on_tpu = jax.default_backend() == "tpu"
    batch = 32 if on_tpu else 4
    details = {"backend": jax.default_backend(), "batch": batch}

    images = jnp.asarray(synthetic_images(batch, (256, 256), seed=0))
    scfg = SaliencyConfig()

    # ---------------- flagship: saliency -> mask -> adaptive codec (bf16) ----
    cfg = ModelConfig(dtype="bfloat16")
    codec = AdaptiveCodec(cfg)
    variables = codec.init(jax.random.PRNGKey(0), batch_size=1)
    variables = cast_floats(variables, jnp.bfloat16)

    def e2e(variables, imgs, bpp):
        sal = saliency_ops.compute_saliency_map(imgs, scfg.method, scfg)
        mask = mask_ops.create_saliency_mask(sal, smooth=True, config=scfg)[..., None]
        out, _ = codec.apply(
            variables, imgs.astype(jnp.bfloat16), mask.astype(jnp.bfloat16),
            bpp, train=False,
        )
        return out.blended, out.dynamic_threshold

    bpp = jnp.ones((batch, 1), jnp.bfloat16)
    e2e_jit = jax.jit(e2e)
    dt = _timeit(e2e_jit, (variables, images, bpp))
    e2e_ips = batch / dt
    details["contextual_gan_codec_256_e2e_bf16"] = e2e_ips

    # codec-only (no saliency) for the breakdown
    codec_jit = jax.jit(
        lambda v, i, m, b: codec.apply(v, i, m, b, train=False)[0].blended
    )
    mask_b = jnp.full((batch, 256, 256, 1), 0.5, jnp.bfloat16)
    dt = _timeit(codec_jit, (variables, images.astype(jnp.bfloat16), mask_b, bpp))
    details["gan_codec_256_forward_bf16"] = batch / dt

    # saliency+mask engine only
    sal_jit = jax.jit(
        lambda i: mask_ops.create_saliency_mask(
            saliency_ops.compute_saliency_map(i, scfg.method, scfg), config=scfg
        )
    )
    dt = _timeit(sal_jit, (images,))
    details["saliency_mask_engine_256"] = batch / dt

    # ---------------- AE codec (128^2, reference scale) ----------------------
    ae = Autoencoder(dtype=jnp.bfloat16)
    img128 = jax.image.resize(images, (batch, 128, 128, 3), "linear") * 0.5 + 0.5
    ae_vars = cast_floats(ae.init(jax.random.PRNGKey(1), img128), jnp.bfloat16)
    ae_jit = jax.jit(ae.apply)
    dt = _timeit(ae_jit, (ae_vars, img128.astype(jnp.bfloat16)))
    details["ae_codec_128_forward_bf16"] = batch / dt

    # ---------------- DCT Pallas baseline codec ------------------------------
    dct = DCTCodec(DCTCodecConfig(use_pallas=on_tpu))
    dct_jit = jax.jit(lambda i: dct.roundtrip(i)[0])
    dt = _timeit(dct_jit, (images,))
    details["dct_codec_256_roundtrip"] = batch / dt

    with open(Path(__file__).resolve().parent / "BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "contextual_gan_codec_256_e2e",
                "value": round(e2e_ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(e2e_ips / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
