#!/usr/bin/env python
"""Per-component throughput breakdown of the adaptive codec forward pass.

VERDICT.md round 1: e2e is 4,168 img/s vs the 5,000 north star, codec-only 4,974;
nobody measured where the last 33% of MFU goes. This script times each component
in isolation (same methodology as bench.py: chained jitted calls, scalar-fetch
completion fence, single-call time subtracted) and prints a JSON breakdown.

Usage: python scripts/profile_codec.py [--batch 128] [--trace DIR]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import measure_images_per_sec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace", default=None, help="write a jax.profiler trace here")
    args = p.parse_args()

    from contextual_image_compression_tpu.config import ModelConfig, SaliencyConfig
    from contextual_image_compression_tpu.data.images import synthetic_images
    from contextual_image_compression_tpu.models.adaptive import AdaptiveCodec
    from contextual_image_compression_tpu.ops import masks as mask_ops
    from contextual_image_compression_tpu.utils.tree import cast_floats

    batch, iters = args.batch, args.iters
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        batch, iters = 2, 3

    cfg = ModelConfig(dtype="bfloat16")
    codec = AdaptiveCodec(cfg)
    variables = cast_floats(codec.init(jax.random.PRNGKey(0), batch_size=1), jnp.bfloat16)
    imgs = jnp.asarray(synthetic_images(batch, (256, 256), seed=0)).astype(jnp.bfloat16)
    mask = jnp.full((batch, 256, 256, 1), 0.5, jnp.bfloat16)
    bpp = jnp.ones((batch, 1), jnp.bfloat16)
    scfg = SaliencyConfig()

    out = {"batch": batch, "backend": jax.default_backend()}

    def run(name, fn, params, x):
        ips = measure_images_per_sec(fn, params, x, batch, iters)
        out[name] = round(ips, 1)
        print(f"{name:32s} {ips:10.0f} img/s  ({1e6 * batch / ips / batch:8.1f} us/img)",
              file=sys.stderr, flush=True)

    # full codec
    def codec_step(v, x):
        o, _ = codec.apply(v, x, mask, bpp, train=False)
        return o.blended
    run("codec_full", codec_step, variables, imgs)

    # saliency+mask engine
    def sal_step(_, x):
        m = mask_ops.compute_contextual_mask(x.astype(jnp.float32), scfg)
        return x * 0.999 + m[..., None].astype(x.dtype) * 0.001
    run("saliency_mask", sal_step, jnp.zeros(()), imgs)

    # encoders
    def enc_hq(v, x):
        lat, skips = codec.hq_encoder.apply(v["hq_encoder"], x, train=False)
        return x + 0.0 * (skips[0][..., :3] + jnp.sum(lat) * 0)
    run("encoder_hq(with attn)", enc_hq, variables, imgs)

    def enc_lq(v, x):
        lat, skips = codec.lq_encoder.apply(v["lq_encoder"], x, train=False)
        return x + 0.0 * (skips[0][..., :3] + jnp.sum(lat) * 0)
    run("encoder_lq", enc_lq, variables, imgs)

    # attention block alone (32x32x256 features)
    from contextual_image_compression_tpu.models.attention import SelfAttention
    feats = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 32, 256), jnp.bfloat16)
    attn = SelfAttention(256, use_pallas=True, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    attn_vars = attn.init(jax.random.PRNGKey(2), feats)
    run("attention_pallas", lambda v, x: attn.apply(v, x), attn_vars, feats)
    attn_x = SelfAttention(256, use_pallas=False, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    run("attention_xla", lambda v, x: attn_x.apply(v, x), attn_vars, feats)

    # generators (fixed latents/skips as params to avoid recompute)
    lat_hq, skips_hq = jax.jit(
        lambda v, x: codec.hq_encoder.apply(v["hq_encoder"], x, train=False)
    )(variables, imgs)
    lat_lq, skips_lq = jax.jit(
        lambda v, x: codec.lq_encoder.apply(v["lq_encoder"], x, train=False)
    )(variables, imgs)

    def gen_hq(v, x):
        y = codec.hq_generator.apply(v["hq_generator"], lat_hq, skips_hq, train=False)
        return x + 0.0 * y
    run("generator_hq", gen_hq, variables, imgs)

    def gen_lq(v, x):
        y = codec.lq_generator.apply(v["lq_generator"], lat_lq, skips_lq, train=False)
        return x + 0.0 * y
    run("generator_lq", gen_lq, variables, imgs)

    # glue: latent saliency + rd + quantize + threshold + blend
    hq_out = jnp.zeros((batch, 256, 256, 3), jnp.bfloat16)

    def glue(v, x):
        s_hq = codec.latent_saliency.apply(v["latent_saliency_hq"], lat_hq)
        s_lq = codec.latent_saliency.apply(v["latent_saliency_lq"], lat_lq)
        rd = codec.rd_optimizer.apply(v["rd_optimizer"], x, mask, bpp)
        overall, thr, qs = codec.rd_schedule(bpp)
        dyn = codec.dynamic_threshold(mask, thr)
        from contextual_image_compression_tpu.ops.quantize import adaptive_quantize
        zq_hq = adaptive_quantize(lat_hq, s_hq, qs, cfg.quantizer)
        zq_lq = adaptive_quantize(lat_lq, s_lq, qs, cfg.quantizer)
        blended = hq_out * dyn + x * (1 - dyn)
        return blended + 0.0 * (jnp.sum(zq_hq) + jnp.sum(zq_lq) + jnp.sum(rd))
    run("glue(ls+rd+quant+blend)", glue, variables, imgs)

    if args.trace and on_tpu:
        jax.profiler.start_trace(args.trace)
        fn = jax.jit(codec_step)
        x = imgs
        for _ in range(5):
            x = fn(variables, x)
        float(jnp.sum(x[0, 0, 0]))
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
