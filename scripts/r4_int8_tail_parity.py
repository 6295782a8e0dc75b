#!/usr/bin/env python
"""Round-4 adoption gate for ModelConfig.packed_tail_int8: decoded-uint8
parity and e2e throughput of the int8 phase-planar generator tail, on the
REAL chip, with a TRAINED checkpoint.

The mechanism tests live in tests/test_packed_tail.py (analytic quantization
bound, calibrated-envelope parity); this script answers the adoption
questions for the serving configuration (serve.py::_serving_model_config):

  1. On a trained checkpoint (runs/r2_faithful), how far do decoded uint8
     outputs move vs the exact bf16 packed tail, across target bpp
     0.1 / 1.0 / 2.0?  (max |level diff|, % pixels changed, PSNR between the
     two decodes, and each decode's PSNR vs the source corpus.)
  2. What does the full e2e u8->u8 pipeline gain? (bench.py methodology:
     chained data-dependent jitted calls, scalar fetch, (T(n)-T(1))/(n-1).)

Usage: python scripts/r4_int8_tail_parity.py [model_dir] [out_json]

Self-recording (advisor round-4 finding: the round-4 run's evidence was
never committed because recording was a manual step): the full results JSON
is written to out_json (default runs/r5_int8_tail_parity.json) and a one-line
summary is appended to runs/r4_perf_experiments.log -- running the gate and
recording its evidence cannot be separated.
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from contextual_image_compression_tpu.checkpoint.store import CheckpointStore
from contextual_image_compression_tpu.config import ModelConfig, SaliencyConfig
from contextual_image_compression_tpu.data.images import synthetic_images
from contextual_image_compression_tpu.models.adaptive import AdaptiveCodec
from contextual_image_compression_tpu.models.layers import quantize_dense_w8
from contextual_image_compression_tpu.ops import masks as mask_ops
from contextual_image_compression_tpu.utils.tree import cast_floats


def build_step(cfg, scfg, bpp_val, batch):
    codec = AdaptiveCodec(cfg)
    bpp = jnp.full((batch, 1), bpp_val, jnp.bfloat16)

    def e2e_step(v, imgs_u8):
        mask = mask_ops.compute_contextual_mask(imgs_u8, scfg)[..., None]
        img_bf = imgs_u8.astype(jnp.bfloat16) * (1.0 / 127.5) - 1.0
        out, _ = codec.apply(v, img_bf, mask.astype(jnp.bfloat16), bpp, train=False)
        decoded = (out.blended.astype(jnp.float32) + 1.0) * 127.5
        return jnp.clip(jnp.round(decoded), 0, 255).astype(jnp.uint8)

    return codec, jax.jit(e2e_step)


def timeit_chained(fn, v, x0, batch, iters=20, repeats=5):
    def timed(n):
        t0 = time.perf_counter()
        x = x0
        for _ in range(n):
            x = fn(v, x)
        int(x[0, 0, 0, 0])
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    s = sorted(batch / max((timed(iters) - t1) / (iters - 1), 1e-9)
               for _ in range(repeats))
    return s[len(s) // 2], [s[0], s[-1]]


def psnr_u8(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/r2_faithful/models_ckpt"
    out_json = Path(
        sys.argv[2] if len(sys.argv) > 2 else "runs/r5_int8_tail_parity.json"
    )
    on_tpu = jax.default_backend() == "tpu"
    batch = 128 if on_tpu else 2
    scfg = SaliencyConfig()

    images_np = synthetic_images(batch, (256, 256), seed=0)
    imgs_u8 = jnp.asarray(
        np.clip(np.round((images_np + 1.0) * 127.5), 0, 255).astype(np.uint8)
    )
    src_u8 = np.asarray(imgs_u8)

    results = {"model_dir": model_dir, "backend": jax.default_backend(),
               "batch": batch}
    variants = {}
    for name, int8 in (("bf16_tail", False), ("int8_tail", True)):
        cfg = dataclasses.replace(
            ModelConfig(dtype="bfloat16"), generator_packed_tail=True,
            dense_w8=True, packed_tail_int8=int8,
        )
        codec = AdaptiveCodec(cfg)
        template = codec.init(jax.random.PRNGKey(0), batch_size=1)
        variables, prov = CheckpointStore(model_dir).load_components(template)
        variables = cast_floats(
            quantize_dense_w8(variables), jnp.bfloat16, skip_keys=("w8_scale",)
        )
        variants[name] = (cfg, variables)
        if name == "bf16_tail":
            results["checkpoint_provenance"] = {
                k: str(v) for k, v in list(prov.items())[:3]
            }

    for bpp_val in (0.1, 1.0, 2.0):
        decs = {}
        for name, (cfg, variables) in variants.items():
            _, step = build_step(cfg, scfg, bpp_val, batch)
            decs[name] = np.asarray(step(variables, imgs_u8))
        a, b = decs["bf16_tail"], decs["int8_tail"]
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        results[f"bpp{bpp_val}"] = {
            "max_level_diff": int(diff.max()),
            "mean_abs_level_diff": float(diff.mean()),
            "pct_pixels_changed": float((diff > 0).mean() * 100.0),
            "psnr_int8_vs_bf16_decode": round(psnr_u8(a, b), 2),
            "psnr_bf16_vs_src": round(psnr_u8(a, src_u8), 3),
            "psnr_int8_vs_src": round(psnr_u8(b, src_u8), 3),
        }
        print(f"bpp {bpp_val}: {results[f'bpp{bpp_val}']}", flush=True)

    if on_tpu:
        for name, (cfg, variables) in variants.items():
            _, step = build_step(cfg, scfg, 1.0, batch)
            ips, spread = timeit_chained(step, variables, imgs_u8, batch)
            results[f"e2e_ips_{name}"] = round(ips, 1)
            results[f"e2e_ips_{name}_minmax"] = [round(s, 1) for s in spread]
            print(f"e2e {name}: {ips:.0f} img/s [{spread[0]:.0f}, {spread[1]:.0f}]",
                  flush=True)

    print(json.dumps(results))
    out_json.parent.mkdir(parents=True, exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    log = out_json.parent / "r4_perf_experiments.log"
    with open(log, "a") as f:
        f.write("int8_tail_parity " + json.dumps(results) + "\n")
    print(f"wrote {out_json} and appended to {log}")


if __name__ == "__main__":
    main()
