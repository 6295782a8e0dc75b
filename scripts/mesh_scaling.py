#!/usr/bin/env python
"""Per-device-count SPMD sanity record on the virtual CPU mesh.

VERDICT.md round 1, item 7: record the fused GAN train step across 1/2/4/8
devices on the virtual CPU mesh as a committed artifact. What this CAN and
CANNOT show:

  * CAN: that the step produces the SAME losses at every device count (SPMD
    equivalence at the loop level), and that the batch is genuinely sharded --
    each device holds a 1/D slice (shard shapes recorded below), params/moments
    shard on the model axis when enabled.
  * CANNOT: wall-clock speedup. All virtual devices created by
    --xla_force_host_platform_device_count share the SAME physical cores, so
    total compute per step is constant and collectives only add overhead --
    step time is expected to RISE slightly with device count here. Real scaling
    needs real chips; this artifact pins correctness + layout, bench.py pins
    single-chip speed.

Writes runs/mesh_scaling.json and prints it.

Usage: python scripts/mesh_scaling.py [--global-batch 64] [--steps 5]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--global-batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--img-size", type=int, default=32)
    p.add_argument("--latent", type=int, default=64)
    p.add_argument("--out", default="runs/mesh_scaling.json")
    args = p.parse_args()

    from contextual_image_compression_tpu.config import (
        ModelConfig,
        QuantizerConfig,
        TrainConfig,
    )
    from contextual_image_compression_tpu.parallel import create_mesh
    from contextual_image_compression_tpu.parallel import sharding as shard_lib
    from contextual_image_compression_tpu.train.gan_trainer import Batch, GANStepBuilder

    assert jax.device_count() == 8, jax.devices()

    mcfg = ModelConfig(
        img_size=(args.img_size, args.img_size),
        base_latent_dim=args.latent,
        encoder_channels=(8, 16, 24, 32),
        generator_channels=(24, 16, 8, 8),
        generator_base_hw=args.img_size // 16,
        generator_base_ch=32,
        attention_use_pallas=False,
        quantizer=QuantizerConfig(use_pallas=False),
    )
    cfg = TrainConfig(model=mcfg, batch_size=args.global_batch, use_perceptual=False)

    rng = np.random.RandomState(0)
    batch_np = (
        rng.rand(args.global_batch, args.img_size, args.img_size, 3).astype(np.float32)
        * 2
        - 1,
        rng.rand(args.global_batch, args.img_size, args.img_size, 1).astype(np.float32),
        rng.choice([0.1, 1.0, 2.0], (args.global_batch, 1)).astype(np.float32),
    )

    results = {
        "global_batch": args.global_batch,
        "img_size": args.img_size,
        "steps": args.steps,
        "per_device_count": {},
    }
    for n_dev in (1, 2, 4, 8):
        mesh = create_mesh(devices=np.array(jax.devices()[:n_dev]))
        builder = GANStepBuilder(cfg, bn_mode="frozen")
        state = builder.init_state(jax.random.PRNGKey(0), batch_size=args.global_batch)
        state = shard_lib.shard_state(state, mesh)
        batch = shard_lib.shard_batch(
            Batch(*(jnp.asarray(a) for a in batch_np)), mesh
        )
        step, _ = builder.jitted_steps(donate=False)
        state2, metrics = step(state, batch)  # compile
        jax.block_until_ready(metrics)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state2, metrics = step(state2, batch)
        jax.block_until_ready(metrics)
        dt = (time.perf_counter() - t0) / args.steps
        img_shard = batch.image.addressable_shards[0].data.shape
        results["per_device_count"][str(n_dev)] = {
            "step_time_s": round(dt, 4),
            "per_device_batch_shard": list(img_shard),
            "losses": {k: float(v) for k, v in metrics.items()},
        }
        assert img_shard[0] == args.global_batch // n_dev, (
            "batch axis not sharded 1/D", img_shard, n_dev
        )
        print(f"devices={n_dev}: {dt * 1e3:.1f} ms/step, "
              f"per-device shard {img_shard}", file=sys.stderr, flush=True)

    # SPMD equivalence: identical losses at every device count (float32 noise).
    base = results["per_device_count"]["1"]["losses"]
    for d in ("2", "4", "8"):
        for k, v in results["per_device_count"][d]["losses"].items():
            assert abs(v - base[k]) <= 1e-4 + 1e-3 * abs(base[k]), (d, k, v, base[k])
    results["spmd_loss_equivalence"] = "losses match across 1/2/4/8 devices"
    results["note"] = (
        "virtual CPU devices share physical cores: step time measures collective "
        "overhead, not scaling; see module docstring"
    )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
