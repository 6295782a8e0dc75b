#!/usr/bin/env python
"""Round-3 experiment E: XLA compiler-flag sweep on the e2e pipeline.

Every op in the codec sits at 70-90% of its roofline (docs/PERF_NOTES.md) and
the remaining slack is in XLA's own fusion tiling choices, which several TPU
flags steer -- most importantly `--xla_tpu_scoped_vmem_limit_kib` (the VMEM
budget each fusion may tile into: larger budgets allow deeper conv tiles and
longer weight-stream bursts). Flags must be set before backend init, so each
configuration runs in a fresh subprocess (`--child`); the parent just sweeps.

Usage:  python scripts/r3_xla_flag_sweep.py            # sweep (parent)
        XLA_FLAGS=... python scripts/r3_xla_flag_sweep.py --child  # one point
"""

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = [
    ("baseline", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    # bigger core-count-agnostic knobs that sometimes shift conv fusions
    ("flm_aggressive", "--xla_tpu_enable_flm=true"),
    ("no_rematerialization", "--xla_tpu_rematerialization=false"),
]


def child():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import measure_images_per_sec
    from contextual_image_compression_tpu.config import ModelConfig, SaliencyConfig
    from contextual_image_compression_tpu.data.images import synthetic_images
    from contextual_image_compression_tpu.models.adaptive import AdaptiveCodec
    from contextual_image_compression_tpu.ops import masks as mask_ops
    from contextual_image_compression_tpu.utils.tree import cast_floats
    import dataclasses

    batch = 128
    images_np = synthetic_images(batch, (256, 256), seed=0)
    scfg = SaliencyConfig()
    cfg = dataclasses.replace(ModelConfig(dtype="bfloat16"), generator_packed_tail=True)
    codec = AdaptiveCodec(cfg)
    variables = cast_floats(
        codec.init(jax.random.PRNGKey(0), batch_size=1), jnp.bfloat16
    )
    bpp = jnp.ones((batch, 1), jnp.bfloat16)

    def e2e_step(v, imgs_u8):
        mask = mask_ops.compute_contextual_mask(imgs_u8, scfg)[..., None]
        img_bf = imgs_u8.astype(jnp.bfloat16) * (1.0 / 127.5) - 1.0
        out, _ = codec.apply(v, img_bf, mask.astype(jnp.bfloat16), bpp, train=False)
        decoded = (out.blended.astype(jnp.float32) + 1.0) * 127.5
        return jnp.clip(jnp.round(decoded), 0, 255).astype(jnp.uint8)

    imgs_u8 = jnp.asarray(
        np.clip(np.round((images_np + 1.0) * 127.5), 0, 255).astype(np.uint8)
    )
    ips = measure_images_per_sec(e2e_step, variables, imgs_u8, batch, iters=20)
    print(f"RESULT {ips:.1f}", flush=True)


def main():
    if "--child" in sys.argv:
        child()
        return
    base_flags = os.environ.get("XLA_FLAGS", "")
    for name, flags in CONFIGS:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (base_flags + " " + flags).strip()
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, __file__, "--child"],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        out = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        if p.returncode != 0 or not out:
            tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
            print(f"E {name}: FAILED ({'; '.join(tail)})", flush=True)
        else:
            print(f"E {name}: {out[0].split()[1]} img/s  ({time.time()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
