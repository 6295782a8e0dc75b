#!/usr/bin/env python
"""Round-3 pending-option sweep: the two default-off saliency lowerings.

Measures the full saliency+mask engine AND the e2e pipeline under the four
combinations of (docs/PERF_NOTES.md "PENDING on-TPU measurement"):

  - SaliencyConfig.spectral_dft_matmul: 64-point FFT pair as DFT matmuls
  - SaliencyConfig.mask_spec_small: fused mask kernel consumes the 64^2
    spectral map and upsamples in-VMEM (skips a (B,256,256) f32 HBM round trip)

Parity for both is asserted on-chip by scripts/tpu_selftest.py; this script
decides the config DEFAULTS (flip whichever combo wins on e2e).
"""

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import measure_images_per_sec
from contextual_image_compression_tpu.config import ModelConfig, SaliencyConfig
from contextual_image_compression_tpu.data.images import synthetic_images
from contextual_image_compression_tpu.models.adaptive import AdaptiveCodec
from contextual_image_compression_tpu.ops import masks as mask_ops
from contextual_image_compression_tpu.utils.tree import cast_floats


def main():
    on_tpu = jax.default_backend() == "tpu"
    batch = 128 if on_tpu else 2
    iters = 20 if on_tpu else 3
    print(f"backend={jax.default_backend()} batch={batch}")

    images_np = synthetic_images(batch, (256, 256), seed=0)
    imgs_u8 = jnp.asarray(
        np.clip(np.round((images_np + 1.0) * 127.5), 0, 255).astype(np.uint8)
    )
    imgs32 = jnp.asarray(images_np)

    cfg = dataclasses.replace(ModelConfig(dtype="bfloat16"), generator_packed_tail=True)
    codec = AdaptiveCodec(cfg)
    variables = cast_floats(codec.init(jax.random.PRNGKey(0), batch_size=1), jnp.bfloat16)
    bpp = jnp.ones((batch, 1), jnp.bfloat16)

    for dft in (False, True):
        for small in (False, True):
            scfg = dataclasses.replace(
                SaliencyConfig(), spectral_dft_matmul=dft, mask_spec_small=small
            )

            def sal_step(_, imgs, _scfg=scfg):
                mask = mask_ops.compute_contextual_mask(imgs, _scfg)
                return imgs * 0.999 + mask[..., None] * 0.001

            def e2e_step(v, imgs, _scfg=scfg):
                mask = mask_ops.compute_contextual_mask(imgs, _scfg)[..., None]
                img_bf = imgs.astype(jnp.bfloat16) * (1.0 / 127.5) - 1.0
                out, _ = codec.apply(v, img_bf, mask.astype(jnp.bfloat16), bpp, train=False)
                decoded = (out.blended.astype(jnp.float32) + 1.0) * 127.5
                return jnp.clip(jnp.round(decoded), 0, 255).astype(jnp.uint8)

            sal_ips = measure_images_per_sec(sal_step, jnp.zeros(()), imgs32, batch, iters)
            e2e_ips = measure_images_per_sec(e2e_step, variables, imgs_u8, batch, iters)
            print(
                f"dft_matmul={int(dft)} mask_spec_small={int(small)}: "
                f"mask_engine={sal_ips:.0f} img/s  e2e={e2e_ips:.0f} img/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
