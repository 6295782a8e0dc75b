"""Serving pipeline (serve.py): uint8 in -> uint8 out, latent bitstreams."""

import numpy as np
import jax.numpy as jnp

from contextual_image_compression_tpu.config import ModelConfig
from contextual_image_compression_tpu.serve import CompressionPipeline
from contextual_image_compression_tpu.ops import bitstream as bs


def _small_cfg():
    return ModelConfig(
        img_size=(64, 64), base_latent_dim=64, generator_base_hw=4
    )


def test_pipeline_roundtrip_u8(rng):
    pipe = CompressionPipeline(model_config=_small_cfg())
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    decoded, info = pipe(imgs, target_bpp=1.0)
    assert decoded.shape == imgs.shape and decoded.dtype == np.uint8
    alloc = np.asarray(info["bit_allocation"])
    assert alloc.shape == (2, 64, 64)
    assert np.all(alloc >= 0) and np.all(alloc <= 1)


def test_pipeline_latent_bitstreams(rng):
    pipe = CompressionPipeline(model_config=_small_cfg())
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    _, info = pipe(imgs, target_bpp=0.1)
    streams, bpp = pipe.serialize_latents(info)
    assert len(streams) == 2 and bpp.shape == (2,)
    assert np.all(bpp > 0)
    # streams decode back to the quantized latents (within the symbol grid)
    hq, scale = bs.unpack_latent(streams[0][0])
    want = np.asarray(info["hq_latent_q"], np.float32)[0]
    np.testing.assert_allclose(hq, np.round(want * scale) / scale, atol=1e-5)


def test_pipeline_fresh_init_provenance():
    pipe = CompressionPipeline(model_config=_small_cfg())
    assert pipe.provenance == {"all": "init"}
