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


def test_pipeline_explicit_variables_provenance():
    cfg = _small_cfg()
    donor = CompressionPipeline(model_config=cfg)
    pipe = CompressionPipeline(variables=donor.variables, model_config=cfg)
    assert pipe.provenance == {"all": "provided"}


def test_pipeline_device_symbols_match_quantized_latents(rng):
    """The on-device fp32 symbols must dequantize to the quantizer's own
    output (the ADVICE bf16-drift fix)."""
    pipe = CompressionPipeline(model_config=_small_cfg())
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    _, info = pipe(imgs, target_bpp=2.0)
    sym = np.asarray(info["hq_symbols"], np.float32)
    scale = np.asarray(info["hq_scale"], np.float32)[:, None]
    deq = sym / scale
    want = np.asarray(info["hq_latent_q"], np.float32)
    # hq_latent_q is bf16-stored; sym/scale is its fp32-exact counterpart
    np.testing.assert_allclose(deq, want, atol=np.abs(want).max() / 256 + 1e-5)
    assert np.all(sym == np.round(sym))


def test_pipeline_ragged_tail_batch(rng):
    """A ragged final batch pads up to a compiled bucket and slices back --
    results must match the same images run at their natural batch size."""
    pipe = CompressionPipeline(model_config=_small_cfg())
    imgs = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    pipe.warmup(4)
    assert pipe._padded_batch(3) == 4  # reuses the compiled executable
    dec3, info3 = pipe(imgs[:3], target_bpp=1.0)
    assert dec3.shape == (3, 64, 64, 3)
    for v in info3.values():
        assert np.asarray(v).shape[0] == 3
    dec4, _ = pipe(imgs, target_bpp=1.0)
    np.testing.assert_array_equal(dec3, dec4[:3])
    # a batch larger than anything compiled rounds up to the next power of two
    assert pipe._padded_batch(5) == 8
