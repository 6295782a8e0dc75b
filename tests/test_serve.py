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


def test_storable_codec_bitstream_roundtrip(rng):
    """skip_mode='zero': encode_to_bitstream -> bytes -> decode_from_bitstream
    with NO encoder in the loop must match the pipeline's own decoded output
    (the only differences come from the 8x-downsampled uint8 mask in the
    container driving the blend)."""
    import dataclasses

    cfg = dataclasses.replace(_small_cfg(), skip_mode="zero")
    pipe = CompressionPipeline(model_config=cfg)
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    direct, info = pipe(imgs, target_bpp=1.0)
    streams = pipe.encode_to_bitstream(imgs, target_bpp=1.0, mask_downsample=8)
    assert len(streams) == 2 and all(isinstance(s, bytes) for s in streams)
    decoded = pipe.decode_from_bitstream(streams)
    assert decoded.shape == direct.shape and decoded.dtype == np.uint8
    # bit-exact latents; only the mask coarsening perturbs the blend
    diff = np.abs(decoded.astype(np.int32) - direct.astype(np.int32))
    assert np.mean(diff) < 4.0, f"mean abs diff {np.mean(diff)}"
    # single-stream decode works too
    one = pipe.decode_from_bitstream(streams[0])
    np.testing.assert_array_equal(one[0], decoded[0])


def test_storable_codec_mask_fidelity(rng):
    """With no mask downsampling the bitstream decode matches the direct
    forward almost exactly (u8 mask quantization only)."""
    import dataclasses

    cfg = dataclasses.replace(_small_cfg(), skip_mode="zero")
    pipe = CompressionPipeline(model_config=cfg)
    imgs = rng.randint(0, 256, (1, 64, 64, 3)).astype(np.uint8)
    direct, _ = pipe(imgs, target_bpp=0.1)
    decoded = pipe.decode_from_bitstream(
        pipe.encode_to_bitstream(imgs, target_bpp=0.1, mask_downsample=1)
    )
    diff = np.abs(decoded.astype(np.int32) - direct.astype(np.int32))
    assert np.mean(diff) < 1.0 and np.max(diff) <= 16, (
        f"mean {np.mean(diff)}, max {np.max(diff)}"
    )


def test_zero_skips_sever_encoder_bypass(rng):
    """In skip_mode='zero' the generators see only the quantized latents:
    decode_latents reproduces the full forward's blended output exactly."""
    import dataclasses
    import jax

    from contextual_image_compression_tpu.models.adaptive import AdaptiveCodec

    cfg = dataclasses.replace(
        _small_cfg(), skip_mode="zero", dtype="float32"
    )
    codec = AdaptiveCodec(cfg)
    variables = codec.init(jax.random.PRNGKey(0), batch_size=1)
    img = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    mask = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    bpp = jnp.full((2, 1), 1.0, jnp.float32)
    out, _ = codec.apply(variables, img, mask, bpp, train=False)
    rebuilt = codec.decode_latents(
        variables, out.hq_latent_q, out.lq_latent_q, mask, bpp
    )
    np.testing.assert_allclose(
        np.asarray(rebuilt), np.asarray(out.blended), atol=1e-5
    )


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


def test_pipeline_mesh_data_parallel(rng):
    """SPMD serving: a (data, model) mesh pipeline (params replicated, batch
    sharded over all devices) returns the SAME bytes as the single-device
    pipeline, through both the forward path and the storable bytes->image
    path (including mesh-multiple padding of a ragged decode batch)."""
    from contextual_image_compression_tpu.parallel import create_mesh
    import dataclasses

    cfg = dataclasses.replace(_small_cfg(), skip_mode="zero")
    ref = CompressionPipeline(model_config=cfg)
    mesh = create_mesh(model_parallel=2)
    dp = CompressionPipeline(model_config=cfg, mesh=mesh)

    imgs = rng.randint(0, 256, (8, 64, 64, 3)).astype(np.uint8)
    dec_ref, info_ref = ref(imgs, target_bpp=1.0)
    dec_dp, info_dp = dp(imgs, target_bpp=1.0)
    np.testing.assert_array_equal(dec_ref, dec_dp)
    np.testing.assert_allclose(
        np.asarray(info_ref["hq_symbols"]), np.asarray(info_dp["hq_symbols"])
    )

    # ragged request: pads to a mesh multiple, slices back
    dec3, _ = dp(imgs[:3], target_bpp=1.0)
    np.testing.assert_array_equal(dec3, dec_ref[:3])

    # storable path under the mesh, ragged decode batch (3 streams, 8 devices)
    streams = dp.encode_to_bitstream(imgs[:3], target_bpp=1.0, mask_downsample=8)
    out_dp = dp.decode_from_bitstream(streams)
    out_ref = ref.decode_from_bitstream(streams)
    assert out_dp.shape == (3, 64, 64, 3)
    np.testing.assert_array_equal(out_dp, out_ref)
