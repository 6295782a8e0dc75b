"""DCT/JPEG-style Pallas baseline codec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.config import DCTCodecConfig
from contextual_image_compression_tpu.data.images import synthetic_images
from contextual_image_compression_tpu.ops import dct as dct_mod
from contextual_image_compression_tpu.ops import metrics as metric_ops


def test_dct_matrix_orthonormal():
    d = dct_mod._dct_matrix()
    np.testing.assert_allclose(d @ d.T, np.eye(8), atol=1e-5)


def test_quality_table_scaling():
    t50 = dct_mod.quality_scaled_table(dct_mod._LUMA_TABLE, 50)
    np.testing.assert_allclose(t50, dct_mod._LUMA_TABLE)  # Q=50 => identity scale
    t90 = dct_mod.quality_scaled_table(dct_mod._LUMA_TABLE, 90)
    assert (t90 <= t50).all() and t90.min() >= 1
    t10 = dct_mod.quality_scaled_table(dct_mod._LUMA_TABLE, 10)
    assert (t10 >= t50).all() and t10.max() <= 255


def test_colorspace_roundtrip(rng):
    rgb = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32) * 255)
    back = dct_mod.ycbcr_to_rgb(dct_mod.rgb_to_ycbcr(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-2)


def test_roundtrip_quality_ordering():
    imgs = jnp.asarray(synthetic_images(2, (64, 64), seed=0))
    psnrs = {}
    for q in (30, 75, 95):
        codec = dct_mod.DCTCodec(DCTCodecConfig(quality=q, use_pallas=False))
        rec, _sym = codec.roundtrip(imgs)
        psnrs[q] = float(jnp.mean(metric_ops.gan_metrics(imgs, rec)["psnr"]))
    assert psnrs[30] < psnrs[75] < psnrs[95], psnrs
    assert psnrs[95] > 30  # high quality should reconstruct well


def test_pallas_matches_jnp():
    imgs = jnp.asarray(synthetic_images(2, (32, 32), seed=1))
    rec_p, sym_p = dct_mod.DCTCodec(DCTCodecConfig(use_pallas=True)).roundtrip(imgs)
    rec_j, sym_j = dct_mod.DCTCodec(DCTCodecConfig(use_pallas=False)).roundtrip(imgs)
    np.testing.assert_allclose(np.asarray(rec_p), np.asarray(rec_j), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sym_p), np.asarray(sym_j), atol=1e-3)


def test_bpp_monotone_in_quality():
    imgs = jnp.asarray(synthetic_images(2, (64, 64), seed=2))
    bpps = {}
    for q in (30, 95):
        codec = dct_mod.DCTCodec(DCTCodecConfig(quality=q, use_pallas=False))
        bpps[q] = float(jnp.mean(codec.evaluate(imgs)["bpp"]))
    assert bpps[30] < bpps[95]


def test_measured_bitstream():
    imgs = jnp.asarray(synthetic_images(1, (64, 64), seed=3))
    codec = dct_mod.DCTCodec(DCTCodecConfig(quality=75, use_pallas=False))
    _, sym = codec.roundtrip(imgs)
    data = codec.serialize(np.asarray(sym[0]))
    assert len(data) > 0
    measured = codec.measured_bpp(np.asarray(sym[0]), (64, 64))
    assert 0 < measured < 24  # less than raw RGB


def test_stream_encode_decode_roundtrip():
    """Self-contained bitstream: encode_stream -> decode_stream equals the
    codec's roundtrip reconstruction exactly."""
    img = jnp.asarray(synthetic_images(1, (64, 64), seed=9)[0])
    codec = dct_mod.DCTCodec(DCTCodecConfig(quality=60, use_pallas=False))
    stream = codec.encode_stream(img)
    decoded = codec.decode_stream(stream)
    rec, _ = codec.roundtrip(img[None])
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(rec[0]), atol=1e-5)
    # decode guards
    with pytest.raises(ValueError):
        codec.decode_stream(b"\x09" + stream[1:])


def test_stream_decode_cross_quality():
    """Streams are self-contained: a codec configured at a different quality
    decodes using the header's quality byte, bit-identically to the encoder's
    own decode."""
    img = jnp.asarray(synthetic_images(1, (64, 64), seed=9)[0])
    enc = dct_mod.DCTCodec(DCTCodecConfig(quality=60, use_pallas=False))
    stream = enc.encode_stream(img)
    other = dct_mod.DCTCodec(DCTCodecConfig(quality=90, use_pallas=False))
    np.testing.assert_array_equal(
        np.asarray(other.decode_stream(stream)), np.asarray(enc.decode_stream(stream))
    )
