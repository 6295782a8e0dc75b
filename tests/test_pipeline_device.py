"""Device-resident dataset option: identical batches to the host path, shared
device arrays across with_target_bpp views."""

import numpy as np
import jax.numpy as jnp

from contextual_image_compression_tpu.data.pipeline import CompressionDataset


def _data(n=8, hw=16):
    rng = np.random.RandomState(0)
    imgs = rng.rand(n, hw, hw, 3).astype(np.float32) * 2 - 1
    masks = rng.rand(n, hw, hw, 1).astype(np.float32)
    return imgs, masks


def test_device_resident_matches_host():
    imgs, masks = _data()
    host = CompressionDataset(imgs, masks, batch_size=4, seed=3)
    dev = CompressionDataset(imgs, masks, batch_size=4, seed=3, device_resident=True)
    for bh, bd in zip(host.epoch(), dev.epoch()):
        np.testing.assert_array_equal(np.asarray(bh.image), np.asarray(bd.image))
        np.testing.assert_array_equal(np.asarray(bh.mask), np.asarray(bd.mask))
        np.testing.assert_array_equal(np.asarray(bh.bpp), np.asarray(bd.bpp))


def test_with_target_bpp_shares_device_arrays():
    imgs, masks = _data()
    dev = CompressionDataset(imgs, masks, batch_size=4, seed=3, device_resident=True)
    ft = dev.with_target_bpp(1.0)
    assert ft.device_resident and ft._dev_images is dev._dev_images
    for b in ft.epoch():
        assert bool(jnp.all(b.bpp == 1.0))
    # host path view works too
    host = CompressionDataset(imgs, masks, batch_size=4, seed=3)
    ft2 = host.with_target_bpp(0.1)
    assert not ft2.device_resident
    for b in ft2.epoch():
        assert bool(jnp.all(b.bpp == 0.1))
