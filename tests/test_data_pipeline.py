"""Input pipeline: mask precompute, epoch batching, bpp sampling
(reference semantics: GAN_train.py:78-126)."""

import numpy as np
import pytest

from contextual_image_compression_tpu.config import SaliencyConfig
from contextual_image_compression_tpu.data import images as image_io
from contextual_image_compression_tpu.data.pipeline import (
    CompressionDataset,
    prepare_masks,
)


@pytest.fixture(scope="module")
def data():
    imgs = image_io.synthetic_images(10, (64, 64), seed=0)
    masks = prepare_masks(imgs, SaliencyConfig(), device_batch=4)
    return imgs, masks


def test_prepare_masks_shapes_and_range(data):
    imgs, masks = data
    assert masks.shape == (10, 64, 64, 1)
    assert masks.min() >= 0.0 and masks.max() <= 1.0 + 1e-6


def test_epoch_batching(data):
    imgs, masks = data
    ds = CompressionDataset(imgs, masks, batch_size=4, seed=1)
    batches = list(ds.epoch())
    assert len(batches) == 2  # 10 // 4, drop remainder
    for b in batches:
        assert b.image.shape == (4, 64, 64, 3)
        assert b.mask.shape == (4, 64, 64, 1)
        assert b.bpp.shape == (4, 1)
        assert np.isin(
            np.asarray(b.bpp).ravel(), np.float32([0.1, 1.0, 2.0])
        ).all()


def test_fixed_bpp_mode(data):
    imgs, masks = data
    ds = CompressionDataset(imgs, masks, batch_size=4, target_bpp=1.0)
    b = next(ds.epoch())
    np.testing.assert_array_equal(np.asarray(b.bpp), 1.0)


def test_shuffling_changes_order(data):
    imgs, masks = data
    ds = CompressionDataset(imgs, masks, batch_size=10, drop_remainder=False, seed=2)
    b1 = next(ds.epoch())
    b2 = next(ds.epoch())
    assert not np.allclose(np.asarray(b1.image), np.asarray(b2.image))


def test_synthetic_images_properties():
    imgs = image_io.synthetic_images(3, (32, 32), seed=5)
    assert imgs.shape == (3, 32, 32, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    # deterministic
    np.testing.assert_array_equal(imgs, image_io.synthetic_images(3, (32, 32), seed=5))


def test_image_file_roundtrip(tmp_path):
    img = image_io.synthetic_images(1, (32, 32), seed=7)[0]
    path = str(tmp_path / "x.png")
    image_io.save_image(img, path)
    loaded = image_io.load_and_preprocess_image(path, (32, 32))
    np.testing.assert_allclose(loaded, img, atol=2 / 127.5)


def test_load_folder_gan(tmp_path):
    for i in range(3):
        image_io.save_image(
            image_io.synthetic_images(1, (16, 16), seed=i)[0], str(tmp_path / f"{i}.png")
        )
    imgs, names, sizes = image_io.load_folder_gan(str(tmp_path), (16, 16))
    assert imgs.shape == (3, 16, 16, 3)
    assert names == ["0.png", "1.png", "2.png"]
    assert all(s > 0 for s in sizes)
