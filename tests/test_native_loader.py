"""Native multithreaded JPEG/PNG loader: correctness vs the cv2 path, error
handling, and the load_folder_gan fast path."""

import os

import numpy as np
import pytest

from contextual_image_compression_tpu import native
from contextual_image_compression_tpu.data import images as I


pytestmark = pytest.mark.skipif(
    not native.loader_available(), reason="no C++ toolchain / image libs"
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    orig = I.synthetic_images(6, (48, 48), seed=3)
    paths = []
    for i, img in enumerate(orig):
        p = str(tmp / (f"{i}.jpg" if i % 2 == 0 else f"{i}.png"))
        I.save_image(img, p)
        paths.append(p)
    (tmp / "bad.jpg").write_bytes(b"not an image")
    return tmp, paths


def test_matches_cv2_path(image_dir):
    _, paths = image_dir
    batch, ok = native.load_images(paths, (48, 48), "gan")
    assert ok.all()
    for i in (0, 1, 3):
        ref = I.load_and_preprocess_image(paths[i], (48, 48))
        np.testing.assert_allclose(batch[i], ref, atol=1e-4)


def test_resize_matches_cv2(image_dir):
    _, paths = image_dir
    batch, ok = native.load_images(paths[:2], (32, 24), "gan")  # W=32, H=24
    assert batch.shape == (2, 24, 32, 3)
    for i in range(2):
        ref = I.load_and_preprocess_image(paths[i], (32, 24))
        np.testing.assert_allclose(batch[i], ref, atol=0.05)  # bilinear rounding


def test_unit_normalization(image_dir):
    _, paths = image_dir
    batch, _ = native.load_images(paths[:1], (48, 48), "unit")
    assert batch.min() >= 0.0 and batch.max() <= 1.0


def test_bad_and_missing_files(image_dir):
    tmp, paths = image_dir
    all_paths = paths + [str(tmp / "bad.jpg"), str(tmp / "missing.jpg")]
    batch, ok = native.load_images(all_paths, (48, 48), "gan")
    assert ok[: len(paths)].all()
    assert not ok[-2] and not ok[-1]
    np.testing.assert_array_equal(batch[-1], 0.0)  # failed slots zero-filled


def test_load_folder_gan_fast_path(image_dir):
    tmp, paths = image_dir
    imgs, names, sizes = I.load_folder_gan(str(tmp), (48, 48))
    assert imgs.shape[0] == len(paths)  # bad.jpg excluded
    assert len(names) == len(sizes) == len(paths)
    # same result as the cv2 path
    imgs2, names2, _ = I.load_folder_gan(str(tmp), (48, 48), use_native=False)
    assert names == names2
    np.testing.assert_allclose(imgs, imgs2, atol=1e-4)
