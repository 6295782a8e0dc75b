"""Image quality metrics in pure JAX, batched and jittable.

Contracts (reference: GAN_functions.py:724-759, test_autoencoder.py:49-66):
- PSNR with explicit data_range (skimage.peak_signal_noise_ratio semantics).
- SSIM with skimage.structural_similarity default settings for float images:
  7x7 uniform window, K1=0.01, K2=0.03, sample covariance (N/(N-1)), valid-window
  cropping of the edge.
- GAN metrics convert from [-1,1] to [0,1] first and average per-RGB-channel SSIM
  (reference: GAN_functions.py:735-750); the AE evaluator uses grayscale SSIM
  (reference: test_autoencoder.py:59-66).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from contextual_image_compression_tpu.ops.image_ops import rgb_to_gray


def mse(a: jnp.ndarray, b: jnp.ndarray, axes=None) -> jnp.ndarray:
    d = a - b
    return jnp.mean(d * d, axis=axes)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0, axes=None) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB (skimage semantics)."""
    err = mse(a.astype(jnp.float32), b.astype(jnp.float32), axes=axes)
    return 10.0 * jnp.log10((data_range * data_range) / jnp.maximum(err, 1e-20))


def _uniform_filter_valid(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean over win x win windows, 'valid' extent, on the last two axes.

    Two separable direct window sums (win adds per axis). A cumsum formulation
    would be O(HW) regardless of win, but its long fp32 prefix sums lose ~1e-4 of
    precision through cancellation; for the small SSIM window the direct sum is
    both exact and cheap, and XLA fuses the shifted adds.
    """
    def along(arr, axis):
        n = arr.shape[axis]
        out = jax.lax.slice_in_dim(arr, 0, n - win + 1, axis=axis)
        for i in range(1, win):
            out = out + jax.lax.slice_in_dim(arr, i, n - win + 1 + i, axis=axis)
        return out

    s = along(along(x, -1), -2)
    return s / float(win * win)


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity for 2-D (grayscale) images on the last two axes.

    Matches skimage.structural_similarity defaults for float input
    (gaussian_weights=False, use_sample_covariance=True): batched over any
    leading axes, returns the mean SSIM over the valid-window crop.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    n = win_size * win_size
    cov_norm = n / (n - 1.0)

    ux = _uniform_filter_valid(a, win_size)
    uy = _uniform_filter_valid(b, win_size)
    uxx = _uniform_filter_valid(a * a, win_size)
    uyy = _uniform_filter_valid(b * b, win_size)
    uxy = _uniform_filter_valid(a * b, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    # skimage crops (win_size-1)//2 from each side of the *filtered* map; with the
    # valid-extent filter above the remaining crop is pad on each side.
    pad = (win_size - 1) // 2
    s = s[..., pad : s.shape[-2] - pad, pad : s.shape[-1] - pad]
    return jnp.mean(s, axis=(-2, -1))


def ssim_rgb_channel_mean(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Per-RGB-channel SSIM averaged (reference: GAN_functions.py:743-750).

    a, b: (..., H, W, 3).
    """
    vals = [ssim(a[..., c], b[..., c], data_range=data_range) for c in range(a.shape[-1])]
    return jnp.mean(jnp.stack(vals, axis=0), axis=0)


def gan_metrics(original: jnp.ndarray, compressed: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """PSNR/SSIM/MSE after [-1,1] -> [0,1] conversion (reference: GAN_functions.py:724-759).

    original, compressed: (..., H, W, 3) in [-1, 1]. Batched over leading axes.
    """
    o = (original + 1.0) / 2.0
    c = (compressed + 1.0) / 2.0
    return {
        "psnr": psnr(o, c, data_range=1.0, axes=(-3, -2, -1)),
        "ssim": ssim_rgb_channel_mean(o, c, data_range=1.0),
        "mse": mse(o, c, axes=(-3, -2, -1)),
    }


def estimate_compression_ratio(original_size, latent_size):
    """(compression_ratio, percentage_reduction) from byte sizes
    (reference: GAN_functions.py:809-823; unused there but part of the API)."""
    compression_ratio = original_size / latent_size
    percentage_reduction = (1.0 - latent_size / original_size) * 100.0
    return compression_ratio, percentage_reduction


def ae_metrics(original_u8: jnp.ndarray, compressed_u8: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """AE evaluation metrics on uint8 images: MSE on raw values, PSNR at data_range 255,
    grayscale SSIM (reference: test_autoencoder.py:49-66; grayscale via BGR2GRAY whose
    coefficients equal RGB2GRAY on the respective channel order -- we use luma of RGB).
    """
    o = original_u8.astype(jnp.float32)
    c = compressed_u8.astype(jnp.float32)
    return {
        "mse": mse(o, c, axes=(-3, -2, -1)),
        "psnr": psnr(o, c, data_range=255.0, axes=(-3, -2, -1)),
        "ssim": ssim(rgb_to_gray(o), rgb_to_gray(c), data_range=255.0),
    }
