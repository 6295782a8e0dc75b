"""Batched image filtering primitives in pure JAX.

The reference delegates all of this to OpenCV's C++ on the host CPU, one image at a
time (cv2.GaussianBlur / cv2.bilateralFilter / cv2.resize -- reference:
GAN_functions.py:134-141, 198-203). Here every filter is a batched jnp op that runs
under jit on TPU, with semantics matched to OpenCV (kernel construction, BORDER_REFLECT_101
padding) so the two pipelines agree to float tolerance.

Shapes: saliency-map filters take (..., H, W) arrays; channel-wise image filters take
(..., H, W, C).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def opencv_gaussian_sigma(ksize: int) -> float:
    """OpenCV's derived sigma when sigma=0: 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    return 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8


# cv2.getGaussianKernel's fixed binomial kernels for small ksize with sigma <= 0.
_CV2_SMALL_GAUSSIAN = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
                np.float32),
    9: np.array([4, 13, 30, 51, 60, 51, 30, 13, 4], np.float32) / 256.0,
}


@functools.lru_cache(maxsize=64)
def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """1-D Gaussian kernel identical to cv2.getGaussianKernel for float inputs."""
    if sigma <= 0:
        if ksize in _CV2_SMALL_GAUSSIAN:
            return _CV2_SMALL_GAUSSIAN[ksize]
        sigma = opencv_gaussian_sigma(ksize)
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _reflect_pad_hw(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 padding on the last two axes (= numpy 'reflect')."""
    pad = [(0, 0)] * (x.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
    return jnp.pad(x, pad, mode="reflect")


def _conv_sep_axis(x: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Separable 1-D convolution along `axis` (last two axes are H, W).

    Implemented as a strided window dot so it lowers to a small number of fused
    VPU ops under XLA (no gather, static shapes).
    """
    k = kernel.shape[0]
    pad = k // 2
    if axis == -2 or axis == x.ndim - 2:
        xp = _reflect_pad_hw(x, pad, 0)
        out = jnp.zeros_like(x)
        for i in range(k):
            out = out + kernel[i] * jax.lax.slice_in_dim(xp, i, i + x.shape[-2], axis=-2)
        return out
    else:
        xp = _reflect_pad_hw(x, 0, pad)
        out = jnp.zeros_like(x)
        for i in range(k):
            out = out + kernel[i] * jax.lax.slice_in_dim(xp, i, i + x.shape[-1], axis=-1)
        return out


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur on the last two axes, cv2.GaussianBlur-compatible
    (sigma=0 -> OpenCV derived sigma; BORDER_REFLECT_101)."""
    kern = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    x = _conv_sep_axis(x, kern, axis=-2)
    x = _conv_sep_axis(x, kern, axis=-1)
    return x


def _box_axis_cumsum(x: jnp.ndarray, ksize: int, axis: int) -> jnp.ndarray:
    """Box mean along one axis via prefix sums: O(1) passes instead of O(k)."""
    pad = ksize // 2
    if axis == -2 or axis == x.ndim - 2:
        xp = _reflect_pad_hw(x, pad, 0)
    else:
        xp = _reflect_pad_hw(x, 0, pad)
    c = jnp.cumsum(xp, axis=axis)
    n = x.shape[axis]
    hi = jax.lax.slice_in_dim(c, ksize - 1, ksize - 1 + n, axis=axis)
    lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
    first = jax.lax.slice_in_dim(hi, 0, 1, axis=axis)
    rest = jax.lax.slice_in_dim(hi, 1, n, axis=axis) - jax.lax.slice_in_dim(
        lo, 0, n - 1, axis=axis
    )
    return jnp.concatenate([first, rest], axis=axis) / ksize


def box_filter(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Normalized box filter on the last two axes (BORDER_REFLECT_101).

    Large kernels use the prefix-sum formulation (constant HBM passes regardless
    of k -- the integral-image trick, which is also what OpenCV's fine-grained
    saliency uses); small kernels use direct taps for exactness.
    """
    if ksize >= 7:
        x = _box_axis_cumsum(x, ksize, axis=-2)
        return _box_axis_cumsum(x, ksize, axis=-1)
    kern = jnp.full((ksize,), 1.0 / ksize, dtype=x.dtype)
    x = _conv_sep_axis(x, kern, axis=-2)
    x = _conv_sep_axis(x, kern, axis=-1)
    return x


def bilateral_filter(
    x: jnp.ndarray,
    d: int = 9,
    sigma_color: float = 75.0,
    sigma_space: float = 75.0,
    unit_range: bool = False,
) -> jnp.ndarray:
    """Windowed bilateral filter on the last two axes, cv2.bilateralFilter semantics
    for float32 input (d x d neighborhood, gaussian space weight, gaussian range
    weight on intensity difference). Reference use: GAN_functions.py:134,200.

    unit_range=True asserts |shifted - x| <= 1 (e.g. the reference's [0,1]
    saliency maps): then |color_coeff * diff^2| <= 0.5/sigma_color^2 (~8.9e-5 at
    sigma 75) and exp(t) is replaced by its 2nd-order Taylor 1 + t + t^2/2,
    whose error (<|t|^3/6 ~ 1e-13) is far below the cv2 parity tolerance while
    removing the transcendental from the VPU inner loop (two FMAs instead).

    The unrolled shift formulation below stays fully vectorized on the VPU: for a 9x9
    window it is 81 fused multiply-adds over the image, which XLA fuses into a single
    pass; a Pallas variant is provided in `bilateral_filter_pallas` for large windows.
    """
    radius = d // 2
    # cv2 uses gauss_color_coeff = -0.5/sigma_color^2, gauss_space_coeff likewise.
    color_coeff = -0.5 / (sigma_color * sigma_color)
    space_coeff = -0.5 / (sigma_space * sigma_space)

    xp = _reflect_pad_hw(x, radius, radius)
    h, w = x.shape[-2], x.shape[-1]

    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            # cv2 includes only the disk of radius `radius` (space weight computed
            # from the full square window but masked by radius).
            r2 = dy * dy + dx * dx
            if r2 > radius * radius:
                continue
            shifted = jax.lax.slice(
                xp,
                [0] * (x.ndim - 2) + [dy + radius, dx + radius],
                list(x.shape[:-2]) + [dy + radius + h, dx + radius + w],
            )
            space_w = math.exp(space_coeff * r2)
            diff = shifted - x
            if unit_range:
                # The truncated-Taylor range kernel is only valid for
                # |diff| <= 1; clamp so an unnormalized caller degrades to a
                # saturated weight instead of a negative one.
                diff = jnp.clip(diff, -1.0, 1.0)
                t = color_coeff * diff * diff
                range_w = 1.0 + t * (1.0 + 0.5 * t)
            else:
                t = color_coeff * diff * diff
                range_w = jnp.exp(t)
            wgt = space_w * range_w
            num = num + wgt * shifted
            den = den + wgt
    return num / jnp.maximum(den, 1e-20)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 luma, identical to cv2.cvtColor(..., COLOR_RGB2GRAY).

    img: (..., H, W, 3) -> (..., H, W).
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of the last-two (or HWC) spatial axes via jax.image.

    Matches cv2.resize(INTER_LINEAR) up to boundary convention (half-pixel centers).
    """
    if img.ndim >= 3 and img.shape[-1] in (1, 3, 4) and img.ndim != 2:
        # (..., H, W, C)
        shape = img.shape[:-3] + (out_h, out_w, img.shape[-1])
    else:
        shape = img.shape[:-2] + (out_h, out_w)
    return jax.image.resize(img, shape, method="bilinear")


def normalize_minmax(x: jnp.ndarray, axes=(-2, -1), eps: float = 1e-12) -> jnp.ndarray:
    """Min-max normalize to [0, 1] per image over `axes`."""
    mn = jnp.min(x, axis=axes, keepdims=True)
    mx = jnp.max(x, axis=axes, keepdims=True)
    return (x - mn) / jnp.maximum(mx - mn, eps)


def normalize_max(x: jnp.ndarray, axes=(-2, -1), eps: float = 1e-12) -> jnp.ndarray:
    """Divide by per-image max if positive (reference: GAN_functions.py:97-98,202-203)."""
    mx = jnp.max(x, axis=axes, keepdims=True)
    return jnp.where(mx > 0, x / jnp.maximum(mx, eps), x)


# ---------------------------------------------------------------------------
# Normalization conventions (reference: GAN_functions.py:24-50, train_autoencoder.py:54)
# ---------------------------------------------------------------------------


def to_gan_range(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [-1, 1] (reference: GAN_functions.py:37)."""
    return (img_u8.astype(jnp.float32) - 127.5) / 127.5


def from_gan_range(img: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] float -> uint8 [0,255] (reference: GAN_functions.py:44; we round
    instead of truncating so the conversion round-trips exactly)."""
    return jnp.clip(jnp.round((img + 1.0) * 127.5), 0, 255).astype(jnp.uint8)


def to_unit_range(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 -> [0, 1] float (reference: train_autoencoder.py:54)."""
    return img_u8.astype(jnp.float32) / 255.0


def from_unit_range(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
