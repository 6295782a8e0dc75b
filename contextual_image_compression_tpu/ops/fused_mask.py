"""Fused smooth-mask Pallas kernel: bilateral(9,75,75) -> Gaussian 31x31 ->
max-normalize, one HBM read + one write per image.

This is the BASELINE.json fusion target ('fuses mask generation ... into one
Pallas pass'): the jnp path performs ~130 full-image HBM passes (69 disk-masked
bilateral taps + 62 separable Gaussian taps + reductions) per mask; at 256x256 a
whole image is only 256 KB, so the kernel keeps it resident in VMEM and does all
windowed arithmetic on-chip. Numerics match ops/masks.create_saliency_mask's
smooth path exactly (same per-stage reflect padding), which itself matches cv2 to
~1e-4 (reference: GAN_functions.py:198-203).

Mosaic constraints shape the implementation:
  * lax.rev is not lowered -> reflect padding is built from statically-unrolled
    reversed slices;
  * dynamic-offset vector loads are not lowered (neither lane nor sublane dim at
    these shapes) -> all tap offsets are STATIC unrolls;
  * a fully unrolled SSA accumulation chain keeps every tap's temporaries live and
    blows the 16 MB VMEM scoped budget -> accumulators live in VMEM scratch refs,
    with a store per tap bounding the live set to a handful of images.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contextual_image_compression_tpu.ops.image_ops import gaussian_kernel_1d


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _reflect_pad2(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 on both axes (statically unrolled; no lax.rev)."""
    h = x.shape[0]
    rows = [x[i : i + 1, :] for i in range(pad, 0, -1)]
    rows.append(x)
    rows.extend(x[h - 1 - i : h - i, :] for i in range(1, pad + 1))
    x = jnp.concatenate(rows, axis=0)
    w = x.shape[1]
    cols = [x[:, i : i + 1] for i in range(pad, 0, -1)]
    cols.append(x)
    cols.extend(x[:, w - 1 - i : w - i] for i in range(1, pad + 1))
    return jnp.concatenate(cols, axis=1)


def _reflect_pad_rows(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 on the first axis only (statically unrolled)."""
    h = x.shape[0]
    rows = [x[i : i + 1, :] for i in range(pad, 0, -1)]
    rows.append(x)
    rows.extend(x[h - 1 - i : h - i, :] for i in range(1, pad + 1))
    return jnp.concatenate(rows, axis=0)


def _make_kernel(h: int, w: int, d: int, sigma_color: float, sigma_space: float,
                 gauss_ksize: int):
    radius = d // 2
    color_coeff = -0.5 / (sigma_color * sigma_color)
    space_coeff = -0.5 / (sigma_space * sigma_space)
    gk = [float(v) for v in gaussian_kernel_1d(gauss_ksize, 0.0)]
    gpad = gauss_ksize // 2

    def kernel(x_ref, o_ref, xp_ref, num_ref, den_ref, t_ref):
        x = x_ref[0]  # (H, W)

        # ---- bilateral(9, 75, 75), disk window, static taps, ref-accumulated
        xp_ref[:, :] = _reflect_pad2(x, radius)
        num_ref[:, :] = jnp.zeros((h, w), jnp.float32)
        den_ref[:, :] = jnp.zeros((h, w), jnp.float32)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                r2 = dy * dy + dx * dx
                if r2 > radius * radius:  # cv2 disk mask
                    continue
                sw = math.exp(space_coeff * r2)
                shifted = xp_ref[dy + radius : dy + radius + h,
                                 dx + radius : dx + radius + w]
                diff = shifted - x
                wgt = sw * jnp.exp(color_coeff * diff * diff)
                num_ref[:, :] = num_ref[:, :] + wgt * shifted
                den_ref[:, :] = den_ref[:, :] + wgt
        y = num_ref[:, :] / jnp.maximum(den_ref[:, :], 1e-20)

        # ---- separable Gaussian 31x31 (sigma 5.0, cv2-derived), ref-accumulated
        # rows
        t_ref[0 : h + 2 * gpad, 0:w] = _reflect_pad_rows(y, gpad)
        num_ref[:, :] = jnp.zeros((h, w), jnp.float32)
        for i in range(gauss_ksize):
            num_ref[:, :] = num_ref[:, :] + gk[i] * t_ref[i : i + h, 0:w]
        # columns: transpose, same row trick, transpose back
        t_ref[0 : w + 2 * gpad, 0:h] = _reflect_pad_rows(num_ref[:, :].T, gpad)
        den_ref[:, :] = jnp.zeros((h, w), jnp.float32)  # reuse as (W,H)=(H,W) here
        for i in range(gauss_ksize):
            den_ref[:, :] = den_ref[:, :] + gk[i] * t_ref[i : i + w, 0:h]
        out = den_ref[:, :].T

        # ---- max-normalize (reference: GAN_functions.py:202-203) ------------
        mx = jnp.max(out)
        o_ref[0] = jnp.where(mx > 0, out / jnp.maximum(mx, 1e-12), out)

    return kernel


def _make_contextual_kernel(h: int, w: int, scales, spectral_weight: float,
                            fine_weight: float, d: int, sigma_color: float,
                            sigma_space: float, gauss_ksize: int):
    """Full contextual-mask fusion: fine-grained saliency (box-filter
    center-surround, reference: GAN_functions.py:52-121 'fine_grained') +
    combined-weighting (reference :94-98) + the smooth-mask chain -- one HBM
    read of (gray, spectral), one mask write."""
    radius = d // 2
    color_coeff = -0.5 / (sigma_color * sigma_color)
    space_coeff = -0.5 / (sigma_space * sigma_space)
    gk = [float(v) for v in gaussian_kernel_1d(gauss_ksize, 0.0)]
    gpad = gauss_ksize // 2

    def box_mean(src, r, t_ref, acc_ref):
        """(H, W) box mean with reflect padding, separable static unroll using
        the transpose trick for the column pass."""
        k = 2 * r + 1
        t_ref[0 : h + 2 * r, 0:w] = _reflect_pad_rows(src, r)
        acc_ref[:, :] = jnp.zeros((h, w), jnp.float32)
        for i in range(k):
            acc_ref[:, :] = acc_ref[:, :] + t_ref[i : i + h, 0:w]
        t_ref[0 : w + 2 * r, 0:h] = _reflect_pad_rows(acc_ref[:, :].T, r)
        acc_ref[:, :] = jnp.zeros((h, w), jnp.float32)  # holds (W, H); square-only
        for i in range(k):
            acc_ref[:, :] = acc_ref[:, :] + t_ref[i : i + w, 0:h]
        return acc_ref[:, :].T / float(k * k)

    def kernel(gray_ref, spec_ref, o_ref, xp_ref, num_ref, den_ref, t_ref):
        g = gray_ref[0] / 255.0  # (H, W) in [0,1]

        # ---- fine-grained: center-surround on/off over box scales -----------
        num_ref[:, :] = jnp.zeros((h, w), jnp.float32)  # on+off accumulator
        for r in scales:
            surround = box_mean(g, r, t_ref, den_ref)
            num_ref[:, :] = num_ref[:, :] + jnp.abs(g - surround)
            # |g - s| == relu(g-s) + relu(s-g): on+off in one op
        fine = num_ref[:, :]
        fmax = jnp.max(fine)
        fine = jnp.where(fmax > 0, fine / jnp.maximum(fmax, 1e-12), fine)

        # ---- combined = 0.6*spectral + 0.4*fine, max-normalized --------------
        comb = spectral_weight * spec_ref[0] + fine_weight * fine
        cmax = jnp.max(comb)
        comb = jnp.where(cmax > 0, comb / jnp.maximum(cmax, 1e-12), comb)

        # ---- bilateral(9, 75, 75) -------------------------------------------
        xp_ref[:, :] = _reflect_pad2(comb, radius)
        num_ref[:, :] = jnp.zeros((h, w), jnp.float32)
        den_ref[:, :] = jnp.zeros((h, w), jnp.float32)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                r2 = dy * dy + dx * dx
                if r2 > radius * radius:
                    continue
                sw = math.exp(space_coeff * r2)
                shifted = xp_ref[dy + radius : dy + radius + h,
                                 dx + radius : dx + radius + w]
                diff = shifted - comb
                wgt = sw * jnp.exp(color_coeff * diff * diff)
                num_ref[:, :] = num_ref[:, :] + wgt * shifted
                den_ref[:, :] = den_ref[:, :] + wgt
        y = num_ref[:, :] / jnp.maximum(den_ref[:, :], 1e-20)

        # ---- Gaussian 31x31 + max-normalize ----------------------------------
        t_ref[0 : h + 2 * gpad, 0:w] = _reflect_pad_rows(y, gpad)
        num_ref[:, :] = jnp.zeros((h, w), jnp.float32)
        for i in range(gauss_ksize):
            num_ref[:, :] = num_ref[:, :] + gk[i] * t_ref[i : i + h, 0:w]
        t_ref[0 : w + 2 * gpad, 0:h] = _reflect_pad_rows(num_ref[:, :].T, gpad)
        den_ref[:, :] = jnp.zeros((h, w), jnp.float32)
        for i in range(gauss_ksize):
            den_ref[:, :] = den_ref[:, :] + gk[i] * t_ref[i : i + w, 0:h]
        out = den_ref[:, :].T
        mx = jnp.max(out)
        o_ref[0] = jnp.where(mx > 0, out / jnp.maximum(mx, 1e-12), out)

    return kernel


def contextual_mask_pallas(
    gray255: jnp.ndarray,
    spectral: jnp.ndarray,
    scales=(1, 2, 3, 4, 5, 6),
    spectral_weight: float = 0.6,
    fine_weight: float = 0.4,
    d: int = 9,
    sigma_color: float = 75.0,
    sigma_space: float = 75.0,
    gauss_ksize: int = 31,
) -> jnp.ndarray:
    """Fused fine-grained saliency + combine + smooth mask for (B, H, W) gray
    images in [0,255] and precomputed (B, H, W) spectral maps. Square maps only.
    """
    b, h, w = gray255.shape
    if h != w:
        raise ValueError("contextual_mask_pallas requires square maps")
    radius = d // 2
    gpad = gauss_ksize // 2
    kernel = _make_contextual_kernel(
        h, w, tuple(scales), spectral_weight, fine_weight, d, sigma_color,
        sigma_space, gauss_ksize,
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * radius, w + 2 * radius), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((max(h, w) + 2 * gpad, max(h, w)), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=not _on_tpu(),
    )(gray255.astype(jnp.float32), spectral.astype(jnp.float32))


def smooth_mask_pallas(
    saliency: jnp.ndarray,
    d: int = 9,
    sigma_color: float = 75.0,
    sigma_space: float = 75.0,
    gauss_ksize: int = 31,
) -> jnp.ndarray:
    """Fused smooth mask for (B, H, W) saliency maps; interpret mode off-TPU.

    Note: the transpose trick reuses a square scratch, so H == W is required
    (both reference resolutions are square); non-square inputs fall back to the
    jnp path in the caller.
    """
    if saliency.ndim == 2:
        return smooth_mask_pallas(saliency[None], d, sigma_color, sigma_space,
                                  gauss_ksize)[0]
    b, h, w = saliency.shape
    if h != w:
        raise ValueError("smooth_mask_pallas requires square maps")
    radius = d // 2
    gpad = gauss_ksize // 2
    kernel = _make_kernel(h, w, d, sigma_color, sigma_space, gauss_ksize)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), saliency.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * radius, w + 2 * radius), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((max(h, w) + 2 * gpad, max(h, w)), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # Mosaic stack-allocates the unrolled taps' temporaries (~33 MB at
            # 256^2) without reuse; raise the scoped-vmem budget above the 16 MB
            # default (v5e has 64+ MB of physical VMEM).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=not _on_tpu(),
    )(saliency.astype(jnp.float32))
