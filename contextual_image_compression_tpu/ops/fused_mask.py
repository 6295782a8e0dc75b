"""Fused smooth-mask Pallas kernel: bilateral(9,75,75) -> Gaussian 31x31 ->
max-normalize, one HBM read + one write per image.

This is the BASELINE.json fusion target ('fuses mask generation ... into one
Pallas pass'): the jnp path performs ~130 full-image HBM passes (69 disk-masked
bilateral taps + 62 separable Gaussian taps + reductions) per mask; at 256x256 a
whole image is only 256 KB, so the kernel keeps it resident in VMEM and does all
windowed arithmetic on-chip. Numerics match ops/masks.create_saliency_mask's
smooth path (same per-stage reflect padding) to fp32 accumulation-order noise,
which itself matches cv2 to ~1e-4 (reference: GAN_functions.py:198-203).

Mosaic constraints and measured costs shape the implementation:
  * lax.rev is not lowered -> reflect padding is built from statically-unrolled
    reversed slices;
  * dynamic-offset vector loads are not lowered at these shapes -> all tap
    offsets are STATIC unrolls;
  * lane-offset (column-shifted) vector reads are the expensive primitive on
    this VPU (measured: a lane-offset column-pass formulation was 30% slower
    than transpose-trick column passes) -> the bilateral precomputes its 9
    dx-shifted planes once (8 lane rotations total instead of 61 per-tap ones)
    and separable column passes use the transpose trick;
  * taps accumulate in SSA registers in chunks of 8 before each scratch-ref
    flush: bounds both the live temporary set (a full SSA chain blew the 16 MB
    scoped budget) and the accumulator's read-modify-write traffic;
  * the bilateral range weight uses exp's 1st-order Taylor: inputs are [0,1]
    maps so |color_coeff*diff^2| <= ~8.9e-5 and the dropped terms (~4e-9) are
    far below the cv2 parity tolerance, while the 69-tap loop runs FMAs only;
  * box-filter row sums build incrementally across the 6 center-surround
    scales (13 row taps instead of 48).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contextual_image_compression_tpu.ops.image_ops import gaussian_kernel_1d

_CHUNK = 8


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _reflect_pad_rows(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 on the first axis only (statically unrolled)."""
    h = x.shape[0]
    rows = [x[i : i + 1, :] for i in range(pad, 0, -1)]
    rows.append(x)
    rows.extend(x[h - 1 - i : h - i, :] for i in range(1, pad + 1))
    return jnp.concatenate(rows, axis=0)


def _reflect_pad_cols(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 on the second axis only (statically unrolled)."""
    w = x.shape[1]
    cols = [x[:, i : i + 1] for i in range(pad, 0, -1)]
    cols.append(x)
    cols.extend(x[:, w - 1 - i : w - i] for i in range(1, pad + 1))
    return jnp.concatenate(cols, axis=1)


def _reflect_pad2(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 on both axes."""
    return _reflect_pad_cols(_reflect_pad_rows(x, pad), pad)


def _separable(src, weights, tr_ref, h, w, scale=None, dt=jnp.float32):
    """Separable 2D filter on (h, w): each pass shifts along the sublane axis
    of a row-padded scratch; the column pass transposes in and out (cheaper
    than lane-offset reads on this VPU). `weights` is a static Python list;
    taps accumulate chunked-SSA. Requires the scratch to fit both (h+2p, w)
    and (w+2p, h)."""
    k = len(weights)
    pad = k // 2

    def rows_pass(t, hh, ww):
        outv = jnp.zeros((hh, ww), dt)
        for c0 in range(0, k, _CHUNK):
            acc = jnp.zeros((hh, ww), dt)
            for i in range(c0, min(c0 + _CHUNK, k)):
                acc = acc + jnp.asarray(weights[i], dt) * t[i : i + hh, 0:ww]
            outv = outv + acc
        return outv

    tr_ref[0 : h + 2 * pad, 0:w] = _reflect_pad_rows(src, pad)
    rowout = rows_pass(tr_ref, h, w)
    tr_ref[0 : w + 2 * pad, 0:h] = _reflect_pad_rows(rowout.T, pad)
    out = rows_pass(tr_ref, w, h).T
    if scale is not None:
        out = out * scale
    return out


def _bilateral(x, xp_ref, xs_ref, h, w, radius, color_coeff, space_coeff,
               dt=jnp.float32):
    """Disk-masked bilateral with Taylor range kernel. xp_ref holds the
    2D-reflect-padded input; xs_ref (2*radius+1, h+2*radius, w) caches the
    dx-shifted planes so the 69-tap loop issues only cheap sublane-offset
    reads (one lane rotation per dx instead of per tap)."""
    xp_ref[:, :] = _reflect_pad2(x, radius)
    for dx in range(-radius, radius + 1):
        xs_ref[dx + radius] = xp_ref[:, dx + radius : dx + radius + w]
    taps = [
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if dy * dy + dx * dx <= radius * radius  # cv2 disk mask
    ]
    num = jnp.zeros((h, w), dt)
    den = jnp.zeros((h, w), dt)
    for c0 in range(0, len(taps), _CHUNK):
        acc_n = jnp.zeros((h, w), dt)
        acc_d = jnp.zeros((h, w), dt)
        for dy, dx in taps[c0 : c0 + _CHUNK]:
            sw = jnp.asarray(math.exp(space_coeff * (dy * dy + dx * dx)), dt)
            swc = jnp.asarray(
                math.exp(space_coeff * (dy * dy + dx * dx)) * color_coeff, dt
            )
            shifted = xs_ref[dx + radius, dy + radius : dy + radius + h, :]
            diff = shifted - x
            # exp Taylor (see module doc); 1st order suffices: the dropped
            # 2nd-order term is <= 0.5*(8.9e-5)^2 ~ 4e-9. Folding sw into the
            # coefficient keeps the tap at 5 VPU slots.
            wgt = sw + swc * (diff * diff)
            acc_n = acc_n + wgt * shifted
            acc_d = acc_d + wgt
        num = num + acc_n
        den = den + acc_d
    # divide in f32 (also: bf16 has too few mantissa bits for the ratio)
    return (num.astype(jnp.float32) / jnp.maximum(den.astype(jnp.float32), 1e-20))


def _normalize_max(out):
    # comparisons and the max-divide run in f32 (bf16 compares are unsupported
    # on this target and the ratio needs the mantissa)
    out = out.astype(jnp.float32)
    mx = jnp.max(out)
    return jnp.where(mx > 0, out / jnp.maximum(mx, 1e-12), out)


def _make_kernel(h: int, w: int, d: int, sigma_color: float, sigma_space: float,
                 gauss_ksize: int, dt=jnp.float32):
    radius = d // 2
    color_coeff = -0.5 / (sigma_color * sigma_color)
    space_coeff = -0.5 / (sigma_space * sigma_space)
    gk = [float(v) for v in gaussian_kernel_1d(gauss_ksize, 0.0)]

    def kernel(x_ref, o_ref, xp_ref, xs_ref, tr_ref):
        x = x_ref[0].astype(dt)  # (H, W)
        y = _bilateral(x, xp_ref, xs_ref, h, w, radius, color_coeff, space_coeff,
                       dt=dt).astype(dt)
        out = _separable(y, gk, tr_ref, h, w, dt=dt)
        o_ref[0] = _normalize_max(out)

    return kernel


def _make_contextual_kernel(h: int, w: int, scales, spectral_weight: float,
                            fine_weight: float, d: int, sigma_color: float,
                            sigma_space: float, gauss_ksize: int,
                            dt=jnp.float32, spec_small: bool = False):
    """Full contextual-mask fusion: fine-grained saliency (box-filter
    center-surround, reference: GAN_functions.py:52-121 'fine_grained') +
    combined-weighting (reference :94-98) + the smooth-mask chain -- one HBM
    read of (gray, spectral), one mask write.

    spec_small=True: the spectral map arrives at its native 64^2 resolution
    together with the two linear-upsample operator matrices, and the upsample
    runs as two in-VMEM f32 matmuls -- skipping the (B, H, W) f32 spectral
    round trip through HBM that the full-size form pays."""
    radius = d // 2
    color_coeff = -0.5 / (sigma_color * sigma_color)
    space_coeff = -0.5 / (sigma_space * sigma_space)
    gk = [float(v) for v in gaussian_kernel_1d(gauss_ksize, 0.0)]

    def kernel(gray_ref, spec_ref, *refs):
        if spec_small:
            uph_ref, upwt_ref, o_ref, xp_ref, xs_ref, tr_ref, tc_ref = refs
        else:
            o_ref, xp_ref, xs_ref, tr_ref, tc_ref = refs
        g = (gray_ref[0] * (1.0 / 255.0)).astype(dt)  # (H, W) in [0,1]

        # ---- fine-grained: center-surround on/off over box scales -----------
        # Row sums build INCREMENTALLY across scales (window 2r+1 = window
        # 2r-1 plus two taps): 13 row taps total for scales 1..6 instead of 48.
        rmax = max(scales)
        tr_ref[0 : h + 2 * rmax, 0:w] = _reflect_pad_rows(g, rmax)
        fine = jnp.zeros((h, w), dt)
        rs = tr_ref[rmax : rmax + h, 0:w]  # running row sum (window 1)
        for r in range(1, rmax + 1):
            rs = (
                rs
                + tr_ref[rmax - r : rmax - r + h, 0:w]
                + tr_ref[rmax + r : rmax + r + h, 0:w]
            )
            if r not in scales:
                continue
            k = 2 * r + 1
            tc_ref[0 : w + 2 * r, 0:h] = _reflect_pad_rows(rs.T, r)
            cs = jnp.zeros((w, h), dt)
            for c0 in range(0, k, _CHUNK):
                acc = jnp.zeros((w, h), dt)
                for i in range(c0, min(c0 + _CHUNK, k)):
                    acc = acc + tc_ref[i : i + w, 0:h]
                cs = cs + acc
            surround = cs.T * jnp.asarray(1.0 / (k * k), dt)
            # |g - s| == relu(g-s) + relu(s-g): on+off in one op
            fine = fine + jnp.abs(g - surround)
        fine = _normalize_max(fine)

        # ---- combined = 0.6*spectral + 0.4*fine, max-normalized --------------
        if spec_small:
            t = jax.lax.dot(
                uph_ref[...], spec_ref[0], preferred_element_type=jnp.float32
            )  # (H, r)
            spec = jax.lax.dot(
                t, upwt_ref[...], preferred_element_type=jnp.float32
            )  # (H, W)
        else:
            spec = spec_ref[0]
        comb = _normalize_max(
            spectral_weight * spec + fine_weight * fine
        ).astype(dt)

        # ---- bilateral(9, 75, 75) -> Gaussian 31x31 -> max-normalize ---------
        y = _bilateral(comb, xp_ref, xs_ref, h, w, radius, color_coeff,
                       space_coeff, dt=dt).astype(dt)
        o_ref[0] = _normalize_max(_separable(y, gk, tr_ref, h, w, dt=dt))

    return kernel


def _scratches(h: int, w: int, radius: int, gpad: int, extra: bool = False,
               dt=jnp.float32):
    m = max(h, w)
    out = [
        pltpu.VMEM((h + 2 * radius, w + 2 * radius), dt),  # xp
        pltpu.VMEM((2 * radius + 1, h + 2 * radius, w), dt),  # dx planes
        pltpu.VMEM((m + 2 * gpad, m), dt),  # rows-padded (both passes)
    ]
    if extra:  # contextual kernel: box col-pass scratch alongside the row sums
        out.append(pltpu.VMEM((m + 2 * gpad, m), dt))
    return out


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
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused fine-grained saliency + combine + smooth mask for (B, H, W) gray
    images in [0,255] and precomputed (B, H, W) spectral maps.

    compute_dtype=bfloat16 runs the windowed passes at bf16; normalizations,
    divisions, and the output stay f32. Measured on v5e: SLOWER than f32
    (34.0k vs 49.3k img/s at b128) -- bf16 raw FMA chains are ~1.6x faster on
    this VPU, but the kernel's transposes and (h+2p, w) scratch stores pay
    bf16's (16, 128) tiling overheads, which dominate. Mask deviation vs f32
    is ~2e-2, measured < 0.001 dB PSNR impact on the trained codec. Kept as
    the record of the experiment; default float32.
    """
    b, h, w = gray255.shape
    radius = d // 2
    gpad = gauss_ksize // 2
    # Small-spec form: a (B, r, r) spectral map (r != image size) upsamples
    # INSIDE the kernel via the two linear operator matrices.
    spec_small = spectral.shape[-2:] != (h, w)
    kernel = _make_contextual_kernel(
        h, w, tuple(scales), spectral_weight, fine_weight, d, sigma_color,
        sigma_space, gauss_ksize, dt=compute_dtype, spec_small=spec_small,
    )
    in_specs = [
        pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [gray255.astype(jnp.float32)]
    if spec_small:
        from contextual_image_compression_tpu.ops.saliency import (
            _resize_op_matrix,
        )

        r = spectral.shape[-1]
        in_specs += [
            pl.BlockSpec((1, r, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += [
            spectral.astype(jnp.float32),
            _resize_op_matrix(r, h),
            _resize_op_matrix(r, w).T,
        ]
    else:
        in_specs.append(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(spectral.astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=_scratches(h, w, radius, gpad, extra=True, dt=compute_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=not _on_tpu(),
    )(*args)


def smooth_mask_pallas(
    saliency: jnp.ndarray,
    d: int = 9,
    sigma_color: float = 75.0,
    sigma_space: float = 75.0,
    gauss_ksize: int = 31,
) -> jnp.ndarray:
    """Fused smooth mask for (B, H, W) saliency maps; interpret mode off-TPU."""
    if saliency.ndim == 2:
        return smooth_mask_pallas(saliency[None], d, sigma_color, sigma_space,
                                  gauss_ksize)[0]
    b, h, w = saliency.shape
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
        scratch_shapes=_scratches(h, w, radius, gpad),
        compiler_params=pltpu.CompilerParams(
            # Mosaic stack-allocates unrolled temporaries without full reuse;
            # raise the scoped-vmem budget above the 16 MB default (v5e has
            # 64+ MB of physical VMEM).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=not _on_tpu(),
    )(saliency.astype(jnp.float32))
