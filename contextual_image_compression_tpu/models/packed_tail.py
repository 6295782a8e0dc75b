"""MXU-packed lowering of the generator tail (deconv4 -> BN -> LeakyReLU ->
out_conv -> tanh) for inference.

Why: the reference generator (GAN_functions.py:253-273) ends in a
ConvTranspose(32, 4, s2) and a Conv(3, 4, s1). On TPU the MXU processes output
channels along a 128-wide lane axis, so Cout=32 runs at 25% lane utilization
and Cout=3 at ~2.3% -- these two layers dominate the codec forward despite
holding a small fraction of its useful MACs. This module computes the SAME
function (exact up to float reassociation) in a packed layout:

  * deconv4 is lowered as ONE stride-1 2x2 convolution emitting all four
    polyphase outputs as 4*Cout=128 planar channels (full lanes, and no
    input-dilated conv with 3/4 structural-zero taps).
  * BatchNorm (inference statistics) + LeakyReLU apply per packed channel with
    phase-tiled parameters -- numerically identical to the pixel layout.
  * the final 4x4 conv consumes a space-to-depth(4) view of the (virtual)
    256x256x32 tensor, built directly from the planar phase tensor by one
    layout pass, and emits 4x4x3 = 48 packed output channels (37.5% lanes
    instead of 2.3%).
  * only the 3-channel result is depth-to-space'd back to pixels.

All steps are jnp/XLA ops (convs + layout passes); parameters are the SAME
pytree as the native path (kernel (4,4,Cin,Cout), bias, BN scale/bias/stats),
so checkpoints are interchangeable. Train-mode BN needs pixel-layout batch
statistics, so this path is inference-only (the caller falls back to the
native lowering when train=True).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Polyphase tap split of a 4x4 stride-2 ConvTranspose kernel: output phase a
# (row parity) uses kernel rows (0,2) when a==0 and (1,3) when a==1; likewise
# for columns (derivation in models/layers.py::_PolyphaseConvT4x4s2).
_PHASE_TAPS = {0: (0, 2), 1: (1, 3)}


def deconv_wbig(kernel: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, Cin, Cout) ConvTranspose kernel -> (2, 2, Cin, 4*Cout) polyphase
    tap-split kernel, slab-major (slab = a*2+b)."""
    subs = []
    for a in (0, 1):
        for b in (0, 1):
            sub = kernel[jnp.asarray(_PHASE_TAPS[a])][:, jnp.asarray(_PHASE_TAPS[b])]
            subs.append(sub)  # (2, 2, Cin, Cout)
    return jnp.concatenate(subs, axis=-1)


def deconv4x4s2_planar(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """4x4/s2 SAME ConvTranspose as one k2 VALID conv over the 1-padded input.

    x: (B, H, W, Cin); kernel: (4, 4, Cin, Cout) in the nn.ConvTranspose layout.
    Returns the phase-planar tensor yall (B, H+1, W+1, 4*Cout) whose channel
    slab k = a*2+b holds polyphase (a, b); the pixel-space output would be
    z[2i+a, 2j+b] = yall[i+a, j+b, slab(a, b)] (slices never materialized here).
    """
    wbig = deconv_wbig(kernel)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, wbig, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def tile_phases(v: jnp.ndarray, phases: int = 4) -> jnp.ndarray:
    """Per-channel vector (C,) -> packed-channel vector (phases*C,).

    Planar slab layout is (phase, c) channel-major, so a plain tile matches."""
    return jnp.tile(v, phases)


def boundary_masks(h: int, cmid: int):
    """Multiplicative masks zeroing the planar entries that fall outside the
    virtual pixel tensor when the strided packed conv reads them.

    The strided conv (packed_conv4x4s2_strided) reads yall row (m+a) for pixel
    row 2m+a of the SAME-padded z'. The only planar entries it can reach that
    correspond to out-of-range pixels are row 0 of the a=1 slabs (pixel -1) and
    row H of the a=0 slabs (pixel 2H) -- every other out-of-range read lands in
    the explicit zero pad. Same per column. Returns float32 (H+1, 4*C) row and
    column masks to multiply into yall (they fuse into the BN epilogue).
    """
    c4 = 4 * cmid
    row = np.ones((h + 1, c4), np.float32)
    col = np.ones((h + 1, c4), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            s = (a * 2 + b) * cmid
            if a == 1:
                row[0, s : s + cmid] = 0.0
            else:
                row[h, s : s + cmid] = 0.0
            if b == 1:
                col[0, s : s + cmid] = 0.0
            else:
                col[h, s : s + cmid] = 0.0
    return row, col


def strided_wstr(kernel: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, Cin, Cout) conv kernel -> (4, 4, 4*Cin, 16*Cout) strided packed
    kernel: w_str[dyp, dxp, slab(a,b)*Cin+c, (u*4+v)*Cout+o] =
    kernel[2*dyp+1-a-u, 2*dxp+1-b-v, c, o] where the tap offset is in range,
    0 otherwise (see packed_conv4x4s2_strided's derivation)."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    idx = np.zeros((4, 2, 4), np.int32)  # [dyp, a, u] -> clipped dy
    ok = np.zeros((4, 2, 4), bool)
    for dyp in range(4):
        for a in range(2):
            for u in range(4):
                dy = 2 * dyp + 1 - a - u
                ok[dyp, a, u] = 0 <= dy <= 3
                idx[dyp, a, u] = min(max(dy, 0), 3)
    dy_i = jnp.asarray(idx)[:, :, :, None, None, None]
    dx_i = jnp.asarray(idx)[None, None, None, :, :, :]
    mask = jnp.asarray(ok[:, :, :, None, None, None] & ok[None, None, None])
    w = kernel[dy_i, dx_i]  # (dyp, a, u, dxp, b, v, Cin, Cout)
    w = jnp.where(mask[..., None, None], w, jnp.zeros((), kernel.dtype))
    # -> (dyp, dxp, a, b, Cin, u, v, Cout): in-channels slab-major like yall
    return w.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(4, 4, 4 * cin, 16 * cout)


def s2d_wstr(kernel: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, Cin, Cout) conv kernel -> (2, 2, 16*Cin, 16*Cout) kernel applied
    k2/s1 VALID over the space-to-depth(2) view of the padded planar tensor.

    Same function as strided_wstr's stride-2 k4 read: tap (dy, dx) of the
    strided kernel reads ypad[2T+dy, 2S+dx]; the s2d view at (T+ry, S+rx)
    phase (py, px) holds ypad[2(T+ry)+py, 2(S+rx)+px], so dy = 2*ry+py maps
    each strided tap to exactly one (ry, rx, phase) cell. Trades the stride-2
    gather of a 128-channel tensor for a dense k2 read of 512 channels --
    fuller MXU input lanes per tap (experiment C, scripts/r3_perf_experiments)."""
    w_str = strided_wstr(kernel)  # (4, 4, 4*Cin, 16*Cout)
    c4, co16 = w_str.shape[2], w_str.shape[3]
    w = jnp.zeros((2, 2, 4, c4, co16), w_str.dtype)
    for dy in range(4):
        for dx in range(4):
            w = w.at[dy // 2, dx // 2, (dy % 2) * 2 + (dx % 2)].set(w_str[dy, dx])
    return w.reshape(2, 2, 4 * c4, co16)


def packed_conv4x4s2_s2d(yall: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray):
    """packed_conv4x4s2_strided's function via a space-to-depth(2) layout pass:
    pad the planar tensor one row/col, fold 2x2 planar blocks into channels
    ((B, (H+1)/2+..., 4*4*Cin)), then one k2/s1 VALID conv emits the same
    (B, H/2, W/2, 16*Cout) packed output. kernel: (4, 4, Cin, Cout)."""
    w = s2d_wstr(kernel)
    yp = jnp.pad(yall, ((0, 0), (0, 1), (0, 1), (0, 0)))
    b, hp, wp, c4 = yp.shape
    ys = (
        yp.reshape(b, hp // 2, 2, wp // 2, 2, c4)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, hp // 2, wp // 2, 4 * c4)
    )
    y = jax.lax.conv_general_dilated(
        ys, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + tile_phases(bias, 16).astype(y.dtype)


def packed_conv4x4s2_strided(
    yall: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    in_scales: jnp.ndarray | None = None,
    compute_dtype: jnp.dtype | None = None,
):
    """4x4/s1 SAME conv over the virtual pixels, as ONE stride-2 4x4 conv read
    directly from the (boundary-masked) phase-planar tensor -- no layout pass.

    yall: (B, H+1, W+1, 4*Cin) planar phases of z (2H, 2W, Cin), already
    boundary-masked. kernel: (4, 4, Cin, Cout). Returns (B, H/2, W/2, 16*Cout)
    with channel layout (u, v, o); depth_to_space4 restores pixels.

    in_scales: optional (4*Cin,) per-packed-channel dequantization scales for
    an int8-stored yall; they fold into the strided kernel's input-channel
    rows at trace time, and the int8->compute_dtype convert fuses into the
    conv's operand load (the dense_w8 lesson, models/layers.py) -- the planar
    tensor then crosses HBM at 1 byte/elem instead of 2.

    Derivation: the conv output at pixel (4T+u, 4S+v) reads z'[4T+u+dy, ...] =
    z[4T+u+dy-1] = yall[row 2T + dyp, slab a] with a = (u+dy+1) % 2 and
    dyp = (u+dy-1+a)/2; inverting, for each (dyp, a, u) there is at most one
    valid tap dy = 2*dyp+1-a-u. So a 4x4 kernel over yall padded by one
    row/col, applied with stride 2, covers every (T, u) at once.
    """
    w_str = strided_wstr(kernel)
    if in_scales is not None:
        cd = compute_dtype or kernel.dtype
        w_str = (
            w_str.astype(jnp.float32) * in_scales.astype(jnp.float32)[None, None, :, None]
        ).astype(cd)
        ypad = jnp.pad(yall, ((0, 0), (0, 1), (0, 1), (0, 0))).astype(cd)
    else:
        ypad = jnp.pad(yall, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        ypad, w_str, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + tile_phases(bias, 16).astype(y.dtype)


def fused_tail_pallas(
    x: jnp.ndarray,
    wbig: jnp.ndarray,
    shift: jnp.ndarray,
    w_str: jnp.ndarray,
    out_bias16: jnp.ndarray,
    leaky_slope: float = 0.2,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One Pallas kernel for the whole packed tail: polyphase deconv (BN folded
    into `wbig`/`shift`) -> LeakyReLU -> boundary masking -> strided packed
    out-conv -> +bias -> tanh. The phase-planar intermediate lives only in
    VMEM -- the XLA formulation writes/reads it through HBM (537 MB/batch at
    reference scale), which bounds that path at ~3 ms/branch.

    Layout: rows and columns are parity-blocked OUTSIDE the kernel by free
    reshapes (x: (B, H/2, 2, W/2, 2*Cin)), so every slice both compute stages
    take is static and contiguous -- Mosaic lowers no strided or dynamic
    accesses. The planar scratch is indexed [tau, delta, sigma, gamma*C4+slab]
    with planar row m = 2*tau+delta, col j = 2*sigma+gamma.

    x: (B, H, W, Cin) with H, W even; wbig: (2, 2, Cin, C4) from
    deconv4x4s2_planar's tap split (C4 = 4*Cmid, slab-major); shift: (C4,);
    w_str: (4, 4, C4, 16*Co) from packed_conv4x4s2_strided's index map;
    out_bias16: (16*Co,). Returns (B, H/2, W/2, 16*Co) packed output for
    depth_to_space4. Inference-only (no VJP).
    """
    b, h, w, cin = x.shape
    c4 = wbig.shape[-1]
    co16 = w_str.shape[-1]
    hh, ww = h // 2, w // 2
    dt = x.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # fp32 inputs need the 3-pass bf16 decomposition for fp32-level accuracy;
    # Mosaic rejects the fp32 contract precision on bf16 operands.
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x_r = x.reshape(b, hh, 2, ww, 2 * cin)
    shift2 = jnp.concatenate([shift, shift]).reshape(1, 2 * c4).astype(dt)
    bias2 = out_bias16.reshape(1, co16).astype(jnp.float32)

    # slab channel ranges for the boundary zeroing (slab = a*2 + b, each Cmid
    # wide; C4 = 4*Cmid). Rows: planar row 0 invalid for a=1 slabs {2,3},
    # row H invalid for a=0 slabs {0,1}; cols likewise with b.
    cmid = c4 // 4

    def kernel(x_ref, wbig_ref, shift_ref, wstr_ref, bias_ref, o_ref, yall_ref):
        yall_ref[...] = jnp.zeros((hh + 1, 2, ww + 1, 2 * c4), dt)

        # ---- stage A: polyphase deconv into the parity-blocked planar scratch
        # target planar row m = 2*tau+delta reads x row m+r-1; per (delta, r)
        # that is a fixed source parity and a contiguous tau range.
        #   (delta=0, r=0): src x_r[tau-1, 1], tau in [1, hh]
        #   (delta=0, r=1): src x_r[tau,   0], tau in [0, hh)
        #   (delta=1, r=0): src x_r[tau,   0], tau in [0, hh)
        #   (delta=1, r=1): src x_r[tau,   1], tau in [0, hh)
        row_map = {
            (0, 0): (1, hh + 1, -1, 1),  # (t0, t1, src_off, src_parity)
            (0, 1): (0, hh, 0, 0),
            (1, 0): (0, hh, 0, 0),
            (1, 1): (0, hh, 0, 1),
        }
        for delta in (0, 1):
            for r in (0, 1):
                t0, t1, off, par = row_map[(delta, r)]
                n = t1 - t0
                src = x_ref[0, t0 + off : t0 + off + n, par]  # (n, ww, 2*Cin)
                for gx in (0, 1):
                    # collapse to a single 2D matmul: Mosaic handles (M, K) x
                    # (K, N) far better than multi-free-dim dot_generals
                    a_blk = src[:, :, gx * cin : (gx + 1) * cin].reshape(
                        n * ww, cin
                    )
                    for s in (0, 1):
                        wmat = wbig_ref[r, s]  # (Cin, C4)
                        p = jax.lax.dot_general(
                            a_blk, wmat, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        ).astype(dt).reshape(n, ww, c4)
                        # col j = 2*sigma_x + gx + 1 - s
                        gt = (gx + 1 - s) % 2
                        s_t = (gx + 1 - s) // 2  # sigma offset
                        yall_ref[
                            t0:t1, delta, s_t : s_t + ww,
                            gt * c4 : (gt + 1) * c4,
                        ] += p

        # ---- shift + LeakyReLU + boundary zeroing -------------------------
        # bf16 comparisons are unsupported on this target: run the LeakyReLU
        # select in fp32 (one VPU pass either way)
        v = (yall_ref[...] + shift_ref[0][None, None, None, :]).astype(jnp.float32)
        yall_ref[...] = jnp.where(v >= 0, v, leaky_slope * v).astype(dt)
        z_row = jnp.zeros((ww + 1, 2 * cmid), dt)
        z_col = jnp.zeros((hh + 1, 2, cmid), dt)
        for g in (0, 1):
            base = g * c4
            # planar row 0: a=1 slabs; row H (tau=hh, delta=0): a=0 slabs
            yall_ref[0, 0, :, base + 2 * cmid : base + 4 * cmid] = z_row
            yall_ref[hh, 0, :, base : base + 2 * cmid] = z_row
        # col 0 (sigma=0, gamma=0): b=1 slabs; col W (sigma=ww, gamma=0): b=0
        for a in (0, 1):
            yall_ref[:, :, 0, (2 * a + 1) * cmid : (2 * a + 2) * cmid] = z_col
            yall_ref[:, :, ww, (2 * a) * cmid : (2 * a + 1) * cmid] = z_col
        # rows/cols never written by stage A hold act(shift) after the act
        # pass -- they are zero padding for stage B:
        yall_ref[hh, 1] = jnp.zeros((ww + 1, 2 * c4), dt)
        yall_ref[:, :, ww, c4 : 2 * c4] = jnp.zeros((hh + 1, 2, c4), dt)

        # ---- stage B: strided packed out-conv + bias + tanh ----------------
        acc = jnp.zeros((hh, ww, co16), jnp.float32)
        for dyp in range(4):
            for dxp in range(4):
                a_blk = yall_ref[
                    dyp // 2 : dyp // 2 + hh, dyp % 2,
                    dxp // 2 : dxp // 2 + ww,
                    (dxp % 2) * c4 : (dxp % 2 + 1) * c4,
                ].reshape(hh * ww, c4)
                acc = acc + jax.lax.dot_general(
                    a_blk, wstr_ref[dyp, dxp], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ).reshape(hh, ww, co16)
        o_ref[0] = jnp.tanh(acc + bias_ref[0][None, None, :]).astype(dt)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hh, 2, ww, 2 * cin), lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, 2, cin, c4), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4, c4, co16), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hh, ww, co16), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, co16), dt),
        scratch_shapes=[
            pltpu.VMEM((hh + 1, 2, ww + 1, 2 * c4), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_r, wbig.astype(dt), shift2, w_str.astype(dt), bias2)


def depth_to_space4(y: jnp.ndarray, cout: int) -> jnp.ndarray:
    """(B, NB, NB, 16*Cout) channel (u, v, o) -> (B, 4NB, 4NB, Cout) pixels."""
    b, nb, _, _ = y.shape
    y = y.reshape(b, nb, nb, 4, 4, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 4 * nb, 4 * nb, cout)


def packed_tail_forward(
    x: jnp.ndarray,
    deconv_kernel: jnp.ndarray,
    deconv_bias: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    out_kernel: jnp.ndarray,
    out_bias: jnp.ndarray,
    *,
    bn_eps: float = 1e-3,
    leaky_slope: float = 0.2,
    use_pallas: bool = False,
    int8_planar: bool = False,
    int8_sigma: float = 8.0,
) -> jnp.ndarray:
    """Full packed tail: deconv4 -> +bias -> BN(inference) -> LeakyReLU ->
    out_conv -> +bias -> tanh, identical numerics to the native pixel-space
    path (reference semantics: GAN_functions.py:266-273).

    use_pallas=True runs the single fused VMEM-resident Pallas kernel
    (fused_tail_pallas). Measured on v5e it LOSES to the two-XLA-conv
    formulation (7.2 vs 3.0 ms/branch at batch 128): the kernel's HBM input
    DMA tops out at ~200-450 GB/s depending on block shape, while XLA's conv
    fusions stream the same bytes at ~550 GB/s, so the saved intermediate
    round-trip cannot pay for the slower input path. Kept (tested, correct)
    as the record of that experiment and for future runtimes with faster
    Pallas DMA; default False."""
    if x.shape[1] != x.shape[2]:
        raise ValueError(
            "packed_tail_forward requires square spatial dims (boundary_masks "
            f"and depth_to_space4 derive both axes from H); got {x.shape[1]}x"
            f"{x.shape[2]}. Use generator_packed_tail=False for non-square "
            "img_size configs."
        )
    cmid = deconv_kernel.shape[-1]
    cout = out_kernel.shape[-1]
    # Fold BN (inference statistics) into the deconv weights and bias: the
    # per-channel scale multiplies the kernel's output-channel axis at trace
    # time, so no separate elementwise normalization pass exists at runtime.
    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + bn_eps)
    scale = bn_scale.astype(jnp.float32) * inv
    shift = (
        bn_bias.astype(jnp.float32)
        + (deconv_bias.astype(jnp.float32) - bn_mean.astype(jnp.float32)) * scale
    )
    folded_kernel = (deconv_kernel.astype(jnp.float32) * scale).astype(x.dtype)
    if use_pallas:
        y = fused_tail_pallas(
            x,
            deconv_wbig(folded_kernel),
            tile_phases(shift.astype(x.dtype)),
            strided_wstr(out_kernel.astype(x.dtype)),
            tile_phases(out_bias, 16),
            leaky_slope=leaky_slope,
        )
        return depth_to_space4(y, cout)
    yall = deconv4x4s2_planar(x, folded_kernel)
    yall = yall + tile_phases(shift.astype(yall.dtype))
    yall = jnp.where(yall >= 0, yall, leaky_slope * yall)
    row_m, col_m = boundary_masks(x.shape[1], cmid)
    yall = yall * jnp.asarray(row_m, yall.dtype)[None, :, None, :]
    yall = yall * jnp.asarray(col_m, yall.dtype)[None, None, :, :]
    if int8_planar:
        # Store the materialized planar tensor as int8: it is the largest
        # intermediate of the whole codec ((B, H+1, W+1, 4*Cmid) -- 537 MB at
        # b128 bf16) and BOTH tail convs are HBM-bound on it, so halving its
        # byte width buys real time (measured -0.745 ms/branch at b128 on v5e,
        # runs/r4_perf_experiments.log). Per-channel ranges come from the
        # folded BN statistics: when the running stats describe the data, the
        # post-fold channel c has mean bn_bias[c] (the BN output mean by
        # definition -- NOT shift[c], which adds the (deconv_bias - bn_mean)*
        # scale term and can be far smaller when the kernel-part running mean
        # opposes bn_bias) and std ~|bn_scale[c]|. The envelope centers on
        # max(|bn_bias|, |shift|) -- bn_bias for trained stats, shift for the
        # fresh-init case where the stats say nothing -- plus an
        # int8_sigma-sigma symmetric margin; the rare clipped outlier feeds a
        # tanh that saturates anyway. The quantize epilogue fuses into the
        # producer deconv; the dequant scales fold into the consumer kernel's
        # input rows; the int8->bf16 convert fuses into the conv operand load.
        amax = jnp.maximum(
            jnp.maximum(jnp.abs(bn_bias.astype(jnp.float32)), jnp.abs(shift))
            + float(int8_sigma) * jnp.abs(bn_scale.astype(jnp.float32)),
            1e-6,
        )
        q = jnp.clip(
            jnp.round(yall.astype(jnp.float32) * tile_phases(127.0 / amax)),
            -127.0, 127.0,
        ).astype(jnp.int8)
        q = jax.lax.optimization_barrier(q)
        y = packed_conv4x4s2_strided(
            q, out_kernel, out_bias,
            in_scales=tile_phases(amax / 127.0), compute_dtype=x.dtype,
        )
        return depth_to_space4(jnp.tanh(y), cout)
    # Materialize yall: without the barrier XLA fuses the producer deconv INTO
    # the strided conv and recomputes it per output tile (measured 4.1 ms vs
    # the two convs' ~2 ms separate).
    yall = jax.lax.optimization_barrier(yall)
    y = packed_conv4x4s2_strided(yall, out_kernel.astype(yall.dtype), out_bias)
    return depth_to_space4(jnp.tanh(y), cout)
