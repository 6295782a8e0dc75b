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

# Polyphase tap split of a 4x4 stride-2 ConvTranspose kernel: output phase a
# (row parity) uses kernel rows (0,2) when a==0 and (1,3) when a==1; likewise
# for columns (derivation in models/layers.py::_PolyphaseConvT4x4s2).
_PHASE_TAPS = {0: (0, 2), 1: (1, 3)}


def deconv4x4s2_planar(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """4x4/s2 SAME ConvTranspose as one k2 VALID conv over the 1-padded input.

    x: (B, H, W, Cin); kernel: (4, 4, Cin, Cout) in the nn.ConvTranspose layout.
    Returns the phase-planar tensor yall (B, H+1, W+1, 4*Cout) whose channel
    slab k = a*2+b holds polyphase (a, b); the pixel-space output would be
    z[2i+a, 2j+b] = yall[i+a, j+b, slab(a, b)] (slices never materialized here).
    """
    cout = kernel.shape[-1]
    subs = []
    for a in (0, 1):
        for b in (0, 1):
            sub = kernel[jnp.asarray(_PHASE_TAPS[a])][:, jnp.asarray(_PHASE_TAPS[b])]
            subs.append(sub)  # (2, 2, Cin, Cout)
    wbig = jnp.concatenate(subs, axis=-1)  # (2, 2, Cin, 4*Cout)
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


def packed_conv4x4s2_strided(yall: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray):
    """4x4/s1 SAME conv over the virtual pixels, as ONE stride-2 4x4 conv read
    directly from the (boundary-masked) phase-planar tensor -- no layout pass.

    yall: (B, H+1, W+1, 4*Cin) planar phases of z (2H, 2W, Cin), already
    boundary-masked. kernel: (4, 4, Cin, Cout). Returns (B, H/2, W/2, 16*Cout)
    with channel layout (u, v, o); depth_to_space4 restores pixels.

    Derivation: the conv output at pixel (4T+u, 4S+v) reads z'[4T+u+dy, ...] =
    z[4T+u+dy-1] = yall[row 2T + dyp, slab a] with a = (u+dy+1) % 2 and
    dyp = (u+dy-1+a)/2; inverting, for each (dyp, a, u) there is at most one
    valid tap dy = 2*dyp+1-a-u. So a 4x4 kernel over yall padded by one
    row/col, applied with stride 2, covers every (T, u) at once.
    """
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
    w_str = w.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(4, 4, 4 * cin, 16 * cout)
    ypad = jnp.pad(yall, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        ypad, w_str, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + tile_phases(bias, 16).astype(y.dtype)


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
) -> jnp.ndarray:
    """Full packed tail: deconv4 -> +bias -> BN(inference) -> LeakyReLU ->
    out_conv -> +bias -> tanh, identical numerics to the native pixel-space
    path (reference semantics: GAN_functions.py:266-273)."""
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
    yall = deconv4x4s2_planar(x, folded_kernel)
    yall = yall + tile_phases(shift.astype(yall.dtype))
    yall = jnp.where(yall >= 0, yall, leaky_slope * yall)
    row_m, col_m = boundary_masks(x.shape[1], cmid)
    yall = yall * jnp.asarray(row_m, yall.dtype)[None, :, None, :]
    yall = yall * jnp.asarray(col_m, yall.dtype)[None, None, :, :]
    # Materialize yall: without the barrier XLA fuses the producer deconv INTO
    # the strided conv and recomputes it per output tile (measured 4.1 ms vs
    # the two convs' ~2 ms separate).
    yall = jax.lax.optimization_barrier(yall)
    y = packed_conv4x4s2_strided(yall, out_kernel.astype(yall.dtype), out_bias)
    return depth_to_space4(jnp.tanh(y), cout)
