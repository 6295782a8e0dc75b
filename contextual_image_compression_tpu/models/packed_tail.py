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


def planar_to_s2d4(yall: jnp.ndarray, cout: int) -> jnp.ndarray:
    """Phase-planar deconv output -> space-to-depth(4) of the SAME-padded pixels.

    yall: (B, H+1, W+1, 4*Cout) for a virtual pixel tensor z of (2H, 2W, Cout).
    Returns zs (B, H/2+1, W/2+1, 16*Cout): the s2d(4) view of
    z' = pad(z, ((1, 3), (1, 3))) -- the left/top-1 pad is the SAME padding of
    the following 4x4/s1 conv, absorbed into the layout pass so that conv
    becomes a 2x2 VALID conv over blocks. Packed channel (p, q, c) at block
    (T, S) holds z'[4T+p, 4S+q, c].

    Derivation: z'[t] = z[t-1]; z[2m+a] = yall[m+a] (slab a). With t = 4T+p:
    a = (p+1) % 2 and the planar row index m+a = 2T + (p >= 2). Rows 2T+d,
    d in {0,1} are exactly a space-to-depth(2) of yall padded by one row/col,
    so the whole map is one s2d plus a static channel permutation; boundary
    entries falling outside z (t=0 and t > 2H) are masked to the pad value 0.
    """
    b, hp1, wp1, c4 = yall.shape
    h = hp1 - 1  # deconv input height; virtual z is (2H, 2W)
    assert c4 == 4 * cout and h % 2 == 0
    nb = h // 2 + 1  # blocks per side

    ypad = jnp.pad(yall, ((0, 0), (0, 1), (0, 1), (0, 0)))  # (B, H+2, W+2, 4C)
    f2 = (
        ypad.reshape(b, nb, 2, nb, 2, c4)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, nb, nb, 4 * c4)
    )  # channel (dr, dc, slab(a,b), c)

    perm = np.empty(16 * cout, np.int32)
    for p in range(4):
        for q in range(4):
            dr, dc = int(p >= 2), int(q >= 2)
            a, bb = (p + 1) % 2, (q + 1) % 2
            src = ((dr * 2 + dc) * 4 + (a * 2 + bb)) * cout
            dst = (p * 4 + q) * cout
            perm[dst : dst + cout] = np.arange(src, src + cout, dtype=np.int32)
    zs = f2[..., jnp.asarray(perm)]

    # Zero the entries that are padding in z': row t=4T+p is valid iff
    # 1 <= t <= 2H, i.e. NOT (T==0 and p==0) and NOT (T==nb-1 and p>=1).
    rows_ok = np.ones((nb, 4), bool)
    rows_ok[0, 0] = False
    rows_ok[nb - 1, 1:] = False
    row_mask = jnp.asarray(
        np.repeat(rows_ok, 4 * cout, axis=1).reshape(1, nb, 1, 16 * cout)
    )  # channel (p, q, c): repeat over (q, c)
    col_ok = np.ones((nb, 4, 4, cout), bool)
    col_ok[0, :, 0, :] = False
    col_ok[nb - 1, :, 1:, :] = False
    col_mask = jnp.asarray(col_ok.reshape(1, 1, nb, 16 * cout))
    return jnp.where(row_mask & col_mask, zs, jnp.zeros((), zs.dtype))


def packed_conv4x4s1(zs: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray):
    """4x4/s1 SAME conv evaluated in the s2d(4) packed domain.

    zs: (B, NB, NB, 16*Cin) from planar_to_s2d4 (already left/top shifted, so
    the conv is 2x2 VALID over blocks). kernel: (4, 4, Cin, Cout); returns the
    packed output (B, NB-1, NB-1, 16*Cout) with channel layout (u, v, o).
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    # w_blk[R,S][(p,q,c)][(u,v,o)] = kernel[4R+p-u, 4S+q-v, c, o] when the tap
    # offset lands inside the 4x4 kernel; 0 otherwise. One vectorized gather.
    idx = np.zeros((2, 4, 4), np.int32)  # [R, p, u] -> clipped dy
    ok = np.zeros((2, 4, 4), bool)
    for r in range(2):
        for p in range(4):
            for u in range(4):
                dy = 4 * r + p - u
                ok[r, p, u] = 0 <= dy <= 3
                idx[r, p, u] = min(max(dy, 0), 3)
    dy_i = jnp.asarray(idx)[:, :, :, None, None, None]
    dx_i = jnp.asarray(idx)[None, None, None, :, :, :]
    mask = jnp.asarray(ok[:, :, :, None, None, None] & ok[None, None, None])
    w = kernel[dy_i, dx_i]  # (R, p, u, S, q, v, Cin, Cout)
    w = jnp.where(mask[..., None, None], w, jnp.zeros((), kernel.dtype))
    w_blk = w.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(2, 2, 16 * cin, 16 * cout)
    y = jax.lax.conv_general_dilated(
        zs, w_blk, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
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
    yall = deconv4x4s2_planar(x, deconv_kernel)
    yall = yall + tile_phases(deconv_bias).astype(yall.dtype)
    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + bn_eps)
    scale = (bn_scale.astype(jnp.float32) * inv).astype(yall.dtype)
    shift = (
        bn_bias.astype(jnp.float32) - bn_mean.astype(jnp.float32) * bn_scale.astype(jnp.float32) * inv
    ).astype(yall.dtype)
    yall = yall * tile_phases(scale) + tile_phases(shift)
    yall = jnp.where(yall >= 0, yall, leaky_slope * yall)
    zs = planar_to_s2d4(yall, cmid)
    y = packed_conv4x4s1(zs, out_kernel.astype(zs.dtype), out_bias)
    return depth_to_space4(jnp.tanh(y), cout)
