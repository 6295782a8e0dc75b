#!/usr/bin/env python
"""Round-4 perf experiments: can the packed generator tail's remaining gap to
floor be bought with an int8 phase-planar intermediate?

Context (docs/PERF_NOTES.md): the two packed-tail convs measure 1.96 ms
(deconv4 planar, BW-bound at 74% of HBM roofline) + 1.05 ms (strided packed
out-conv, 48/128 output lanes) per branch at b128 bf16, against ~1.4 + ~0.5
floors. The planar intermediate `yall` (B, 129, 129, 128) bf16 = 537 MB/batch
crosses HBM twice (optimization_barrier write + strided-conv read). Storing it
int8 halves that traffic AND feeds the MXU an int8 operand.

Timed here (shapes = the codec tail at reference scale, batch 128):
  1. baseline: deconv4 planar (bf16) + barrier + strided out-conv (bf16)
  2. int8 planar: deconv4 + quantize epilogue (fixed per-channel scales,
     folded dequant into w_str's K rows) + barrier + strided conv reading int8
  3. the strided conv alone, bf16 vs int8 input operand
Accuracy probe: max abs error of the int8-planar tail vs bf16 on real-ish
activations, with per-channel scales calibrated on the batch itself.

Timing methodology of bench.py (chained data-dependent jitted calls, scalar
fetch, T(n)-T(1)).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from contextual_image_compression_tpu.models import packed_tail as pt


def timeit(fn, *args, iters=20):
    f = jax.jit(fn)

    def run(n):
        t0 = time.perf_counter()
        y = None
        x = args[0]
        for _ in range(n):
            x = f(x, *args[1:]) if y is None else f(x, *args[1:])
        float(jnp.ravel(x)[0])
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(iters) for _ in range(2))
    return (tn - t1) / (iters - 1) * 1e3  # ms


def main():
    b, h, cin, cmid, cout = 128, 128, 64, 32, 3
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, h, cin).astype(np.float32) * 0.5).astype(dt)
    k_deconv = jnp.asarray(rng.randn(4, 4, cin, cmid).astype(np.float32) * 0.05)
    k_out = jnp.asarray(rng.randn(4, 4, cmid, cout).astype(np.float32) * 0.05)
    bias_out = jnp.zeros((cout,), jnp.float32)
    # (cmid,) per-channel BN-folded shift; tile_phases expands it to the
    # packed (4*cmid,) planar layout.
    shift = jnp.asarray(rng.randn(cmid).astype(np.float32) * 0.1)

    w_str = pt.strided_wstr(k_out.astype(dt))

    # ---------------- 1. baseline tail (bf16 planar) -------------------------
    def tail_bf16(x):
        yall = pt.deconv4x4s2_planar(x, k_deconv.astype(dt))
        yall = yall + pt.tile_phases(shift.astype(dt))
        yall = jnp.where(yall >= 0, yall, 0.2 * yall)
        row_m, col_m = pt.boundary_masks(h, cmid)
        yall = yall * jnp.asarray(row_m, dt)[None, :, None, :]
        yall = yall * jnp.asarray(col_m, dt)[None, None, :, :]
        yall = jax.lax.optimization_barrier(yall)
        y = pt.packed_conv4x4s2_strided(yall, k_out.astype(dt), bias_out)
        y = jnp.tanh(y)
        # keep output shape == input shape for chaining: reduce to a scalar tap
        return x * 0.999 + jnp.mean(y).astype(dt) * 0.001

    t_base = timeit(tail_bf16, x)
    print(f"tail bf16 planar: {t_base:.3f} ms/branch")

    # ---------------- 2. int8 planar variant ---------------------------------
    # Fixed per-channel scales (calibrated once outside the jit in a real
    # deployment); dequant folds into w_str's K rows at trace time.
    def calib(x):
        yall = pt.deconv4x4s2_planar(x, k_deconv.astype(dt))
        yall = yall + pt.tile_phases(shift.astype(dt))
        yall = jnp.where(yall >= 0, yall, 0.2 * yall)
        return jnp.max(jnp.abs(yall.astype(jnp.float32)), axis=(0, 1, 2))

    s_c = np.asarray(jax.jit(calib)(x)) / 127.0  # (128,)
    s_c = np.maximum(s_c, 1e-8)
    w_str_deq = (
        w_str.astype(jnp.float32) * jnp.asarray(s_c, jnp.float32)[None, None, :, None]
    ).astype(dt)
    inv_s = jnp.asarray(1.0 / s_c, jnp.float32)

    def tail_int8(x):
        yall = pt.deconv4x4s2_planar(x, k_deconv.astype(dt))
        yall = yall + pt.tile_phases(shift.astype(dt))
        yall = jnp.where(yall >= 0, yall, 0.2 * yall)
        row_m, col_m = pt.boundary_masks(h, cmid)
        yall = yall * jnp.asarray(row_m, dt)[None, :, None, :]
        yall = yall * jnp.asarray(col_m, dt)[None, None, :, :]
        q = jnp.clip(
            jnp.round(yall.astype(jnp.float32) * inv_s), -127, 127
        ).astype(jnp.int8)
        q = jax.lax.optimization_barrier(q)
        ypad = jnp.pad(q, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            ypad.astype(dt), w_str_deq, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pt.tile_phases(bias_out, 16).astype(dt)
        y = jnp.tanh(y)
        return x * 0.999 + jnp.mean(y).astype(dt) * 0.001

    t_i8 = timeit(tail_int8, x)
    print(f"tail int8 planar (bf16 MACs, int8 HBM): {t_i8:.3f} ms/branch "
          f"({(t_base - t_i8):+.3f})")

    # ---------------- 3. strided conv alone, operand dtype sweep -------------
    yall_f = jax.jit(
        lambda x: jax.lax.optimization_barrier(
            pt.deconv4x4s2_planar(x, k_deconv.astype(dt))
        )
    )(x)
    yall_q = jnp.clip(
        jnp.round(yall_f.astype(jnp.float32) * inv_s), -127, 127
    ).astype(jnp.int8)

    def conv_bf16(y):
        ypad = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        out = jax.lax.conv_general_dilated(
            ypad, w_str, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y * 0.999 + jnp.mean(out).astype(y.dtype) * 0.001

    def conv_int8_in(y):
        ypad = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        out = jax.lax.conv_general_dilated(
            ypad.astype(dt), w_str_deq, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (y.astype(jnp.float32) * 0.999 + jnp.mean(out) * 0.001).astype(y.dtype)

    print(f"strided out-conv, bf16 input: {timeit(conv_bf16, yall_f):.3f} ms")
    print(f"strided out-conv, int8-stored input: {timeit(conv_int8_in, yall_q):.3f} ms")

    # ---------------- accuracy probe ----------------------------------------
    ref = jax.jit(tail_bf16)(x)
    got = jax.jit(tail_int8)(x)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"int8-planar tail max abs err vs bf16 (chained tap): {err:.3e}")


if __name__ == "__main__":
    main()
