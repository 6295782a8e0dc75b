#!/usr/bin/env python
"""Round-3 experiment E: WEIGHT-ONLY int8 for the four giant dense layers.

docs/PERF_NOTES.md's op budget puts the dense stack at 1.08 ms vs a 0.95 ms
weight-streaming floor -- the four latent/fc projections
(131072x1024, 131072x512, 1024x131072, 512x131072 = 805 MB bf16) are
weight-bandwidth-bound, and the earlier W8A8 rejection (-9% codec) was caused
by the per-call ACTIVATION max/round/cast passes, not the weight stream.

Weight-only int8 keeps activations bf16: y = (x @ convert_bf16(q_w)) * s_w
with per-output-column symmetric scales, q_w pre-quantized OUTSIDE the jit
(serving quantizes once at load). The hypothesis under test is that XLA fuses
the int8->bf16 convert into the dot's weight-operand load, so the HBM stream
halves (805 -> 403 MB) without materializing a bf16 copy. int8 values up to
127 are exact in bf16, so vs the bf16 baseline the only new error is the
weight rounding (<= s_w/2 per element, zero-mean across a 131072-deep
contraction -- and downstream these latents pass through the adaptive
quantizer's own rounding).

Two dequant placements measured:
  w8_out: scale applied to the matmul OUTPUT (one (B, N) row-broadcast mul)
  w8_opr: scale folded into the weight OPERAND (bf16 (K, N) broadcast mul --
          tests whether XLA still streams int8 when the convert has a consumer
          chain before the dot)

Prints ms/iter (b128, chained-call method) + on-device relative RMS error vs
the bf16 baseline for each of the four production shapes, plus the 4-layer
stack total.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.r3_perf_experiments import timeit

B = 128
SHAPES = [
    ("enc_hq", 131072, 1024),
    ("enc_lq", 131072, 512),
    ("gen_hq", 1024, 131072),
    ("gen_lq", 512, 131072),
]


def quantize_cols(w32: np.ndarray):
    sw = np.max(np.abs(w32), axis=0, keepdims=True) / 127.0  # (1, N)
    qw = np.round(w32 / np.maximum(sw, 1e-12)).astype(np.int8)
    return qw, sw.astype(np.float32)


def main():
    print(f"backend={jax.default_backend()} batch={B} dtype=bfloat16", flush=True)
    rng = np.random.RandomState(0)
    totals = {"bf16": 0.0, "w8_out": 0.0, "w8_opr": 0.0}
    for name, k, n in SHAPES:
        w32 = (rng.randn(k, n) * (1.0 / np.sqrt(k))).astype(np.float32)
        x = jnp.asarray(rng.randn(B, k).astype(np.float32), dtype=jnp.bfloat16)
        w_bf = jnp.asarray(w32, dtype=jnp.bfloat16)
        qw_np, sw_np = quantize_cols(w32)
        qw = jnp.asarray(qw_np)
        sw = jnp.asarray(sw_np)

        # Weights are passed as JIT ARGUMENTS (never closures: a closed-over
        # 268 MB weight is baked into the HLO as a literal and overflows the
        # remote-compile relay's request-size limit with HTTP 413).
        def f_bf16(x, w):
            return jnp.dot(x, w)

        def f_w8_out(x, qw, sw):
            y = jnp.dot(x, qw.astype(jnp.bfloat16))
            return (y.astype(jnp.float32) * sw).astype(jnp.bfloat16)

        def f_w8_opr(x, qw, sw):
            wd = qw.astype(jnp.bfloat16) * sw.astype(jnp.bfloat16)
            return jnp.dot(x, wd)

        # on-device relative RMS vs the bf16 baseline (fetch scalars only)
        y_ref = jax.jit(f_bf16)(x, w_bf).astype(jnp.float32)
        denom = float(jnp.sqrt(jnp.mean(y_ref * y_ref)))
        errs = {}
        for tag, fn in (("w8_out", f_w8_out), ("w8_opr", f_w8_opr)):
            d = jax.jit(fn)(x, qw, sw).astype(jnp.float32) - y_ref
            errs[tag] = float(jnp.sqrt(jnp.mean(d * d))) / max(denom, 1e-30)

        ms = {
            "bf16": timeit(f_bf16, x, w_bf),
            "w8_out": timeit(f_w8_out, x, qw, sw),
            "w8_opr": timeit(f_w8_opr, x, qw, sw),
        }
        for tag in totals:
            totals[tag] += ms[tag]
        print(
            f"{name} ({k}x{n}): bf16={ms['bf16']:.3f}ms  "
            f"w8_out={ms['w8_out']:.3f}ms (rel_rms={errs['w8_out']:.2e})  "
            f"w8_opr={ms['w8_opr']:.3f}ms (rel_rms={errs['w8_opr']:.2e})",
            flush=True,
        )
    print(
        f"stack totals: bf16={totals['bf16']:.3f}ms  "
        f"w8_out={totals['w8_out']:.3f}ms  w8_opr={totals['w8_opr']:.3f}ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
