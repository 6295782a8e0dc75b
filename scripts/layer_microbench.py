#!/usr/bin/env python
"""Per-layer microbenchmark of the codec's conv/deconv/dense shapes.

Times every distinct layer shape of the adaptive codec in isolation (bf16,
batch configurable) and reports achieved TFLOP/s vs the useful-MAC count, to
locate MXU-inefficient layers (e.g. small-Cout deconvs where the output-channel
dim underfills the 128-lane axis). Also times the polyphase ConvTranspose
lowering per layer, so the native-vs-polyphase decision can be made per shape
rather than globally (round 1 measured polyphase globally slower; VERDICT.md
round 1 item 3 asks where the last 33% of MFU goes).

Prints one JSON dict at the end.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    """Median of chained-call timing, first call subtracted (bench.py method)."""
    f = jax.jit(fn)

    def run(n):
        t0 = time.perf_counter()
        x = args[0]
        rest = args[1:]
        for _ in range(n):
            x = f(x, *rest)
        float(jnp.sum(jnp.ravel(x)[0:1]))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(iters) for _ in range(2))
    return max((tn - t1) / (iters - 1), 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    out = {"batch": B}

    def conv(x, w, stride=1, groups=1):
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        # keep chaining dtype/shape-stable: return something input-shaped
        return x + jnp.mean(y).astype(x.dtype)

    def deconv(x, w, stride=2):
        y = jax.lax.conv_transpose(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return x + jnp.mean(y).astype(x.dtype)

    # (name, H, Cin, Cout, k, stride, kind)
    layers = [
        ("enc.conv1", 256, 3, 64, 4, 2, "conv"),
        ("enc.conv2", 128, 64, 128, 4, 2, "conv"),
        ("enc.conv3", 64, 128, 256, 4, 2, "conv"),
        ("enc.conv4", 32, 256, 512, 4, 2, "conv"),
        ("gen.deconv1", 16, 512, 256, 4, 2, "deconv"),
        ("gen.deconv2", 32, 512, 128, 4, 2, "deconv"),
        ("gen.deconv3", 64, 256, 64, 4, 2, "deconv"),
        ("gen.deconv4", 128, 128, 32, 4, 2, "deconv"),
        ("gen.out_conv", 256, 32, 3, 4, 1, "conv"),
    ]

    for name, h, cin, cout, k, s, kind in layers:
        x = jax.random.normal(key, (B, h, h, cin), dt)
        w = jax.random.normal(key, (k, k, cin, cout), dt) * 0.05
        if kind == "conv":
            dtime = timeit(lambda xx, ww: conv(xx, ww, s), x, w, iters=args.iters)
            out_px = (h // s) ** 2
            macs = out_px * cout * k * k * cin
        else:
            dtime = timeit(lambda xx, ww: deconv(xx, ww, s), x, w, iters=args.iters)
            out_px = (h * s) ** 2
            macs = out_px * cout * (k * k // (s * s)) * cin
        tflops = 2 * macs * B / dtime / 1e12
        out[name] = {
            "ms": round(dtime * 1e3, 3),
            "gmacs_per_img": round(macs / 1e9, 3),
            "tflops": round(tflops, 1),
        }
        print(f"{name:14s} {dtime * 1e3:7.2f} ms  {tflops:6.1f} TFLOP/s",
              file=sys.stderr, flush=True)

    # polyphase variants of the deconvs (phase conv + interleave)
    from contextual_image_compression_tpu.models.layers import _PolyphaseConvT4x4s2

    for name, h, cin, cout in [
        ("poly.deconv1", 16, 512, 256),
        ("poly.deconv2", 32, 512, 128),
        ("poly.deconv3", 64, 256, 64),
        ("poly.deconv4", 128, 128, 32),
    ]:
        mod = _PolyphaseConvT4x4s2(cout, dtype=dt, param_dtype=dt)
        x = jax.random.normal(key, (B, h, h, cin), dt)
        v = mod.init(key, x)

        def run(xx, vv):
            y = mod.apply(vv, xx)
            return xx + jnp.mean(y).astype(xx.dtype)

        dtime = timeit(run, x, v, iters=args.iters)
        macs = (h * 2) ** 2 * cout * 4 * cin
        out[name] = {
            "ms": round(dtime * 1e3, 3),
            "tflops": round(2 * macs * B / dtime / 1e12, 1),
        }
        print(f"{name:14s} {dtime * 1e3:7.2f} ms  {out[name]['tflops']:6.1f} TFLOP/s",
              file=sys.stderr, flush=True)

    # composite generator tail: deconv4 -> BN(inference) -> LeakyReLU ->
    # out_conv -> tanh, native vs the MXU-packed lowering (models/packed_tail.py)
    import flax.linen as nn
    from contextual_image_compression_tpu.models.packed_tail import (
        packed_tail_forward,
    )

    cin, cmid, cout = 128, 32, 3
    x = jax.random.normal(key, (B, 128, 128, cin), dt)
    k4 = jax.random.normal(key, (4, 4, cin, cmid), dt) * 0.05
    b4 = jnp.zeros((cmid,), dt)
    ko = jax.random.normal(key, (4, 4, cmid, cout), dt) * 0.05
    bo = jnp.zeros((cout,), dt)
    scale = jnp.ones((cmid,), dt)
    bias = jnp.zeros((cmid,), dt)
    mean = jnp.zeros((cmid,), jnp.float32)
    var = jnp.ones((cmid,), jnp.float32)

    def native_tail(xx, k4_, b4_, ko_, bo_):
        z = jax.lax.conv_transpose(
            xx, k4_, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b4_
        z = z * scale + bias  # BN inference with unit stats
        z = nn.leaky_relu(z, negative_slope=0.2)
        y = jax.lax.conv_general_dilated(
            z, ko_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bo_
        y = jnp.tanh(y)
        return xx + jnp.mean(y).astype(xx.dtype)

    def packed_tail(xx, k4_, b4_, ko_, bo_):
        y = packed_tail_forward(xx, k4_, b4_, scale, bias, mean, var, ko_, bo_)
        return xx + jnp.mean(y).astype(xx.dtype)

    tail_macs = (256**2) * cmid * 4 * cin + (256**2) * cout * 16 * cmid
    for name, fn in (("tail.native", native_tail), ("tail.packed", packed_tail)):
        dtime = timeit(fn, x, k4, b4, ko, bo, iters=args.iters)
        out[name] = {
            "ms": round(dtime * 1e3, 3),
            "tflops": round(2 * tail_macs * B / dtime / 1e12, 1),
        }
        print(f"{name:14s} {dtime * 1e3:7.2f} ms  {out[name]['tflops']:6.1f} TFLOP/s",
              file=sys.stderr, flush=True)

    # dense blocks
    for name, m, n in [
        ("enc.dense_hq", 131072, 1024),
        ("enc.dense_lq", 131072, 512),
        ("gen.dense_hq", 1024, 131072),
        ("gen.dense_lq", 512, 131072),
    ]:
        x = jax.random.normal(key, (B, m), dt)
        w = jax.random.normal(key, (m, n), dt) * 0.01

        def run(xx, ww):
            y = jnp.dot(xx, ww, preferred_element_type=jnp.float32)
            return xx + jnp.mean(y).astype(xx.dtype)

        dtime = timeit(run, x, w, iters=args.iters)
        out[name] = {
            "ms": round(dtime * 1e3, 3),
            "tflops": round(2 * m * n * B / dtime / 1e12, 1),
        }
        print(f"{name:14s} {dtime * 1e3:7.2f} ms  {out[name]['tflops']:6.1f} TFLOP/s",
              file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
