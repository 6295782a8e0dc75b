#!/usr/bin/env python
"""Round-3 perf experiments targeting the op-budget gaps in docs/PERF_NOTES.md:

  A. encoder stride-2 convs (conv2 measured 1.01 ms vs 0.70 floor = 69% MXU):
     native k4/s2 vs space-to-depth k2/s1 formulation, with and without the
     layout pass included.
  B. attention block: block_q sweep (512 current vs 1024 = k/v fetched once).
  C. strided packed out-conv (1.05 ms vs ~0.5 floor): current k4/s2 read of the
     planar tensor vs k2/s1 over a space-to-depth view, with/without layout.
  D. dense stack: single big matmul vs the 4 separate layers (weight-stream
     interleaving check).

Each prints ms/iter at batch 128 bf16 (timing per bench.py's chained-call
method). Run on the real chip; results feed PERF_NOTES.md's ledger.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = 128
DT = jnp.bfloat16


def timeit(fn, *args, iters=20):
    """ms/iter by bench.py's dispatch-chaining method, adapted for ops whose
    output shape differs from the input: each timed step runs the op, reduces
    the FULL output to one scalar (so XLA can neither DCE the op nor slice
    backward through it -- jnp.ravel(y)[0] alone lets the simplifier turn a
    conv into a 4x4 window!), and folds that scalar into element [0] of the
    DONATED input buffer (in-place, no copy) to keep the chain shape-stable.
    Calls serialize on the device queue; one scalar fetch forces completion;
    T(1) is subtracted.  (lax.fori_loop deadlocks the remote Pallas compile
    path on this runtime -- see bench.py.)"""

    def step(x, *rest):
        y = fn(x, *rest)
        tag = (jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)).astype(x.dtype)
        return x.at[(0,) * x.ndim].add(tag)

    f = jax.jit(step, donate_argnums=0)

    def run(n):
        x = jnp.copy(args[0])
        t0 = time.perf_counter()
        for _ in range(n):
            x = f(x, *args[1:])
        float(jnp.sum(x[(0,) * x.ndim]))
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t1 = min(run(1) for _ in range(3))
    tn = min(run(iters) for _ in range(2))
    return max((tn - t1) / (iters - 1), 1e-9) * 1e3  # ms


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv_valid(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channels."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c)
    )


def k4s2_to_k2s1_kernel(w4):
    """(4,4,Cin,Co) k4/s2 SAME kernel -> (3,3,4Cin,Co) k2-ish s1 kernel over the
    s2d input. Output pixel (2m, 2n)... we compute output at stride-1 over the
    s2d grid, i.e. output (B,H/2,W/2,Co) = the k4/s2 conv. Tap (dy,dx) of w4
    reads input row 2m+dy-1 = s2d row m + (dy-1+a)/2 phase a=(dy-1)%2 ->
    dy in 0..3 covers s2d rows m-1+... window rows {m, m+1} for dy in {1,2,3}
    and m-1+1 .. hmm: row index r = (2m+dy-1), s2d row = r//2, phase = r%2:
    dy=0 -> r=2m-1 -> s2d m-1 phase 1; dy=1 -> m,0; dy=2 -> m,1; dy=3 -> m+1,0.
    So s2d window rows {m-1, m, m+1} (k=3, SAME-centered)."""
    cin, co = w4.shape[2], w4.shape[3]
    w3 = np.zeros((3, 3, 4, cin, co), w4.dtype)
    pos = {0: (0, 1), 1: (1, 0), 2: (1, 1), 3: (2, 0)}  # dy -> (s2d row, phase)
    w4 = np.asarray(w4)
    for dy in range(4):
        ry, py = pos[dy]
        for dx in range(4):
            rx, px = pos[dx]
            w3[ry, rx, py * 2 + px] += w4[dy, dx]
    return jnp.asarray(w3.reshape(3, 3, 4 * cin, co))


def main():
    print(f"backend={jax.default_backend()} batch={B} dtype=bfloat16")
    rng = np.random.RandomState(0)

    def randn(*s, scale=0.05):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * scale).astype(DT)

    # ---------------- A. encoder conv2/conv3 stride-2 vs s2d ------------------
    for name, hw, cin, co in (("enc_conv2", 128, 64, 128), ("enc_conv3", 64, 128, 256)):
        x = randn(B, hw, hw, cin)
        w4 = randn(4, 4, cin, co)
        t_native = timeit(lambda x, w: conv(x, w, 2), x, w4)
        xs = s2d(x)
        w3 = k4s2_to_k2s1_kernel(w4)
        t_s2d_only = timeit(lambda x, w: conv(x, w, 1), xs, w3)
        t_s2d_full = timeit(lambda x, w: conv(s2d(x), w, 1), x, w3)
        # parity check on device (full-tensor fetches over the relay take minutes)
        err = float(jax.jit(
            lambda x, xs, w4, w3: jnp.max(jnp.abs(
                conv(x, w4, 2).astype(jnp.float32)
                - conv(xs, w3, 1).astype(jnp.float32)))
        )(x, xs, w4, w3))
        print(f"A {name}: native_k4s2={t_native:.3f}ms  s2d_conv_only={t_s2d_only:.3f}ms  "
              f"s2d_incl_layout={t_s2d_full:.3f}ms  parity_err={err:.2e}")

    # ---------------- B. attention block_q sweep ------------------------------
    from contextual_image_compression_tpu.ops.attention import _attention_pallas_fwd

    n, dk, dv = 1024, 32, 256
    q = randn(B, n, dk); k = randn(B, n, dk); v = randn(B, n, dv)
    res = randn(B, n, dv); gamma = jnp.float32(0.7)
    for bq in (256, 512, 1024):
        t = timeit(
            lambda q, k, v, r, g: _attention_pallas_fwd(q, k, v, r, g, block_q=bq),
            q, k, v, res, gamma,
        )
        print(f"B attention block_q={bq}: {t:.3f}ms")

    # ---------------- C. strided packed out-conv alternatives -----------------
    from contextual_image_compression_tpu.models.packed_tail import (
        packed_conv4x4s2_strided, strided_wstr,
    )

    cmid, co = 32, 3
    yall = randn(B, 129, 129, 4 * cmid)
    ko = randn(4, 4, cmid, co)
    bo = jnp.zeros((co,), DT)
    t_cur = timeit(lambda y: packed_conv4x4s2_strided(y, ko, bo), yall)
    # s2d view: pad yall to (130,130), s2d -> (65,65,512), conv k2/s1 VALID
    w_str = strided_wstr(ko)  # (4,4,128,48)
    w_s2d = np.zeros((2, 2, 4, 4 * cmid, 16 * co), np.float32)
    ws = np.asarray(w_str, np.float32)
    for dy in range(4):
        for dx in range(4):
            w_s2d[dy // 2, dx // 2, (dy % 2) * 2 + (dx % 2)] += ws[dy, dx]
    w_s2d = jnp.asarray(w_s2d.reshape(2, 2, 16 * cmid, 16 * co)).astype(DT)

    def out_s2d(y):
        yp = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return conv_valid(s2d(yp), w_s2d, 1)

    yp = jnp.pad(yall, ((0, 0), (0, 1), (0, 1), (0, 0)))
    ys = s2d(yp)
    t_s2d_only = timeit(lambda y: conv_valid(y, w_s2d, 1), ys)
    t_s2d_full = timeit(out_s2d, yall)
    err = float(jax.jit(
        lambda y: jnp.max(jnp.abs(
            packed_conv4x4s2_strided(y, ko, bo).astype(jnp.float32)
            - (out_s2d(y).astype(jnp.float32) + jnp.tile(bo.astype(jnp.float32), 16))))
    )(yall))
    print(f"C out-conv: current_k4s2={t_cur:.3f}ms  s2d_conv_only={t_s2d_only:.3f}ms  "
          f"s2d_incl_layout={t_s2d_full:.3f}ms  parity_err={err:.2e}")

    # ---------------- D. dense stack: separate vs concat-N --------------------
    # Weights generated ON DEVICE (805 MB host->relay transfer takes minutes)
    # and passed as timeit ARGS, never closures (bench.py: closing over big
    # pytrees makes XLA constant-fold the module for minutes).
    kf = 16 * 16 * 512
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    dev_randn = lambda k, *s: (jax.random.normal(k, s, jnp.float32) * 0.05).astype(DT)
    w_hq_e = dev_randn(keys[0], kf, 1024)
    w_lq_e = dev_randn(keys[1], kf, 512)
    w_hq_g = dev_randn(keys[2], 1024, kf)
    w_lq_g = dev_randn(keys[3], 512, kf)
    w_enc_cat = jnp.concatenate([w_hq_e, w_lq_e], axis=1)
    xf = randn(B, kf)
    z_hq = randn(B, 1024)
    z_lq = randn(B, 512)

    def separate(xf, z_hq, z_lq, w1, w2, w3, w4):
        a = xf @ w1
        b_ = xf @ w2
        c = z_hq @ w3
        d = z_lq @ w4
        return c + d + jnp.pad(a, ((0, 0), (0, kf - 1024))) * 0 + jnp.pad(
            b_, ((0, 0), (0, kf - 512))) * 0

    def enc_merged(xf, z_hq, z_lq, wcat, w3, w4):
        # HQ and LQ encoder denses share xf's shape but not values in the real
        # model; here both read the same xf so merging N=1536 lanes is valid
        # as a THROUGHPUT experiment for the weight stream.
        ab = xf @ wcat
        c = z_hq @ w3
        d = z_lq @ w4
        return c + d + jnp.pad(ab, ((0, 0), (0, kf - 1536))) * 0

    t_sep = timeit(separate, xf, z_hq, z_lq, w_hq_e, w_lq_e, w_hq_g, w_lq_g)
    t_mrg = timeit(enc_merged, xf, z_hq, z_lq, w_enc_cat, w_hq_g, w_lq_g)
    print(f"D dense: separate={t_sep:.3f}ms  enc_merged_N={t_mrg:.3f}ms")

    # ---------------- I. spectral stage: fft vs DFT-matmul core ---------------
    # (operator-matrix resizes/blur/box are already the default; this isolates
    # the remaining FFT-vs-matmul axis, config.spectral_dft_matmul)
    from contextual_image_compression_tpu.ops import saliency as sal_ops

    imgs_u8 = jnp.asarray(rng.randint(0, 256, (B, 256, 256, 3)).astype(np.uint8))
    for flag in (False, True):
        t = timeit(
            lambda x, _flag=flag: sal_ops.spectral_residual_saliency(
                x.astype(jnp.float32) * (1.0 / 127.5) - 1.0, dft_matmul=_flag
            ),
            imgs_u8,
        )
        print(f"I spectral core dft_matmul={flag}: {t:.3f}ms")

    # ---------------- J. fully fused SAGAN block vs composed ------------------
    from contextual_image_compression_tpu.ops.attention import (
        attention_block_pallas,
        sagan_block_pallas,
    )

    c_att = 256
    x_att = randn(B, 1024, c_att)
    wq = randn(c_att, 32); bq = randn(32)
    wk = randn(c_att, 32); bk = randn(32)
    wv = randn(c_att, c_att); bv = randn(c_att)
    gam = jnp.float32(0.7)

    def composed(x, wq, bq, wk, bk, wv, bv):
        q = x @ wq + bq.astype(x.dtype)
        k = x @ wk + bk.astype(x.dtype)
        v = x @ wv + bv.astype(x.dtype)
        return attention_block_pallas(q, k, v, x, gam)

    t_c = timeit(composed, x_att, wq, bq, wk, bk, wv, bv)
    t_f = timeit(
        lambda x, *w: sagan_block_pallas(x, *w, gam), x_att, wq, bq, wk, bk, wv, bv
    )
    print(f"J sagan block: composed={t_c:.3f}ms  fused_qkv={t_f:.3f}ms")


if __name__ == "__main__":
    main()
