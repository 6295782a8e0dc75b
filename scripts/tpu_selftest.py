#!/usr/bin/env python
"""On-TPU Pallas kernel selftest: assert Mosaic-lowered kernels against their
jnp formulations ON THE REAL CHIP at production shapes.

The pytest suite runs every Pallas kernel under interpret=True on CPU
(tests/conftest.py forces the CPU platform for mesh tests), which would hide
Mosaic lowering bugs; this script closes that blind spot (VERDICT round 2,
item 3). Run on hardware and commit the captured output:

    python scripts/tpu_selftest.py | tee runs/tpu_selftest.log

Covers, at the shapes the production pipeline actually uses:
  * adaptive quantizer forward + both custom VJPs ('reference' and 'ste'
    grad modes) vs the jnp/autodiff formulation  (ops/quantize.py)
  * fused attention block forward + gradients vs attention_block_jnp
    (ops/attention.py; 32x32x256 HQ-encoder shape, GAN_functions.py:333-374)
  * fully fused contextual mask kernel vs the unfused jnp saliency/mask path
    (ops/fused_mask.py vs ops/saliency.py + ops/masks.py)
  * fused DCT strip codec vs _dct_strips_jnp  (ops/dct.py)
  * one fused GAN train step at reference scale: all metrics finite
"""

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PASSED = []


def check(name, got, want, atol, rtol=0.0):
    got, want = np.asarray(got), np.asarray(want)
    err = np.max(np.abs(got - want) - rtol * np.abs(want))
    ok = err <= atol
    print(f"  {'PASS' if ok else 'FAIL'} {name}: max_err={err:.3e} (atol={atol:g})")
    if not ok:
        raise AssertionError(f"{name}: max_err {err} > atol {atol}")
    PASSED.append(name)


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}, device: {jax.devices()[0].device_kind}")
    if backend != "tpu":
        print("WARNING: not on TPU -- this run does NOT validate Mosaic lowering")

    rng = np.random.RandomState(0)

    # ---------------- adaptive quantizer (ops/quantize.py) -------------------
    from contextual_image_compression_tpu.config import QuantizerConfig
    from contextual_image_compression_tpu.ops import quantize as Q

    print("quantizer: fwd + VJPs, production shapes (B=128, D=1024)")
    latent = jnp.asarray(rng.randn(128, 1024).astype(np.float32) * 30)
    score = jnp.asarray(rng.rand(128, 1).astype(np.float32))
    strength = jnp.asarray(rng.rand(128, 1).astype(np.float32))

    for mode in ("reference", "ste"):
        pall = lambda l, s, q: Q.adaptive_quantize(
            l, s, q, QuantizerConfig(use_pallas=True, grad_mode=mode)
        )
        ref = lambda l, s, q: Q.adaptive_quantize(
            l, s, q, QuantizerConfig(use_pallas=False, grad_mode=mode)
        )
        check(f"quantize[{mode}] fwd", jax.jit(pall)(latent, score, strength),
              jax.jit(ref)(latent, score, strength), atol=1e-5)

        def loss(fn):
            def f(l, s, q):
                out = fn(l, s, q)
                return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
            return f

        gp = jax.jit(jax.grad(loss(pall), argnums=(0, 1, 2)))(latent, score, strength)
        gj = jax.jit(jax.grad(loss(ref), argnums=(0, 1, 2)))(latent, score, strength)
        # d_score/d_strength reach magnitudes ~5e3 (sums of 1024 terms of ~30),
        # so the comparison needs a relative term: measured on the real chip,
        # Pallas-vs-jnp disagree by <= 2.7e-5 relative (fp32 summation order),
        # while BOTH sit ~4.3e-3 relative from the float64 ground truth with
        # identical error (shared fp32 forward rounding in exp/round) -- i.e.
        # the kernel is as accurate as jnp, not a lowering bug.
        for name, a, b in zip(("d_latent", "d_score", "d_strength"), gp, gj):
            check(f"quantize[{mode}] vjp {name}", a, b, atol=2e-3, rtol=1e-4)

    # ---------------- fused attention block (ops/attention.py) ---------------
    from contextual_image_compression_tpu.ops import attention as A

    print("attention: fused block fwd + grads, HQ-encoder shape (B=16, 1024, 256)")
    b, n, c = 16, 1024, 256
    q = jnp.asarray(rng.randn(b, n, c // 8).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.randn(b, n, c // 8).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.randn(b, n, c).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.randn(b, n, c).astype(np.float32) * 0.1)
    gamma = jnp.float32(0.7)

    out_p = jax.jit(A.attention_block_pallas)(q, k, v, res, gamma)
    out_j = jax.jit(A.attention_block_jnp)(q, k, v, res, gamma)
    check("attention fwd", out_p, out_j, atol=1e-4)

    def aloss(fn):
        return lambda *a: jnp.sum(jnp.tanh(fn(*a)))

    gp = jax.jit(jax.grad(aloss(A.attention_block_pallas), argnums=(0, 1, 2, 3, 4)))(
        q, k, v, res, gamma
    )
    gj = jax.jit(jax.grad(aloss(A.attention_block_jnp), argnums=(0, 1, 2, 3, 4)))(
        q, k, v, res, gamma
    )
    for name, a_, b_ in zip(("dq", "dk", "dv", "dres", "dgamma"), gp, gj):
        check(f"attention grad {name}", a_, b_, atol=1e-4)

    # ---------------- fully fused SAGAN block (ops/attention.py) -------------
    # The projections-in-kernel variants (measured-and-rejected for the codec
    # default, kept as library options): parity on the real chip at the
    # HQ-encoder shape, both (B, N, C) and spatial views.
    print("sagan block: fused QKV+attention kernels, (B=16, 1024, 256)")
    xf = jnp.asarray(rng.randn(b, n, c).astype(np.float32) * 0.1)
    wq = jnp.asarray(rng.randn(c, c // 8).astype(np.float32) * 0.05)
    bq_ = jnp.asarray(rng.randn(c // 8).astype(np.float32) * 0.05)
    wk = jnp.asarray(rng.randn(c, c // 8).astype(np.float32) * 0.05)
    bk_ = jnp.asarray(rng.randn(c // 8).astype(np.float32) * 0.05)
    wv = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05)
    bv_ = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05)
    sb_args = (xf, wq, bq_, wk, bk_, wv, bv_, gamma)
    check(
        "sagan block fwd",
        jax.jit(A.sagan_block_pallas)(*sb_args),
        jax.jit(A.sagan_block_jnp)(*sb_args),
        atol=1e-4,
    )
    x4 = xf.reshape(b, 32, 32, c)
    check(
        "sagan block spatial fwd",
        jax.jit(A.sagan_block_spatial_pallas)(x4, *sb_args[1:]),
        jax.jit(A.sagan_block_spatial_jnp)(x4, *sb_args[1:]),
        atol=1e-4,
    )
    # Two-part gradient check. The custom VJP *is* jax.vjp of the jnp
    # reference at the saved primals (ops/attention.py::_sb_bwd), so with a
    # LINEAR loss (fixed cotangent u) pallas-grad and jnp-grad run the
    # identical backward program — any mismatch is a wiring bug (wrong
    # argument order / stale residuals), and the tolerance can be tight.
    u = jnp.asarray(rng.randn(b, n, c).astype(np.float32))

    def lloss(fn):
        return lambda *a: jnp.sum(fn(*a).astype(jnp.float32) * u)

    glp = jax.jit(jax.grad(lloss(A.sagan_block_pallas)))(*sb_args)
    glj = jax.jit(jax.grad(lloss(A.sagan_block_jnp)))(*sb_args)
    check("sagan block grad dx (linear probe)", glp, glj, atol=1e-5)

    # With a NONLINEAR loss the cotangent itself inherits the forward's
    # bf16-input error (~4e-5 here), which the N=1024 attention vjp amplifies
    # ~25x into dx — that amplification bound (not backward correctness,
    # covered above) is what this asserts. Measured on-chip: 1.05e-3.
    gsp = jax.jit(jax.grad(aloss(A.sagan_block_pallas)))(*sb_args)
    gsj = jax.jit(jax.grad(aloss(A.sagan_block_jnp)))(*sb_args)
    check("sagan block grad dx (tanh loss, amplification bound)", gsp, gsj,
          atol=4e-3)

    # ---------------- fused contextual mask (ops/fused_mask.py) --------------
    from contextual_image_compression_tpu.config import SaliencyConfig
    from contextual_image_compression_tpu.ops import masks as M

    print("fused mask engine: 256x256 production path vs unfused jnp path")
    imgs = jnp.asarray(rng.rand(8, 256, 256, 3).astype(np.float32) * 2 - 1)
    cfg_pallas = SaliencyConfig(mask_use_pallas=True)
    cfg_jnp = SaliencyConfig(mask_use_pallas=False)
    m_p = jax.jit(lambda x: M.compute_contextual_mask(x, cfg_pallas))(imgs)
    m_j = jax.jit(lambda x: M.compute_contextual_mask(x, cfg_jnp))(imgs)
    # fused engine computes in its configured dtype (default bf16 internals);
    # tolerance matches tests/test_fused_mask.py's bf16-vs-f32 bound
    tol = 5e-2 if jnp.dtype(cfg_pallas.mask_engine_dtype) == jnp.bfloat16 else 1e-4
    check("fused contextual mask", m_p, m_j, atol=tol)

    # round-3 lowerings (now the config.py defaults), asserted ON THE REAL
    # CHIP against an explicitly pinned FFT + full-spec pole. Two distinct
    # contracts: the in-kernel small-spec upsample is the SAME algebra
    # (identical operator matrices), so it gets a tight bound; the DFT-matmul
    # spectral core is a DIFFERENT f32 algorithm from XLA's FFT custom call,
    # and the spectral residual's log-amplitude cancellation amplifies their
    # rounding difference to ~1.5e-3 in the final mask (with the DFT matmuls
    # pinned to Precision.HIGHEST -- at the TPU bf16 default it was 3.5e-2,
    # runs/tpu_selftest_r3.log history). 4e-3 bounds that cross-algorithm
    # divergence; it is NOT a lowering-correctness tolerance (the CPU
    # cv2-parity tests pass identically under both cores).
    cfg_pole = SaliencyConfig(
        mask_use_pallas=True, spectral_dft_matmul=False, mask_spec_small=False
    )
    m_pole = jax.jit(lambda x: M.compute_contextual_mask(x, cfg_pole))(imgs)
    for dft in (False, True):
        for small in (False, True):
            if not dft and not small:
                continue
            cfg_v = SaliencyConfig(
                mask_use_pallas=True, spectral_dft_matmul=dft,
                mask_spec_small=small,
            )
            m_v = jax.jit(lambda x: M.compute_contextual_mask(x, cfg_v))(imgs)
            atol = 4e-3 if dft else 2e-4
            check(f"mask variant dft={dft} small={small}", m_v, m_pole, atol=atol)

    # u8 wire-format equivalence. The structural contract (masks.py): u8
    # ingestion computes gray255 = rgb_to_gray(float(u8)) in-graph, so it is
    # BIT-IDENTICAL to feeding that gray255 f32 image -- assert that tightly.
    u8 = jnp.asarray(
        np.clip(np.round((np.asarray(imgs) + 1) * 127.5), 0, 255).astype(np.uint8)
    )
    from contextual_image_compression_tpu.ops import image_ops as iops

    gray255 = jax.jit(lambda x: iops.rgb_to_gray(x.astype(jnp.float32)))(u8)
    m_u8 = jax.jit(lambda x: M.compute_contextual_mask(x, cfg_pallas))(u8)
    m_gray = jax.jit(lambda x: M.compute_contextual_mask(x, cfg_pallas))(gray255)
    check("fused mask u8 == gray255 wire (exact)", m_u8, m_gray, atol=1e-6)
    # The [-1,1] dequantized-float image is NOT the same input: for dark
    # pixels (u8 < 64) the (x+1)*127.5 renormalization is outside the
    # Sterbenz-exact range and carries ~2^-24-scale rounding, which the
    # spectral residual's log-amplitude cancellation amplifies
    # input-dependently (measured up to ~1e-2 across image draws, identical
    # under FFT and DFT cores). Loose bound = gross-wiring sentinel only;
    # the tight contract above is the kernel property.
    imgs_deq = u8.astype(jnp.float32) * (1.0 / 127.5) - 1.0
    m_deq = jax.jit(lambda x: M.compute_contextual_mask(x, cfg_pallas))(imgs_deq)
    check("fused mask u8 vs dequant-f32 (conditioning bound)", m_u8, m_deq,
          atol=5e-2)

    # ---------------- DCT strip codec (ops/dct.py) ----------------------------
    from contextual_image_compression_tpu.config import DCTCodecConfig
    from contextual_image_compression_tpu.ops.dct import DCTCodec

    print("DCT codec: fused Pallas roundtrip vs jnp, 128x 256x256 images")
    imgs_d = jnp.asarray(rng.rand(128, 256, 256, 3).astype(np.float32) * 2 - 1)
    rec_p, sym_p = jax.jit(DCTCodec(DCTCodecConfig(use_pallas=True)).roundtrip)(imgs_d)
    rec_j, sym_j = jax.jit(DCTCodec(DCTCodecConfig(use_pallas=False)).roundtrip)(imgs_d)
    check("dct reconstruction", rec_p, rec_j, atol=1e-4)
    check("dct symbols", sym_p, sym_j, atol=1e-3)

    # ---------------- fused train step, reference scale ----------------------
    from contextual_image_compression_tpu.config import TrainConfig
    from contextual_image_compression_tpu.train.gan_trainer import Batch, GANStepBuilder

    print("fused GAN train step at reference scale (256^2, batch 16): finiteness")
    tcfg = TrainConfig(use_perceptual=False, batch_size=16)
    builder = GANStepBuilder(tcfg)
    state = builder.init_state(jax.random.PRNGKey(0), batch_size=16)
    batch = Batch(
        image=jnp.asarray(rng.rand(16, 256, 256, 3).astype(np.float32) * 2 - 1),
        mask=jnp.asarray(rng.rand(16, 256, 256, 1).astype(np.float32)),
        bpp=jnp.full((16, 1), 1.0, jnp.float32),
    )
    step_with_d, _ = builder.jitted_steps(donate=True)
    _, metrics = step_with_d(state, batch)
    vals = {kk: float(vv) for kk, vv in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    print(f"  PASS train step finite: { {kk: round(vv, 4) for kk, vv in vals.items()} }")
    PASSED.append("train step finite")

    # ------------- weight-only int8 dense serving (models/layers.py) ---------
    # Asserts the converted-path numerics ON CHIP: the w8 KDense from a
    # pre-quantized tree must equal the explicit q_w*s_w matmul computed in
    # fp32 on the host, within bf16 accumulation tolerance at the production
    # contraction depth. (The full-codec decode delta vs bf16 serving is
    # measured in PERF_NOTES / verified at adoption time; here we pin the
    # kernel-level contract the codec path builds on.)
    from contextual_image_compression_tpu.models.layers import (
        KDense,
        quantize_dense_w8,
    )

    print("dense w8: pre-quantized int8 kernel path (K=131072, N=256)")
    xw = jnp.asarray(rng.randn(8, 131072).astype(np.float32))
    dense = KDense(256, w8=True, dtype=jnp.bfloat16)
    vw = dense.init(jax.random.PRNGKey(3), xw)
    vwq = quantize_dense_w8(vw, min_elems=1)
    assert vwq["params"]["Dense_0"]["kernel"].dtype == jnp.int8
    w32 = np.asarray(vw["params"]["Dense_0"]["kernel"], np.float32)
    b32 = np.asarray(vw["params"]["Dense_0"]["bias"], np.float32)
    s = np.max(np.abs(w32), axis=0, keepdims=True) / 127.0
    wd = np.round(w32 / np.maximum(s, 1e-12)) * s
    want = np.asarray(xw, np.float32) @ wd.astype(np.float32) + b32
    got = np.asarray(jax.jit(dense.apply)(vwq, xw), np.float32)
    # bf16 dot at K=131072: relative accumulation error ~2^-8 * sqrt-growth;
    # bound relative to the output scale (|y| ~ sqrt(K)).
    check("w8 dense vs host fp32 dequant", got / 362.0, want / 362.0, atol=3e-2)

    print(f"\ntpu_selftest: {len(PASSED)} checks passed on backend={backend}")


if __name__ == "__main__":
    main()
