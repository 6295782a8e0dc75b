"""SAGAN-style spatial self-attention core as a Pallas TPU kernel.

The reference's SelfAttention layer (GAN_functions.py:333-374) computes, at 32x32x256:

    out = gamma * softmax(Q K^T) V + x      # Q,K: (B, HW, C/8), V: (B, HW, C), NO 1/sqrt(d)

as three separate tf.matmuls + a softmax + an elementwise epilogue -- five HBM
round-trips of (HW, HW) / (HW, C) tensors. Here the whole block is one fused
Pallas kernel: scores never leave VMEM (HW=1024 -> 4 MB fp32 scores), Q/K/V
tiles stream through the MXU, the softmax runs on the VPU between the two
matmuls, and the gamma-residual epilogue is applied before the single output
write (saves the separate broadcast-multiply-add pass XLA otherwise emits).
Written blockwise over the query axis so it scales to larger resolutions
(flash-attention structure, single K/V block since K/V comfortably fit VMEM at
these sizes).

Gradients: custom VJP whose backward is the (XLA-fused) jnp formulation -- exact,
and the backward matmuls still hit the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def attention_core_jnp(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """softmax(Q K^T) V, unscaled (reference semantics). q,k: (B, N, Dk); v: (B, N, Dv)."""
    scores = jnp.einsum("bnd,bmd->bnm", q, k)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p, v)


def attention_block_jnp(q, k, v, residual, gamma):
    """gamma * softmax(QK^T)V + residual (the full SAGAN block)."""
    return gamma * attention_core_jnp(q, k, v) + residual


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    # Blocks: q (1, BQ, Dk), k (1, N, Dk), v (1, N, Dv) -> o (1, BQ, Dv)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, N)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    # Normalize AFTER the AV matmul: a (BQ, 1) reciprocal broadcast over Dv
    # lanes replaces BQ*N VPU divides with BQ*Dv multiplies (N/Dv = 4x fewer
    # at the codec's 1024/256), and e is in [0, 1] either way for the bf16
    # cast feeding the MXU.
    recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (ctx * recip).astype(o_ref.dtype)


def _attn_block_kernel(q_ref, k_ref, v_ref, r_ref, g_ref, o_ref):
    # As _attn_kernel plus the gamma-residual epilogue before the only write.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # post-AV normalization
    ctx = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    gamma = g_ref[0, 0]  # f32 operand: scalar extraction must be 32-bit
    o_ref[0] = ((gamma * recip) * ctx + r_ref[0].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _qkv_attn_kernel(xq_ref, xfull_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                     wv_ref, bv_ref, g_ref, o_ref, k_scr, v_scr):
    """Fully fused SAGAN block: Q/K/V projections + softmax(QK^T)V + gamma
    epilogue in one kernel. x is read once (the q-block doubles as the
    residual); K and V are computed on the first q-block of each image and
    cached in VMEM scratch for the remaining q-blocks (the grid iterates the
    q axis innermost)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = xfull_ref[0]  # (N, C)
        k_scr[...] = (
            jax.lax.dot_general(xf, wk_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + bk_ref[...].astype(jnp.float32)
        ).astype(k_scr.dtype)
        v_scr[...] = (
            jax.lax.dot_general(xf, wv_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        ).astype(v_scr.dtype)

    xq = xq_ref[0]  # (BQ, C) -- the q-slice of x, also the residual
    q = (
        jax.lax.dot_general(xq, wq_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + bq_ref[...].astype(jnp.float32)
    ).astype(xq.dtype)
    scores = jax.lax.dot_general(
        q, k_scr[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, N)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jnp.dot(e.astype(v_scr.dtype), v_scr[...],
                  preferred_element_type=jnp.float32)
    gamma = g_ref[0, 0]
    o_ref[0] = ((gamma * recip) * ctx + xq.astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _attention_pallas_fwd(q, k, v, residual=None, gamma=None, block_q: int = 512):
    b, n, dk = q.shape
    dv = v.shape[-1]
    bq = min(block_q, n)
    grid = (b, pl.cdiv(n, bq))
    in_specs = [
        pl.BlockSpec((1, bq, dk), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, dk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, dv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, bq, dv), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b, n, dv), q.dtype)
    if residual is None:
        return pl.pallas_call(
            _attn_kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, interpret=not _on_tpu(),
        )(q, k, v)
    in_specs.append(
        pl.BlockSpec((1, bq, dv), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    )
    in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _attn_block_kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape, interpret=not _on_tpu(),
    )(q, k, v, residual, jnp.reshape(gamma, (1, 1)).astype(jnp.float32))


@jax.custom_vjp
def attention_core_pallas(q, k, v):
    return _attention_pallas_fwd(q, k, v)


def _ac_fwd(q, k, v):
    return _attention_pallas_fwd(q, k, v), (q, k, v)


def _ac_bwd(residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(attention_core_jnp, q, k, v)
    return vjp(g)


attention_core_pallas.defvjp(_ac_fwd, _ac_bwd)


@jax.custom_vjp
def attention_block_pallas(q, k, v, residual, gamma):
    return _attention_pallas_fwd(q, k, v, residual, gamma)


def _ab_fwd(q, k, v, residual, gamma):
    return _attention_pallas_fwd(q, k, v, residual, gamma), (q, k, v, residual, gamma)


def _ab_bwd(saved, g):
    q, k, v, residual, gamma = saved
    _, vjp = jax.vjp(attention_block_jnp, q, k, v, residual, gamma)
    return vjp(g)


attention_block_pallas.defvjp(_ab_fwd, _ab_bwd)


def _qkv_attn_kernel_nbc(xq_ref, xfull_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                         wv_ref, bv_ref, g_ref, o_ref, k_scr, v_scr):
    """As _qkv_attn_kernel but for the (N, B, C) view: blocks arrive as
    (BQ, 1, C)/(N, 1, C) with a singleton batch axis to squeeze. XLA's conv
    stacks at the codec's shapes keep activations in a {3,0,2,1} physical
    layout -- i.e. an (H, W, B, C) row-major buffer -- so consuming the
    (HW, B, C) view lets layout assignment turn the feeding/consuming
    transposes into bitcasts instead of a 64 MB relayout copy."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = xfull_ref[:, 0, 0, :]  # (N, C)
        k_scr[...] = (
            jax.lax.dot_general(xf, wk_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + bk_ref[...].astype(jnp.float32)
        ).astype(k_scr.dtype)
        v_scr[...] = (
            jax.lax.dot_general(xf, wv_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + bv_ref[...].astype(jnp.float32)
        ).astype(v_scr.dtype)

    xq = xq_ref[:, 0, 0, :]  # (BQ, C)
    q = (
        jax.lax.dot_general(xq, wq_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + bq_ref[...].astype(jnp.float32)
    ).astype(xq.dtype)
    scores = jax.lax.dot_general(
        q, k_scr[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jnp.dot(e.astype(v_scr.dtype), v_scr[...],
                  preferred_element_type=jnp.float32)
    gamma = g_ref[0, 0]
    o_ref[:, 0, 0, :] = ((gamma * recip) * ctx + xq.astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _sagan_block_pallas_fwd_nbc(xt, wq, bq, wk, bk, wv, bv, gamma,
                                block_q: int = 512):
    # xt is (N, B, 1, C): the extra singleton keeps the per-image slice out of
    # the (sublane, lane) pair, which Mosaic requires to be (divisible-by-8,
    # divisible-by-128) or full-dim.
    n, b, _, c = xt.shape
    inner = wq.shape[-1]
    dv = wv.shape[-1]
    bq_blk = min(block_q, n)
    grid = (b, pl.cdiv(n, bq_blk))
    dt = xt.dtype

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _qkv_attn_kernel_nbc,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq_blk, 1, 1, c), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1, 1, c), lambda i, j: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((c, inner)), wspec((1, inner)),
            wspec((c, inner)), wspec((1, inner)),
            wspec((c, dv)), wspec((1, dv)),
            wspec((1, 1)),
        ],
        out_specs=pl.BlockSpec((bq_blk, 1, 1, dv), lambda i, j: (j, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, b, 1, dv), dt),
        scratch_shapes=[
            pltpu.VMEM((n, inner), dt),
            pltpu.VMEM((n, dv), dt),
        ],
        interpret=not _on_tpu(),
    )(
        xt, xt,
        wq.astype(dt), bq.reshape(1, inner).astype(jnp.float32),
        wk.astype(dt), bk.reshape(1, inner).astype(jnp.float32),
        wv.astype(dt), bv.reshape(1, dv).astype(jnp.float32),
        jnp.reshape(gamma, (1, 1)).astype(jnp.float32),
    )


def sagan_block_jnp(xf, wq, bq, wk, bk, wv, bv, gamma):
    """Reference formulation of the fully fused block: 1x1 projections (as
    matmuls over the (B, N, C) view) + gamma*softmax(QK^T)V + x."""
    dt = xf.dtype
    q = jnp.einsum("bnc,cf->bnf", xf, wq.astype(dt)) + bq.astype(dt)
    k = jnp.einsum("bnc,cf->bnf", xf, wk.astype(dt)) + bk.astype(dt)
    v = jnp.einsum("bnc,cf->bnf", xf, wv.astype(dt)) + bv.astype(dt)
    return gamma * attention_core_jnp(q, k, v) + xf


def _sagan_block_pallas_fwd(xf, wq, bq, wk, bk, wv, bv, gamma,
                            block_q: int = 512):
    b, n, c = xf.shape
    inner = wq.shape[-1]
    dv = wv.shape[-1]
    bq_blk = min(block_q, n)
    grid = (b, pl.cdiv(n, bq_blk))
    dt = xf.dtype

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _qkv_attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq_blk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),  # q-block / residual
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # full x for K/V (j==0)
            wspec((c, inner)), wspec((1, inner)),
            wspec((c, inner)), wspec((1, inner)),
            wspec((c, dv)), wspec((1, dv)),
            wspec((1, 1)),
        ],
        out_specs=pl.BlockSpec((1, bq_blk, dv), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dv), dt),
        scratch_shapes=[
            pltpu.VMEM((n, inner), dt),  # K cache (per image)
            pltpu.VMEM((n, dv), dt),     # V cache (per image)
        ],
        interpret=not _on_tpu(),
    )(
        xf, xf,
        wq.astype(dt), bq.reshape(1, inner).astype(jnp.float32),
        wk.astype(dt), bk.reshape(1, inner).astype(jnp.float32),
        wv.astype(dt), bv.reshape(1, dv).astype(jnp.float32),
        jnp.reshape(gamma, (1, 1)).astype(jnp.float32),
    )


@jax.custom_vjp
def sagan_block_pallas(xf, wq, bq, wk, bk, wv, bv, gamma):
    return _sagan_block_pallas_fwd(xf, wq, bq, wk, bk, wv, bv, gamma)


def _sb_fwd(xf, wq, bq, wk, bk, wv, bv, gamma):
    out = _sagan_block_pallas_fwd(xf, wq, bq, wk, bk, wv, bv, gamma)
    return out, (xf, wq, bq, wk, bk, wv, bv, gamma)


def _sb_bwd(saved, g):
    _, vjp = jax.vjp(sagan_block_jnp, *saved)
    return vjp(g)


sagan_block_pallas.defvjp(_sb_fwd, _sb_bwd)


def sagan_block_spatial_jnp(x, wq, bq, wk, bk, wv, bv, gamma):
    """4D-view reference of the fused block: x is (B, H, W, C)."""
    b, h, w, c = x.shape
    out = sagan_block_jnp(x.reshape(b, h * w, c), wq, bq, wk, bk, wv, bv, gamma)
    return out.reshape(b, h, w, out.shape[-1])


def _sagan_spatial_impl(x, wq, bq, wk, bk, wv, bv, gamma):
    b, h, w, c = x.shape
    # (HW, B, C) view: at the codec's shapes XLA keeps conv activations in a
    # {3,0,2,1} layout (an (H, W, B, C) row-major buffer), so this transpose
    # and the inverse on the output lower to bitcasts, not relayout copies.
    xt = x.transpose(1, 2, 0, 3).reshape(h * w, b, 1, c)
    out = _sagan_block_pallas_fwd_nbc(xt, wq, bq, wk, bk, wv, bv, gamma)
    return out.reshape(h, w, b, out.shape[-1]).transpose(2, 0, 1, 3)


@jax.custom_vjp
def sagan_block_spatial_pallas(x, wq, bq, wk, bk, wv, bv, gamma):
    return _sagan_spatial_impl(x, wq, bq, wk, bk, wv, bv, gamma)


def _sbs_fwd(x, wq, bq, wk, bk, wv, bv, gamma):
    out = _sagan_spatial_impl(x, wq, bq, wk, bk, wv, bv, gamma)
    return out, (x, wq, bq, wk, bk, wv, bv, gamma)


def _sbs_bwd(saved, g):
    _, vjp = jax.vjp(sagan_block_spatial_jnp, *saved)
    return vjp(g)


sagan_block_spatial_pallas.defvjp(_sbs_fwd, _sbs_bwd)


def sagan_block_spatial(x, wq, bq, wk, bk, wv, bv, gamma,
                        use_pallas: bool = True):
    """Fully fused SAGAN block on the spatial (B, H, W, C) view."""
    if use_pallas:
        return sagan_block_spatial_pallas(x, wq, bq, wk, bk, wv, bv, gamma)
    return sagan_block_spatial_jnp(x, wq, bq, wk, bk, wv, bv, gamma)


def sagan_block(xf, wq, bq, wk, bk, wv, bv, gamma, use_pallas: bool = True):
    """Fully fused SAGAN self-attention block on the (B, N, C) view:
    gamma * softmax((xWq)(xWk)^T)(xWv) + x, projections included.

    One HBM read of x and one output write on TPU (K/V cached in VMEM across
    query blocks), vs. three projection matmul passes + a 4-tensor custom
    call when composed from attention_block."""
    if use_pallas:
        return sagan_block_pallas(xf, wq, bq, wk, bk, wv, bv, gamma)
    return sagan_block_jnp(xf, wq, bq, wk, bk, wv, bv, gamma)


def attention_core(q, k, v, use_pallas: bool = True):
    """Dispatch: fused Pallas kernel on TPU (or interpreted elsewhere), jnp otherwise."""
    if use_pallas:
        return attention_core_pallas(q, k, v)
    return attention_core_jnp(q, k, v)


def attention_block(q, k, v, residual, gamma, use_pallas: bool = True):
    """Full SAGAN block gamma*softmax(QK^T)V + residual, epilogue fused into
    the kernel's output write."""
    if use_pallas:
        return attention_block_pallas(q, k, v, residual, gamma)
    return attention_block_jnp(q, k, v, residual, gamma)
