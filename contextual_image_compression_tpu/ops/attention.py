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
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


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
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    gamma = g_ref[0, 0]  # f32 operand: scalar extraction must be 32-bit
    o_ref[0] = (gamma * ctx + r_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


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
