"""Saliency-adaptive latent quantization as a fused Pallas TPU kernel.

Forward semantics (identical to the reference AdaptiveQuantizationLayer,
GAN_functions.py:429-446):

    effective_quant = quant_strength * (1 - saliency_score)      # per sample
    scale           = exp(scale_coeff * effective_quant)         # scale_coeff = 3
    quantized       = round(latent * scale) / scale

Gradient modes (QuantizerConfig.grad_mode):

  'reference' -- tf.round's a.e.-zero derivative, faithfully: the latent path carries
    ZERO gradient, but the scale path does carry gradient
    (d quantized / d scale = -round(latent*scale)/scale^2), which in the reference
    reaches the encoders through the latent-saliency score. This is the reference's
    silent-training-defect mode (SURVEY.md section 2.2).

  'ste' -- straight-through estimator: identical forward numerics; backward treats
    round as identity w.r.t. the latent (gradient passes straight through) and kills
    the scale path (if round were identity, quantized == latent exactly and the scale
    would have no effect). This is the 'fixed' training mode.

Both modes are implemented twice -- as plain jnp (autodiff'd / stop-gradient'd) and as
a Pallas kernel with a custom VJP -- and tested for agreement. On non-TPU backends the
jnp path is selected automatically.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contextual_image_compression_tpu.config import QuantizerConfig

DEFAULT_SCALE_COEFF = 3.0


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _scale(saliency_score, quant_strength, scale_coeff):
    effective = quant_strength * (1.0 - saliency_score)
    return jnp.exp(scale_coeff * effective)


# ---------------------------------------------------------------------------
# jnp implementations
# ---------------------------------------------------------------------------


def adaptive_quantize_reference_jnp(latent, saliency_score, quant_strength,
                                    scale_coeff: float = DEFAULT_SCALE_COEFF):
    """Plain-jnp forward; jnp.round has zero derivative a.e., so plain autodiff of
    this expression reproduces the reference's TF gradients exactly (dead latent
    path, live scale path)."""
    scale = _scale(saliency_score, quant_strength, scale_coeff)
    return jnp.round(latent * scale) / scale


def adaptive_quantize_ste_jnp(latent, saliency_score, quant_strength,
                              scale_coeff: float = DEFAULT_SCALE_COEFF):
    """STE: forward == reference; backward: identity w.r.t. latent, zero w.r.t.
    the score/strength path."""
    q = adaptive_quantize_reference_jnp(
        jax.lax.stop_gradient(latent),
        jax.lax.stop_gradient(saliency_score),
        jax.lax.stop_gradient(quant_strength),
        scale_coeff,
    )
    return latent + jax.lax.stop_gradient(q - latent)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _quant_fwd_kernel(latent_ref, score_ref, strength_ref, coeff_ref, out_ref):
    coeff = coeff_ref[0]
    # compute in f32 regardless of storage dtype (bf16 inference params), cast back
    eff = strength_ref[:].astype(jnp.float32) * (1.0 - score_ref[:].astype(jnp.float32))
    scale = jnp.exp(coeff * eff)  # (B, 1), broadcasts over D
    q = jnp.round(latent_ref[:].astype(jnp.float32) * scale) / scale
    out_ref[:] = q.astype(out_ref.dtype)


def _quant_bwd_ref_kernel(latent_ref, score_ref, strength_ref, coeff_ref, g_ref,
                          dscore_ref, dstrength_ref):
    """Reference-mode backward: d latent = 0 (handled outside);
    d scale = -round(latent*scale)/scale^2, chained to score and strength."""
    coeff = coeff_ref[0]
    # compute in f32 regardless of storage dtype (mirrors the forward kernel's
    # upcast -- the bf16 mixed-precision path feeds bf16 latents/grads through here)
    strength = strength_ref[:].astype(jnp.float32)
    score = score_ref[:].astype(jnp.float32)
    eff = strength * (1.0 - score)
    scale = jnp.exp(coeff * eff)
    rounded = jnp.round(latent_ref[:].astype(jnp.float32) * scale)
    # dq/dscale per element, then chain rule: dscale/deff = coeff*scale.
    g = g_ref[:].astype(jnp.float32)
    g_scale = jnp.sum(g * (-rounded / (scale * scale)), axis=1, keepdims=True)
    g_eff = g_scale * coeff * scale
    dscore_ref[:] = (g_eff * (-strength)).astype(dscore_ref.dtype)
    dstrength_ref[:] = (g_eff * (1.0 - score)).astype(dstrength_ref.dtype)


def _pallas_quant_forward(latent, saliency_score, quant_strength, scale_coeff):
    coeff = jnp.full((1,), scale_coeff, dtype=jnp.float32)
    return pl.pallas_call(
        _quant_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct(latent.shape, latent.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(latent, saliency_score, quant_strength, coeff)


def _pallas_quant_bwd_scalepath(latent, saliency_score, quant_strength, scale_coeff, g):
    coeff = jnp.full((1,), scale_coeff, dtype=jnp.float32)
    dscore, dstrength = pl.pallas_call(
        _quant_bwd_ref_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(saliency_score.shape, saliency_score.dtype),
            jax.ShapeDtypeStruct(quant_strength.shape, quant_strength.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=not _on_tpu(),
    )(latent, saliency_score, quant_strength, coeff, g)
    return dscore, dstrength


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _adaptive_quantize_pallas(latent, saliency_score, quant_strength,
                              scale_coeff: float, grad_mode: str):
    return _pallas_quant_forward(latent, saliency_score, quant_strength, scale_coeff)


def _aq_fwd(latent, saliency_score, quant_strength, scale_coeff, grad_mode):
    out = _pallas_quant_forward(latent, saliency_score, quant_strength, scale_coeff)
    return out, (latent, saliency_score, quant_strength)


def _aq_bwd(scale_coeff, grad_mode, residuals, g):
    latent, saliency_score, quant_strength = residuals
    if grad_mode == "ste":
        return g, jnp.zeros_like(saliency_score), jnp.zeros_like(quant_strength)
    dscore, dstrength = _pallas_quant_bwd_scalepath(
        latent, saliency_score, quant_strength, scale_coeff, g
    )
    return jnp.zeros_like(latent), dscore, dstrength


_adaptive_quantize_pallas.defvjp(_aq_fwd, _aq_bwd)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------


def adaptive_quantize(
    latent: jnp.ndarray,
    saliency_score: jnp.ndarray,
    quant_strength: jnp.ndarray,
    config: QuantizerConfig | None = None,
) -> jnp.ndarray:
    """Saliency-adaptive quantization of (B, D) latents.

    saliency_score, quant_strength: (B, 1) in [0, 1].
    """
    cfg = config or QuantizerConfig()
    if cfg.grad_mode == "auto":
        raise ValueError(
            "grad_mode='auto' is a topology-level default; resolve it first "
            "via ModelConfig.resolved_quantizer() (or pass an explicit "
            "'reference'/'ste' QuantizerConfig when calling standalone)."
        )
    if cfg.use_pallas:
        return _adaptive_quantize_pallas(
            latent, saliency_score, quant_strength, cfg.scale_coeff, cfg.grad_mode
        )
    if cfg.grad_mode == "ste":
        return adaptive_quantize_ste_jnp(latent, saliency_score, quant_strength, cfg.scale_coeff)
    return adaptive_quantize_reference_jnp(latent, saliency_score, quant_strength, cfg.scale_coeff)
