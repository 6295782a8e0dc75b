"""Loss functions for the adversarial compression training
(reference: GAN_train.py:198-391).

All losses are pure jnp functions of (batch, codec outputs); weights and exact
formulas follow the reference (file:line cited per function). The reference's
accidental (B,1)-vs-(B,) TF broadcasts -- which turn several per-sample losses into
(B,B) cross-pair means (GAN_train.py:307-308, 333-335) -- are reproduced only when
LossConfig.reference_broadcast_quirk is set; the default is per-sample semantics.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from contextual_image_compression_tpu.config import LossConfig

_KERAS_EPS = 1e-7


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    """Losses always compute in float32: under mixed-precision (bf16) training the
    clip eps 1e-7 is below bf16 resolution -- clip(p, eps, 1-eps) rounds back to
    exactly 0/1 and log() returns -inf (the round-1 bf16 NaN source) -- and large
    spatial means lose precision. Upcasting here keeps fp32 runs bit-identical."""
    return jnp.asarray(x).astype(jnp.float32)


def bce(labels: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on probabilities, keras semantics (clip to
    [eps, 1-eps], mean over all elements)."""
    p = jnp.clip(_f32(probs), _KERAS_EPS, 1.0 - _KERAS_EPS)
    labels = _f32(labels)
    return -jnp.mean(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((_f32(a) - _f32(b)) ** 2)


def mae(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(_f32(a) - _f32(b)))


def discriminator_loss(
    real_preds: jnp.ndarray, fake_preds: jnp.ndarray, cfg: LossConfig
) -> jnp.ndarray:
    """0.5 * (BCE(0.9, D(real)) + BCE(0.1, D(fake))) with label smoothing
    (reference: GAN_train.py:210-218)."""
    real_labels = jnp.full_like(real_preds, cfg.d_real_label)
    fake_labels = jnp.full_like(fake_preds, cfg.d_fake_label)
    return 0.5 * (bce(real_labels, real_preds) + bce(fake_labels, fake_preds))


def adversarial_loss(fake_preds: jnp.ndarray) -> jnp.ndarray:
    """BCE against ones (reference: GAN_train.py:244-250)."""
    return bce(jnp.ones_like(fake_preds), fake_preds)


def perceptual_loss(
    orig_feats: Sequence[jnp.ndarray],
    gen_feats: Sequence[jnp.ndarray],
    layer_weights: Sequence[float],
    scale: float = 0.5,
) -> jnp.ndarray:
    """Sum_i w_i * MSE(zscore(orig_i), zscore(gen_i)) * scale
    (reference: GAN_train.py:256-287; z-scoring over the whole feature tensor)."""
    total = jnp.float32(0.0)
    for w, of, gf in zip(layer_weights, orig_feats, gen_feats):
        of, gf = _f32(of), _f32(gf)
        o = (of - jnp.mean(of)) / (jnp.std(of) + 1e-8)
        g = (gf - jnp.mean(gf)) / (jnp.std(gf) + 1e-8)
        total = total + w * jnp.mean((o - g) ** 2)
    return total * scale


def latent_saliency_loss(
    hq_score: jnp.ndarray,
    lq_score: jnp.ndarray,
    masks: jnp.ndarray,
    cfg: LossConfig,
) -> jnp.ndarray:
    """HQ score should match the mean mask value, LQ its complement
    (reference: GAN_train.py:296-309). hq_score/lq_score: (B,1); masks: (B,H,W,1)."""
    flat_masks = jnp.mean(_f32(masks), axis=(1, 2, 3))  # (B,)
    hq_score, lq_score = _f32(hq_score), _f32(lq_score)
    if not cfg.reference_broadcast_quirk:
        flat_masks = flat_masks[:, None]  # (B,1): per-sample pairing
    # quirk mode: (B,1) - (B,) broadcasts to (B,B), the reference's TF behavior.
    loss_hq = jnp.mean((hq_score - flat_masks) ** 2)
    loss_lq = jnp.mean((lq_score - (1.0 - flat_masks)) ** 2)
    return loss_hq + loss_lq


def rd_loss(rd_params: jnp.ndarray, target_bpp: jnp.ndarray, cfg: LossConfig) -> jnp.ndarray:
    """MSE(rd_params[:,0], clip(1 - bpp/4, 0.1, 0.9)) (reference: GAN_train.py:311-318)."""
    target_compression = jnp.clip(
        1.0 - _f32(target_bpp) / cfg.rd_target_bpp_divisor, *cfg.rd_target_clip
    )  # (B,1)
    actual = _f32(rd_params[:, 0:1])
    return jnp.mean((actual - target_compression) ** 2)


def analytic_bpp_from_allocation(
    bit_allocation: jnp.ndarray, base_latent_dim: int, img_hw: Tuple[int, int]
) -> jnp.ndarray:
    """hq_ratio = mean(bit_allocation); bits = hq*2D*32 + (1-hq)*D*32; bpp = bits/HW
    (reference: GAN_train.py:320-330). Returns (B,)."""
    hq_ratio = jnp.mean(_f32(bit_allocation), axis=(1, 2, 3))
    hq_bits = hq_ratio * (base_latent_dim * 2) * 32.0
    lq_bits = (1.0 - hq_ratio) * base_latent_dim * 32.0
    return (hq_bits + lq_bits) / float(img_hw[0] * img_hw[1])


def bitrate_losses(
    bit_allocation: jnp.ndarray,
    target_bpp: jnp.ndarray,
    base_latent_dim: int,
    img_hw: Tuple[int, int],
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(control, underutilization penalty) (reference: GAN_train.py:333-335).

    control = mean |actual_bpp - target_bpp|
    penalty = relu(target - actual) * relu(target - 1) * 2
    """
    actual = analytic_bpp_from_allocation(bit_allocation, base_latent_dim, img_hw)  # (B,)
    target = _f32(target_bpp)  # (B,1)
    if not cfg.reference_broadcast_quirk:
        actual = actual[:, None]  # (B,1): per-sample pairing
    control = jnp.mean(jnp.abs(actual - target))
    penalty = jnp.mean(
        jax.nn.relu(target - actual) * jax.nn.relu(target - 1.0) * 2.0
    )
    return control, penalty


def combine_generator_loss(
    recon: jnp.ndarray,
    l1: jnp.ndarray,
    perceptual: jnp.ndarray,
    adv: jnp.ndarray,
    bitrate_control: jnp.ndarray,
    cfg: LossConfig,
) -> jnp.ndarray:
    """Weighted sum + the reference's floor-offset hack pushing g_loss toward >= 0.5
    (reference: GAN_train.py:351-361)."""
    g = (
        cfg.recon_weight * recon
        + cfg.l1_weight * l1
        + cfg.perceptual_weight * perceptual
        + cfg.adv_weight * adv
        + cfg.bitrate_weight * bitrate_control
    )
    offset = jnp.maximum(0.0, cfg.g_loss_floor - g) * cfg.g_loss_floor_coeff
    return g + offset
