"""Adversarial training for the adaptive compression codec
(reference: GAN_train.py:129-622).

TPU-first redesign of the reference's training step structure:

* The reference runs THREE GradientTapes over one forward (g/ls/rd,
  GAN_train.py:231) plus a separate discriminator step with its own forward
  (GAN_train.py:198-224). Here the D update and the G update are ONE jitted
  function: the codec forward appears twice in the traced program with identical
  inputs/params, so XLA CSE shares the primal computation, and the g/ls/rd gradient
  split is done with a SINGLE backward pass -- the stop-gradient placement in
  AdaptiveCodec.apply(detach_for_training=True) makes
  grad(g_loss + ls_loss + rd_loss) w.r.t. the three disjoint parameter groups
  exactly equal to the reference's three per-tape gradients.

* Four optax optimizers with keras-Adam semantics (per-variable clipnorm 1.0,
  reference: GAN_train.py:157-160); D is updated only every other step
  (reference: GAN_train.py:426-428) -- we trace two step variants (with/without the
  D phase) and alternate between them.

* BatchNorm: the reference's custom loop calls its Keras models without
  `training=True`, so BN runs in inference mode with never-updated moving statistics
  throughout training (a known Keras custom-loop pitfall). `bn_mode='frozen'`
  reproduces that faithfully; `bn_mode='train'` (default) uses proper global-batch
  statistics -- under a sharded-batch jit these are computed over the GLOBAL batch,
  i.e. sync-BN for free.

* Data parallelism: the step is pure; parallel/sharding.py jits it over a
  `jax.sharding.Mesh` with the batch sharded on the data axis and the large dense
  kernels sharded on the model axis. XLA inserts the gradient all-reduces.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from contextual_image_compression_tpu.config import TrainConfig
from contextual_image_compression_tpu.models.adaptive import (
    GENERATOR_COMPONENTS,
    LATENT_SALIENCY_COMPONENTS,
    RD_COMPONENTS,
    AdaptiveCodec,
)
from contextual_image_compression_tpu.models.vgg import VGG19Features, preprocess_caffe
from contextual_image_compression_tpu.train import losses as L
from contextual_image_compression_tpu.train.optimizers import keras_adam


class Batch(NamedTuple):
    image: jnp.ndarray  # (B, H, W, 3) in [-1, 1]
    mask: jnp.ndarray   # (B, H, W, 1) in [0, 1]
    bpp: jnp.ndarray    # (B, 1)


@flax.struct.dataclass
class GANTrainState:
    codec_vars: Dict[str, Any]
    disc_vars: Dict[str, Any]
    g_opt: optax.OptState
    ls_opt: optax.OptState
    rd_opt: optax.OptState
    d_opt: optax.OptState
    step: jnp.ndarray


def _group(params_by_name: Dict[str, Any], names) -> Dict[str, Any]:
    return {n: params_by_name[n] for n in names}


@dataclasses.dataclass
class GANStepBuilder:
    """Builds the jitted fused train step and the initial state."""

    cfg: TrainConfig
    codec: AdaptiveCodec = None  # type: ignore[assignment]
    vgg: Optional[VGG19Features] = None
    vgg_vars: Optional[dict] = None
    bn_mode: str = "train"  # 'train' | 'frozen' (reference-faithful)
    # Discriminator BN mode, separately controllable: the reference's D always runs
    # with inference-mode BN on never-updated moving stats (GAN_train.py:198-224 calls
    # it without training=True), which keeps D weak and the adversarial game near
    # equilibrium (d_loss ~ 0.69). None resolves to 'frozen': batch-stat D BN
    # was MEASURED to destabilize the game at reference scale in two
    # independent runs (round-1 ref_scale: d_loss 3.6-10; round-3 r3_fixed
    # first attempt: d_loss 5.7-6.5 by epoch 5 vs the ~0.69 equilibrium), so
    # the shipping default is the stable configuration; pass 'train'
    # explicitly to experiment with batch-stat D BN.
    disc_bn_mode: Optional[str] = None

    def __post_init__(self):
        if self.disc_bn_mode is None:
            self.disc_bn_mode = "frozen"
        if self.codec is None:
            self.codec = AdaptiveCodec(self.cfg.model)
        self.disc = self.codec.discriminator()
        lr = self.cfg.learning_rate
        adam = functools.partial(
            keras_adam,
            clipnorm=self.cfg.clipnorm,
            b1=self.cfg.adam_b1,
            b2=self.cfg.adam_b2,
            eps=self.cfg.adam_eps,
        )
        self.g_tx = adam(lr)
        self.ls_tx = adam(lr * self.cfg.ls_lr_scale)
        self.rd_tx = adam(lr * self.cfg.rd_lr_scale)
        self.d_tx = adam(lr)

    # ------------------------------------------------------------------ state
    def init_state(self, rng: jax.Array, batch_size: int = 1) -> GANTrainState:
        k_codec, k_disc = jax.random.split(rng)
        codec_vars = self.codec.init(k_codec, batch_size=batch_size)
        h, w = self.cfg.model.img_size
        img = jnp.zeros((batch_size, h, w, self.cfg.model.channels))
        disc_vars = self.disc.init(k_disc, img, train=False)

        params = {n: v["params"] for n, v in codec_vars.items()}
        return GANTrainState(
            codec_vars=codec_vars,
            disc_vars=disc_vars,
            g_opt=self.g_tx.init(_group(params, GENERATOR_COMPONENTS)),
            ls_opt=self.ls_tx.init(_group(params, LATENT_SALIENCY_COMPONENTS)),
            rd_opt=self.rd_tx.init(_group(params, RD_COMPONENTS)),
            d_opt=self.d_tx.init(disc_vars["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- internals
    def _codec_apply(self, codec_vars, batch: Batch, detach: bool):
        train_bn = self.bn_mode == "train"
        return self.codec.apply(
            codec_vars,
            batch.image,
            batch.mask,
            batch.bpp,
            train=train_bn,
            detach_for_training=detach,
        )

    def _disc_apply(self, disc_vars, x):
        # The reference calls the discriminator without training=True, i.e. BN in
        # inference mode; with disc_bn_mode='train' we use batch stats (mutable
        # handled by callers that need the updates).
        if self.disc_bn_mode == "train":
            out, mut = self.disc.apply(disc_vars, x, train=True, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return self.disc.apply(disc_vars, x, train=False), disc_vars.get("batch_stats")

    def _perceptual(self, images, compressed):
        if self.vgg is None or not self.cfg.use_perceptual:
            return jnp.float32(0.0)
        orig_feats = self.vgg.apply(self.vgg_vars, preprocess_caffe(images))
        gen_feats = self.vgg.apply(self.vgg_vars, preprocess_caffe(compressed))
        return L.perceptual_loss(
            orig_feats,
            gen_feats,
            self.cfg.loss.perceptual_layer_weights,
            self.cfg.loss.perceptual_scale,
        )

    # ------------------------------------------------------------------ step
    def train_step(
        self, state: GANTrainState, batch: Batch, do_d_step: bool
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        """One fused training step. `do_d_step` is a static (trace-time) flag --
        the harness alternates between the two traced variants
        (reference: GAN_train.py:426-431)."""
        lcfg = self.cfg.loss
        mcfg = self.cfg.model
        metrics: Dict[str, jnp.ndarray] = {}

        disc_vars = state.disc_vars
        d_opt = state.d_opt

        # ---------------- D phase (reference: GAN_train.py:198-224) ----------
        if do_d_step:
            out_sg, _ = self._codec_apply(
                jax.lax.stop_gradient(state.codec_vars), batch, detach=False
            )
            compressed_sg = jax.lax.stop_gradient(out_sg.blended)

            def d_loss_fn(d_params):
                dvars = dict(disc_vars, params=d_params)
                real_preds, bs1 = self._disc_apply(dvars, batch.image)
                fake_preds, bs2 = self._disc_apply(dvars, compressed_sg)
                loss = L.discriminator_loss(real_preds, fake_preds, lcfg)
                return loss, bs2

            (d_loss, d_bstats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                disc_vars["params"]
            )
            d_updates, d_opt = self.d_tx.update(d_grads, d_opt, disc_vars["params"])
            d_params = optax.apply_updates(disc_vars["params"], d_updates)
            disc_vars = dict(disc_vars, params=d_params)
            if d_bstats is not None and "batch_stats" in disc_vars:
                disc_vars = dict(disc_vars, batch_stats=d_bstats)
            metrics["d_loss"] = d_loss

        # ---------------- G/LS/RD phase (reference: GAN_train.py:226-391) ----
        diff_params = {n: state.codec_vars[n]["params"] for n in state.codec_vars}
        rest = {
            n: {k: v for k, v in state.codec_vars[n].items() if k != "params"}
            for n in state.codec_vars
        }

        def loss_fn(dp):
            codec_vars = {n: dict(rest[n], params=dp[n]) for n in dp}
            out, bn_updates = self._codec_apply(codec_vars, batch, detach=True)

            fake_preds, _ = self._disc_apply(jax.lax.stop_gradient(disc_vars), out.blended)

            recon = L.mse(batch.image, out.blended)
            adv = L.adversarial_loss(fake_preds)
            l1 = L.mae(batch.image, out.blended)
            perceptual = self._perceptual(batch.image, out.blended)

            ls_loss_raw = L.latent_saliency_loss(
                out.hq_saliency_loss, out.lq_saliency_loss, batch.mask, lcfg
            )
            rd_loss_raw = L.rd_loss(out.rd_params, batch.bpp, lcfg)
            bitrate_control, underutil = L.bitrate_losses(
                out.dynamic_threshold, batch.bpp, mcfg.base_latent_dim, mcfg.img_size, lcfg
            )

            g_loss = L.combine_generator_loss(
                recon, l1, perceptual, adv, bitrate_control, lcfg
            )
            if lcfg.branch_recon_weight > 0.0:
                # Train BOTH generator branches on the full image (see
                # LossConfig.branch_recon_weight); added after the reference's
                # floor-offset hack so weight 0.0 is bit-identical faithful.
                branch_recon = L.mse(batch.image, out.hq_output) + L.mse(
                    batch.image, out.lq_output
                )
                g_loss = g_loss + lcfg.branch_recon_weight * branch_recon
            ls_loss = lcfg.ls_loss_weight * ls_loss_raw
            rd_opt_loss = (
                lcfg.rd_loss_weight * rd_loss_raw
                + lcfg.rd_bitrate_weight * bitrate_control
                + underutil
            )
            # Stop-gradient placement makes this single backward produce exactly the
            # reference's three per-tape gradients (see module docstring).
            total = g_loss + ls_loss + rd_opt_loss
            aux = {
                "bn_updates": bn_updates,
                "metrics": {
                    "g_loss": g_loss,
                    "reconstruction_loss": recon,
                    "gan_loss": adv,
                    "l1_loss": l1,
                    "perceptual_loss": perceptual,
                    "latent_saliency_loss": ls_loss_raw,
                    "rd_loss": rd_loss_raw,
                    "bitrate_control_loss": bitrate_control,
                    "actual_bpp": jnp.mean(
                        L.analytic_bpp_from_allocation(
                            out.dynamic_threshold, mcfg.base_latent_dim, mcfg.img_size
                        )
                    ),
                },
            }
            return total, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(diff_params)
        metrics.update(aux["metrics"])

        g_updates, g_opt = self.g_tx.update(
            _group(grads, GENERATOR_COMPONENTS), state.g_opt,
            _group(diff_params, GENERATOR_COMPONENTS),
        )
        ls_updates, ls_opt = self.ls_tx.update(
            _group(grads, LATENT_SALIENCY_COMPONENTS), state.ls_opt,
            _group(diff_params, LATENT_SALIENCY_COMPONENTS),
        )
        rd_updates, rd_opt = self.rd_tx.update(
            _group(grads, RD_COMPONENTS), state.rd_opt,
            _group(diff_params, RD_COMPONENTS),
        )

        new_params = dict(diff_params)
        for updates in (g_updates, ls_updates, rd_updates):
            for name, upd in updates.items():
                new_params[name] = optax.apply_updates(new_params[name], upd)

        bn_updates = aux["bn_updates"]
        new_codec_vars = {}
        for name in state.codec_vars:
            nv = dict(rest[name], params=new_params[name])
            if name in bn_updates:
                nv["batch_stats"] = bn_updates[name]
            new_codec_vars[name] = nv

        new_state = GANTrainState(
            codec_vars=new_codec_vars,
            disc_vars=disc_vars,
            g_opt=g_opt,
            ls_opt=ls_opt,
            rd_opt=rd_opt,
            d_opt=d_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    def jitted_steps(self, donate: bool = True):
        """Returns (step_with_d, step_without_d), jitted."""
        donate_argnums = (0,) if donate else ()
        with_d = jax.jit(
            functools.partial(self.train_step, do_d_step=True),
            donate_argnums=donate_argnums,
        )
        without_d = jax.jit(
            functools.partial(self.train_step, do_d_step=False),
            donate_argnums=donate_argnums,
        )
        return with_d, without_d
