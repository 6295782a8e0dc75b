"""The adaptive (saliency-guided, rate-controlled) compression codec.

Functional re-design of the reference's build_adaptive_compression_model
(GAN_functions.py:559-722). Rather than one monolithic graph, the codec is a thin
orchestrator over eight independently-initialized components with a component-keyed
variables dict -- which gives us, for free:

  * component-wise checkpointing / load-any-subset (the reference saves 9 .h5 files,
    GAN_train.py:547-581, and can rebuild the full graph from components,
    GAN_test.py:146-207);
  * selective gradient routing for the multi-optimizer training step: the reference
    uses three GradientTapes over disjoint weight sets (GAN_train.py:231,369-389);
    we reproduce those EXACT gradients in a single backward pass by stop-gradient
    placement (see train/gan_trainer.py);
  * per-component sharding rules on the device mesh.

Forward dataflow (reference: GAN_functions.py:604-710, and SURVEY.md section 3.4):

    hq_latent, hq_skips = hq_encoder(img)        # latent 2D, with self-attention
    lq_latent, lq_skips = lq_encoder(img)        # latent D, no attention
    s_hq = latent_saliency_hq(hq_latent); s_lq = latent_saliency_lq(lq_latent)
    rd_params = rd_optimizer(img, mask, bpp)     # feeds ONLY the RD loss
    bpp_n   = clip(bpp/5, 0, 1)
    thr     = 0.9 - 0.85*bpp_n ; qs = 0.9 - 0.8*bpp_n     # deterministic schedule
    dyn_thr = sigmoid(20*(mask^0.7 - thr))               # per-pixel HQ/LQ blend map
    zq_hq   = quantize(hq_latent, s_hq, qs); zq_lq likewise   (fused Pallas kernel)
    out     = hq_gen(zq_hq, hq_skips)*dyn_thr + lq_gen(zq_lq, lq_skips)*(1-dyn_thr)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from contextual_image_compression_tpu.config import ModelConfig
from contextual_image_compression_tpu.models.discriminator import Discriminator
from contextual_image_compression_tpu.models.encoder import Encoder
from contextual_image_compression_tpu.models.generator import Generator
from contextual_image_compression_tpu.models.latent_saliency import LatentSaliency
from contextual_image_compression_tpu.models.rd_optimizer import RDOptimizer
from contextual_image_compression_tpu.ops.quantize import adaptive_quantize

# Component names -- the checkpoint/component addressing vocabulary, mirroring the
# reference's saved-model names (GAN_train.py:552-562).
GENERATOR_COMPONENTS = ("hq_encoder", "hq_generator", "lq_encoder", "lq_generator")
LATENT_SALIENCY_COMPONENTS = ("latent_saliency_hq", "latent_saliency_lq")
RD_COMPONENTS = ("rd_optimizer",)
ALL_CODEC_COMPONENTS = (
    GENERATOR_COMPONENTS + LATENT_SALIENCY_COMPONENTS + RD_COMPONENTS
)


class CodecOutput(NamedTuple):
    """Mirrors the reference adaptive model's five outputs (GAN_functions.py:687-696)
    plus the intermediates the training/eval harnesses need."""

    blended: jnp.ndarray            # (B, H, W, C) reconstruction in [-1, 1]
    hq_latent_q: jnp.ndarray        # (B, 2D) quantized HQ latent
    lq_latent_q: jnp.ndarray        # (B, D) quantized LQ latent
    rd_params: jnp.ndarray          # (B, 3) from the RD network
    dynamic_threshold: jnp.ndarray  # (B, H, W, 1) per-pixel HQ weight ('bit allocation')
    hq_latent: jnp.ndarray
    lq_latent: jnp.ndarray
    hq_saliency_quant: jnp.ndarray  # score used by the quantizer (ls params detached in train)
    lq_saliency_quant: jnp.ndarray
    hq_saliency_loss: jnp.ndarray   # score used by the LS loss (latent detached in train)
    lq_saliency_loss: jnp.ndarray
    hq_output: jnp.ndarray
    lq_output: jnp.ndarray
    quant_strength: jnp.ndarray     # (B, 1) deterministic schedule value
    hq_lq_threshold: jnp.ndarray    # (B, 1)
    overall_compression: jnp.ndarray  # (B, 1)


def _sg_params(variables: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree.map(jax.lax.stop_gradient, variables)


@dataclasses.dataclass(frozen=True)
class AdaptiveCodec:
    """Orchestrator for the adaptive compression model's components."""

    cfg: ModelConfig = ModelConfig()

    # ------------------------------------------------------------------ modules
    def _dt(self):
        return dict(
            dtype=jnp.dtype(self.cfg.dtype), param_dtype=jnp.dtype(self.cfg.param_dtype)
        )

    @property
    def hq_encoder(self) -> Encoder:
        return Encoder(
            latent_dim=self.cfg.hq_latent_dim,
            add_attention=self.cfg.hq_attention,
            channels=self.cfg.encoder_channels,
            leaky_slope=self.cfg.leaky_slope,
            attention_use_pallas=self.cfg.attention_use_pallas,
            dense_int8=self.cfg.dense_int8,
            dense_w8=self.cfg.dense_w8,
            s2d_convs=self.cfg.encoder_s2d_convs,
            **self._dt(),
        )

    @property
    def lq_encoder(self) -> Encoder:
        return Encoder(
            latent_dim=self.cfg.base_latent_dim,
            add_attention=False,
            channels=self.cfg.encoder_channels,
            leaky_slope=self.cfg.leaky_slope,
            dense_int8=self.cfg.dense_int8,
            dense_w8=self.cfg.dense_w8,
            s2d_convs=self.cfg.encoder_s2d_convs,
            **self._dt(),
        )

    def _generator(self) -> Generator:
        return Generator(
            out_channels=self.cfg.channels,
            channels=self.cfg.generator_channels,
            base_hw=self.cfg.generator_base_hw,
            base_ch=self.cfg.generator_base_ch,
            leaky_slope=self.cfg.leaky_slope,
            polyphase=self.cfg.generator_polyphase,
            packed_tail=self.cfg.generator_packed_tail,
            packed_tail_int8=self.cfg.packed_tail_int8,
            dense_int8=self.cfg.dense_int8,
            dense_w8=self.cfg.dense_w8,
            **self._dt(),
        )

    @property
    def hq_generator(self) -> Generator:
        return self._generator()

    @property
    def lq_generator(self) -> Generator:
        return self._generator()

    @property
    def latent_saliency(self) -> LatentSaliency:
        return LatentSaliency(**self._dt())

    @property
    def rd_optimizer(self) -> RDOptimizer:
        return RDOptimizer(
            bpp_norm_divisor=self.cfg.bpp_norm_divisor,
            leaky_slope=self.cfg.leaky_slope,
            **self._dt(),
        )

    def discriminator(self) -> Discriminator:
        return Discriminator(
            base_filters=self.cfg.disc_base_filters,
            max_filters=self.cfg.disc_max_filters,
            max_stages=self.cfg.disc_max_stages,
            dense_units=self.cfg.disc_dense_units,
            leaky_slope=self.cfg.leaky_slope,
            **self._dt(),
        )

    # ---------------------------------------------------------------- init/apply
    def init(self, rng: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
        """Initialize all codec components; returns {component: variables}."""
        h, w = self.cfg.img_size
        img = jnp.zeros((batch_size, h, w, self.cfg.channels), self._dt()["dtype"])
        mask = jnp.zeros((batch_size, h, w, 1), img.dtype)
        bpp = jnp.ones((batch_size, 1), img.dtype)
        keys = jax.random.split(rng, 7)

        hq_enc_vars = self.hq_encoder.init(keys[0], img, train=False)
        lq_enc_vars = self.lq_encoder.init(keys[1], img, train=False)
        hq_latent, hq_skips = self.hq_encoder.apply(hq_enc_vars, img, train=False)
        lq_latent, lq_skips = self.lq_encoder.apply(lq_enc_vars, img, train=False)

        return {
            "hq_encoder": hq_enc_vars,
            "lq_encoder": lq_enc_vars,
            "hq_generator": self.hq_generator.init(keys[2], hq_latent, hq_skips, train=False),
            "lq_generator": self.lq_generator.init(keys[3], lq_latent, lq_skips, train=False),
            "latent_saliency_hq": self.latent_saliency.init(keys[4], hq_latent),
            "latent_saliency_lq": self.latent_saliency.init(keys[5], lq_latent),
            "rd_optimizer": self.rd_optimizer.init(keys[6], img, mask, bpp),
        }

    def _zero_skips(self, batch: int, dtype) -> Tuple[jnp.ndarray, ...]:
        """All-zero skip tensors with the encoder's output shapes
        (skip_i: (B, H/2^i, W/2^i, encoder_channels[i-1]))."""
        h, w = self.cfg.img_size
        ch = self.cfg.encoder_channels
        return tuple(
            jnp.zeros((batch, h >> i, w >> i, ch[i - 1]), dtype)
            for i in (1, 2, 3)
        )

    def _mask_skips(
        self, mask: jnp.ndarray, dyn_thr: jnp.ndarray, dtype
    ) -> Tuple[jnp.ndarray, ...]:
        """skip_mode='mask': skip tensors carrying the two decode-side spatial
        signals -- channel 0 = saliency mask, channel 1 = per-pixel HQ/LQ
        blend map -- resized to each skip resolution; remaining channels zero.

        Both planes are already in the bitstream container (the mask thumbnail
        is stored, the blend map is a deterministic function of mask +
        target_bpp), so this conditions the generators on spatial layout at
        ZERO rate cost, with shapes/params identical to the other skip modes.
        Exists to close part of the skip-free codec's quality gap (the
        reference's generators get full encoder skips, GAN_functions.py:
        256-266; the storable codec severed them in skip_mode='zero')."""
        h, w = self.cfg.img_size
        ch = self.cfg.encoder_channels
        batch = mask.shape[0]
        planes = jnp.concatenate(
            [mask.astype(jnp.float32), dyn_thr.astype(jnp.float32)], axis=-1
        )
        skips = []
        for i in (1, 2, 3):
            hh, ww = h >> i, w >> i
            p = jax.image.resize(planes, (batch, hh, ww, 2), method="linear")
            skips.append(
                jnp.concatenate(
                    [p.astype(dtype), jnp.zeros((batch, hh, ww, ch[i - 1] - 2), dtype)],
                    axis=-1,
                )
            )
        return tuple(skips)

    def decode_latents(
        self,
        variables: Dict[str, Any],
        hq_latent_q: jnp.ndarray,
        lq_latent_q: jnp.ndarray,
        mask: jnp.ndarray,
        target_bpp: jnp.ndarray,
    ) -> jnp.ndarray:
        """Decoder-only path: quantized latents + saliency mask + target bpp ->
        blended image, with NO encoder in the loop (zero or mask-derived
        skips, matching skip_mode). This is the decode side of the
        storable-codec format (skip_mode='zero'/'mask'); with
        skip_mode='encoder' checkpoints it reconstructs from the latent
        information alone, i.e. what the bitstream actually stores.

        The per-pixel blend uses the deterministic rate schedule
        (GAN_functions.py:631-657 semantics), so the only side information
        needed beyond the latents is the (downsampled) mask and the target
        bpp -- both carried in the container stream (ops/bitstream.py).
        """
        ct = jnp.dtype(self.cfg.dtype)
        zq_hq = hq_latent_q.astype(ct)
        zq_lq = lq_latent_q.astype(ct)
        mask = mask.astype(ct)
        target_bpp = target_bpp.astype(ct)
        _, threshold, _ = self.rd_schedule(target_bpp)
        dyn_thr = self.dynamic_threshold(mask, threshold)
        if self.cfg.skip_mode == "mask":
            skips = self._mask_skips(mask, dyn_thr, ct)
        else:
            skips = self._zero_skips(zq_hq.shape[0], ct)
        hq_out = self.hq_generator.apply(
            variables["hq_generator"], zq_hq, skips, train=False
        )
        lq_out = self.lq_generator.apply(
            variables["lq_generator"], zq_lq, skips, train=False
        )
        return hq_out * dyn_thr + lq_out * (1.0 - dyn_thr)

    def rd_schedule(self, target_bpp: jnp.ndarray):
        """The deterministic rate-parameter schedule actually applied by the codec
        (reference: GAN_functions.py:631-649). target_bpp: (B, 1).

        The quantizer leg depends on ModelConfig.rate_mode: 'reference' is the
        faithful falling schedule (anti-monotone on the real-bitstream axis --
        see the rate_mode docstring in config.py); 'fixed' rises with target
        bpp so measured rate and fidelity track the request. The threshold and
        overall-compression legs are mode-independent (already monotone the
        right way)."""
        cfg = self.cfg
        b = jnp.clip(target_bpp / cfg.bpp_norm_divisor, 0.0, 1.0)
        overall = 1.0 - cfg.overall_compression_slope * b
        threshold = cfg.hq_lq_threshold_base - cfg.hq_lq_threshold_slope * b
        if cfg.rate_mode == "fixed":
            quant = jnp.clip(
                cfg.fixed_quant_base + cfg.fixed_quant_slope * b,
                0.0, cfg.fixed_quant_max,
            )
        elif cfg.rate_mode == "reference":
            quant = cfg.quant_strength_base - cfg.quant_strength_slope * b
        else:
            raise ValueError(f"unknown rate_mode {cfg.rate_mode!r}")
        return overall, threshold, quant

    def dynamic_threshold(self, mask: jnp.ndarray, threshold: jnp.ndarray):
        """Per-pixel soft (or hard) HQ/LQ map (reference: GAN_functions.py:651-657;
        hard variant: GAN_test.py:193-195). mask: (B,H,W,1); threshold: (B,1)."""
        cfg = self.cfg
        enhanced = jnp.power(jnp.maximum(mask, 0.0), cfg.saliency_gamma)
        thr = threshold[:, :, None, None]  # (B,1,1,1)
        if cfg.threshold_mode == "hard":
            return (enhanced > thr).astype(mask.dtype)
        return jax.nn.sigmoid((enhanced - thr) * cfg.threshold_sharpness)

    def apply(
        self,
        variables: Dict[str, Any],
        img: jnp.ndarray,
        mask: jnp.ndarray,
        target_bpp: jnp.ndarray,
        train: bool = False,
        detach_for_training: bool = False,
    ) -> Tuple[CodecOutput, Dict[str, Any]]:
        """Run the codec.

        detach_for_training=True reproduces the reference's three-GradientTape
        gradient routing in a single backward pass (GAN_train.py:231,369-389):
          - the quantizer's saliency score is computed with DETACHED latent-saliency
            params (g_loss gradients reach the encoders through the latent, but
            never touch the LS weights -- exactly tape g over g weights);
          - the LS-loss score is computed from a DETACHED latent (ls_loss gradients
            reach the LS weights only -- exactly tape ls over ls weights);
          - rd_params feed only the RD loss, and nothing else, so rd gradients
            isolate to the RD network automatically.

        Returns (CodecOutput, batch_stats updates {component: dict} when train).
        """
        cfg = self.cfg
        # Inputs compute in the configured dtype (bf16 under mixed precision /
        # bf16 inference). Without this the fp32 mask keeps the threshold/blend
        # epilogue -- and everything downstream -- in fp32.
        ct = jnp.dtype(cfg.dtype)
        img = img.astype(ct)
        mask = mask.astype(ct)
        target_bpp = target_bpp.astype(ct)
        updates: Dict[str, Any] = {}

        def run(name, module, *args, has_bn=True, method=None):
            if train and has_bn:
                out, mut = module.apply(
                    variables[name], *args, train=True, mutable=["batch_stats"]
                )
                updates[name] = mut["batch_stats"]
                return out
            if has_bn:
                return module.apply(variables[name], *args, train=False)
            return module.apply(variables[name], *args)

        hq_latent, hq_skips = run("hq_encoder", self.hq_encoder, img)
        lq_latent, lq_skips = run("lq_encoder", self.lq_encoder, img)

        overall, threshold, quant_strength = self.rd_schedule(target_bpp)
        dyn_thr = self.dynamic_threshold(mask, threshold)

        if cfg.skip_mode == "zero":
            # Storable-codec mode: sever the encoder->generator bypass so the
            # quantized latents carry ALL image information (see ModelConfig).
            hq_skips = self._zero_skips(img.shape[0], ct)
            lq_skips = hq_skips
        elif cfg.skip_mode == "mask":
            # Storable-codec mode with decode-side spatial conditioning: the
            # skips carry only information the container already stores.
            hq_skips = self._mask_skips(mask, dyn_thr, ct)
            lq_skips = hq_skips

        ls_hq_vars = variables["latent_saliency_hq"]
        ls_lq_vars = variables["latent_saliency_lq"]
        if detach_for_training:
            s_hq_quant = self.latent_saliency.apply(_sg_params(ls_hq_vars), hq_latent)
            s_lq_quant = self.latent_saliency.apply(_sg_params(ls_lq_vars), lq_latent)
            s_hq_loss = self.latent_saliency.apply(
                ls_hq_vars, jax.lax.stop_gradient(hq_latent)
            )
            s_lq_loss = self.latent_saliency.apply(
                ls_lq_vars, jax.lax.stop_gradient(lq_latent)
            )
        else:
            s_hq_quant = self.latent_saliency.apply(ls_hq_vars, hq_latent)
            s_lq_quant = self.latent_saliency.apply(ls_lq_vars, lq_latent)
            s_hq_loss, s_lq_loss = s_hq_quant, s_lq_quant

        rd_params = self.rd_optimizer.apply(
            variables["rd_optimizer"], img, mask, target_bpp
        )

        if cfg.quant_bypass:
            # Measurement flag (see ModelConfig.quant_bypass): expose the
            # architecture ceiling by letting the generators see unquantized
            # latents. Not storable; eval-only.
            zq_hq, zq_lq = hq_latent, lq_latent
        else:
            qcfg = cfg.resolved_quantizer()  # 'auto' -> topology-measured mode
            zq_hq = adaptive_quantize(hq_latent, s_hq_quant, quant_strength, qcfg)
            zq_lq = adaptive_quantize(lq_latent, s_lq_quant, quant_strength, qcfg)

        hq_out = run("hq_generator", self.hq_generator, zq_hq, hq_skips)
        lq_out = run("lq_generator", self.lq_generator, zq_lq, lq_skips)

        blended = hq_out * dyn_thr + lq_out * (1.0 - dyn_thr)

        return (
            CodecOutput(
                blended=blended,
                hq_latent_q=zq_hq,
                lq_latent_q=zq_lq,
                rd_params=rd_params,
                dynamic_threshold=dyn_thr,
                hq_latent=hq_latent,
                lq_latent=lq_latent,
                hq_saliency_quant=s_hq_quant,
                lq_saliency_quant=s_lq_quant,
                hq_saliency_loss=s_hq_loss,
                lq_saliency_loss=s_lq_loss,
                hq_output=hq_out,
                lq_output=lq_out,
                quant_strength=quant_strength,
                hq_lq_threshold=threshold,
                overall_compression=overall,
            ),
            updates,
        )
