"""Configuration dataclasses.

The reference keeps configuration as module-level ALL_CAPS constants
(reference: GAN_train.py:29-35, GAN_test.py:23-35, train_autoencoder.py:60-61).
Here every subsystem takes an explicit, immutable dataclass; the defaults below are the
reference's canonical values so a default-constructed config reproduces its experiments.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Shared defaults (reference: GAN_train.py:29-35)
# ---------------------------------------------------------------------------

IMG_SIZE: Tuple[int, int] = (256, 256)
BASE_LATENT_DIM: int = 512
BATCH_SIZE: int = 16
EPOCHS: int = 20
LEARNING_RATE: float = 1e-4
BPP_RANGE: Tuple[float, ...] = (0.1, 1.0, 2.0)
SEED: int = 42  # reference: GAN_train.py:25-26


@dataclasses.dataclass(frozen=True)
class SaliencyConfig:
    """On-device saliency engine (reference: GAN_functions.py:52-208).

    The reference calls OpenCV's C++ static saliency per image on the host CPU;
    here the whole pipeline is batched jnp running under jit on TPU.
    """

    method: str = "combined"  # 'spectral_residual' | 'fine_grained' | 'combined'
    # combined = 0.6*spectral + 0.4*fine_grained (reference: GAN_functions.py:94)
    combined_spectral_weight: float = 0.6
    combined_fine_weight: float = 0.4
    # Spectral residual operates at a fixed small resolution (canonical Hou & Zhang
    # 2007 / OpenCV both use 64x64).
    spectral_resolution: int = 64
    spectral_blur_sigma: float = 3.0
    # Evaluate the 64-point FFT/iFFT pair as explicit DFT-matrix matmuls (MXU)
    # instead of XLA's FFT custom call, and fold exp(residual+i*phase) into a
    # real rescale of (Re F, Im F) -- no angle/cos/sin transcendentals.
    # Default ON: with mask_spec_small it lifts the mask engine 50.9k -> 61.3k
    # img/s on v5e (runs/r3_saliency_sweep.log). On-chip divergence vs the FFT
    # custom call is ~1.5e-3 in the final mask (two different f32 algorithms
    # through the log-amplitude cancellation; see scripts/tpu_selftest.py) --
    # immaterial downstream of the Otsu threshold / 0.6-0.4 blend, and the
    # CPU cv2-parity tests pass identically under both cores.
    spectral_dft_matmul: bool = True
    # Feed the fused mask kernel the 64^2 spectral map and upsample INSIDE the
    # kernel (two in-VMEM matmuls) instead of round-tripping the (B, H, W) f32
    # map through HBM. Parity is exact (same operator matrices); measured
    # +4% mask engine alone, +20% with spectral_dft_matmul (v5e, b128).
    mask_spec_small: bool = True
    # Fine-grained center-surround box half-widths (integral-image scales).
    fine_grained_scales: Tuple[int, ...] = (1, 2, 3, 4, 5, 6)
    # Mask creation (reference: GAN_functions.py:159-208)
    mask_smooth: bool = True
    mask_bilateral_d: int = 9
    mask_bilateral_sigma_color: float = 75.0
    mask_bilateral_sigma_space: float = 75.0
    mask_gaussian_ksize: int = 31  # sigma derived per OpenCV rule => 5.0
    # Fused bilateral+gaussian+normalize Pallas kernel for the smooth-mask path
    # (TPU only; identical numerics to the jnp path, tested).
    mask_use_pallas: bool = True
    # Compute dtype of the fused mask kernel's windowed passes. 'bfloat16' was
    # measured SLOWER on v5e (34.0k vs 49.3k img/s: transpose/tiling overheads
    # beat the faster bf16 FMAs) -- kept as the record of that experiment;
    # 'float32' keeps the cv2-parity numerics and is the default.
    mask_engine_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # Adaptive threshold clamps (reference: GAN_functions.py:189-194)
    mask_threshold_min: float = 0.05
    mask_threshold_max: float = 0.5
    mask_percentile: float = 0.7


@dataclasses.dataclass(frozen=True)
class QuantizerConfig:
    """Saliency-adaptive latent quantization (reference: GAN_functions.py:429-446).

    grad_mode:
      'reference' -- round() contributes zero gradient w.r.t. the latent (the exact
        semantics of tf.round in the reference; the latent path is dead but the
        scale path -- through the latent-saliency score -- still carries gradient).
      'ste'       -- straight-through estimator: forward numerics identical, backward
        treats round as identity w.r.t. the latent. This fixes the reference's
        zero-gradient bottleneck defect.
      'auto'      -- resolve from the skip topology per the measured ablations
        (ModelConfig.resolved_quantizer): 'reference' for skip_mode='encoder'
        (runs/r3_ste_ablation: STE costs ~1.6 dB PSNR at 3-4x the bitstream
        entropy when skips carry reconstruction), 'ste' for skip_mode='zero'
        (runs/r4_skipfree: with the skips severed the latents are the only
        payload and need the gradient). Forward numerics are identical in all
        modes, so checkpoints and serving are unaffected by the choice.
    """

    grad_mode: str = "auto"  # 'auto' | 'reference' | 'ste'
    scale_coeff: float = 3.0  # scale = exp(3 * quant_strength * (1 - saliency))
    use_pallas: bool = True


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Adaptive GAN codec shapes (reference: GAN_functions.py:236-722)."""

    img_size: Tuple[int, int] = IMG_SIZE
    channels: int = 3
    base_latent_dim: int = BASE_LATENT_DIM  # LQ latent; HQ = 2x
    # Encoder conv channel progression (reference: GAN_functions.py:300-322)
    encoder_channels: Tuple[int, ...] = (64, 128, 256, 512)
    # Generator deconv channel progression (reference: GAN_functions.py:253-268)
    generator_channels: Tuple[int, ...] = (256, 128, 64, 32)
    generator_base_hw: int = 16  # dense -> 16x16x512 (reference: GAN_functions.py:247)
    generator_base_ch: int = 512
    # Polyphase lowering of the generators' transposed convs (identical numerics
    # and checkpoint layout). Measured on v5e: XLA's native input-dilated conv
    # lowering is ~1.9x FASTER than the polyphase form (4971 vs 2633 img/s at
    # batch 128) -- the phase interleave costs more bandwidth than the dilation
    # wastes compute -- so this stays off; the module is kept (tested) for
    # architectures where the tradeoff flips.
    generator_polyphase: bool = False
    # MXU-packed lowering of the generator tail (deconv4 -> BN -> LeakyReLU ->
    # out_conv -> tanh) for inference: the native tail runs its Cout=32 deconv at
    # 25% and its Cout=3 conv at ~2.3% MXU lane utilization; the packed form
    # (models/packed_tail.py) keeps all matmuls >= 48 lanes with identical
    # numerics and checkpoint layout. Train-mode calls fall back to the native
    # path (BatchNorm batch statistics need the pixel layout).
    generator_packed_tail: bool = False
    # int8 storage for the packed tail's planar intermediate (requires
    # generator_packed_tail; inference-only). The phase-planar tensor is the
    # codec's largest intermediate (537 MB/branch at b128 bf16) and both tail
    # convs are HBM-bound on it; storing it int8 with per-channel ranges
    # derived from the folded BN statistics (|shift| + 8*|bn_scale|, i.e. an
    # 8-sigma symmetric margin) halves that traffic. Measured on v5e b128:
    # -0.745 ms/branch on the tail composite (runs/r4_perf_experiments.log);
    # decoded-u8 parity vs the bf16 tail quantified at adoption (PERF_NOTES).
    # The serving tier and bench.py enable it; training never sees it.
    packed_tail_int8: bool = False
    # Lower the encoders' stride-2 conv2/conv3 as space-to-depth + k3/s1 convs
    # with remapped kernels (models/layers.py::conv4s2_s2d_kernel): the same
    # function with 4x the input lanes per MXU tap. Exact and differentiable;
    # checkpoint layout unchanged. Default per measurement (see PERF_NOTES.md).
    encoder_s2d_convs: bool = False
    # W8A8 int8 evaluation of the four giant latent/fc Dense layers (weight
    # streaming is their entire cost: ~800 MB of bf16 weights per forward).
    # Measured on v5e: LOSES (codec 5300 -> 4804 img/s at b128) -- the per-row
    # activation max/round/cast overhead exceeds the halved weight stream --
    # so default off; kept as the record of the experiment. Inference-only.
    dense_int8: bool = False
    # WEIGHT-ONLY int8 for the same four giant Dense layers (inference-only).
    # Unlike dense_int8, activations stay bf16 -- y = x @ (q_w * s_w) with the
    # per-output-column scale folded into the weight operand, so the only new
    # per-call work is the int8->bf16 convert that XLA fuses into the dot's
    # weight-operand load. Requires kernels pre-quantized OUTSIDE the jit via
    # models/layers.py::quantize_dense_w8 (serving quantizes once at load);
    # an unconverted fp kernel falls back to trace-time quantization (same
    # numerics, no bandwidth win). Measured on v5e b128 (scripts/r3_w8_dense.py):
    # the 4-layer stack 1.253 -> 0.675 ms -- the weight stream halves and, with
    # the scale on the operand, the convert chain still streams int8. Weight
    # rounding error is ~1.1e-2 rel RMS per layer (vs the ~4e-3 the bf16 cast
    # already accepts); see PERF_NOTES for the decoded-image quality delta.
    dense_w8: bool = False
    leaky_slope: float = 0.2
    # Self-attention at 32x32x256 in the HQ encoder only (reference: GAN_functions.py:315-318)
    hq_attention: bool = True
    attention_use_pallas: bool = True
    # Discriminator (reference: GAN_functions.py:448-493)
    disc_base_filters: int = 16
    disc_max_filters: int = 128
    disc_max_stages: int = 4
    disc_dense_units: int = 128
    # RD parameter schedule (reference: GAN_functions.py:631-649)
    bpp_norm_divisor: float = 5.0
    overall_compression_slope: float = 0.8
    hq_lq_threshold_base: float = 0.9
    hq_lq_threshold_slope: float = 0.85
    quant_strength_base: float = 0.9
    quant_strength_slope: float = 0.8
    # Rate-control mode for the quantizer leg of the schedule.
    #
    # 'reference' reproduces GAN_functions.py:631-649 exactly: quant_strength
    # FALLS as target bpp rises (0.9 - 0.8*b), so the quantizer grid gets
    # COARSER when more bits are requested. On the reference's analytic bpp
    # axis this is invisible (analytic bpp is driven by hq_ratio, which does
    # rise, GAN_test.py:314-325) -- but on the real-bitstream axis this
    # framework added, the faithful schedule is anti-monotone: measured
    # container bpp AND PSNR both fall as target bpp rises 0.1 -> 2.0
    # (runs/r4_skipfree: 0.292 -> 0.270 bpp, 21.99 -> 21.41 dB).
    #
    # 'fixed' makes rate control real on the measured axis: quant_strength
    # RISES with target bpp (clip(base + slope*b, 0, max)), so the grid scale
    # exp(3*q*(1-s)) -- and with it the entropy-coded latent rate and decode
    # fidelity -- increases monotonically with the requested rate. The
    # hq/lq threshold and overall-compression legs stay faithful (they
    # already move the right way). Trained/measured in runs/r5_rate_control.
    rate_mode: str = "reference"  # 'reference' | 'fixed'
    fixed_quant_base: float = 0.1
    fixed_quant_slope: float = 6.0
    fixed_quant_max: float = 4.0
    saliency_gamma: float = 0.7  # enhanced = mask**0.7 (reference: GAN_functions.py:651)
    threshold_sharpness: float = 20.0  # sigmoid slope (reference: GAN_functions.py:656)
    # 'sigmoid' is the training-path blend; 'hard' reproduces the rebuilt eval graph's
    # binary threshold (reference: GAN_test.py:193-195).
    threshold_mode: str = "sigmoid"  # 'sigmoid' | 'hard'
    # Skip-connection routing. 'encoder' is the reference architecture: the
    # generators concat encoder skip tensors that BYPASS the quantized latent
    # (GAN_functions.py:256-266), so the latent bitstream alone cannot
    # reconstruct an image. 'zero' feeds all-zero skips instead (same shapes,
    # same parameter tree, checkpoint-compatible): every bit of image
    # information is forced through the quantized latents, making the latent
    # bitstream a true storable/decodable format (decode needs no encoder).
    # 'mask' is 'zero' plus decode-side spatial conditioning: channel 0 of
    # each skip tensor carries the saliency mask resized to that resolution
    # and channel 1 the per-pixel HQ/LQ blend map (both already in the CICZ
    # container, ops/bitstream.pack_container -- ZERO extra bits), the rest
    # stay zero. Same shapes and parameter tree as 'encoder'/'zero', so
    # checkpoints remain interchangeable, and decode still needs no encoder.
    # Train with 'zero'/'mask' (or fine-tune from an 'encoder' checkpoint)
    # before serving; see serve.CompressionPipeline.decode_from_bitstream.
    skip_mode: str = "encoder"  # 'encoder' | 'zero' | 'mask'
    # Bypass the quantizer entirely (zq = latent, fp32/bf16 grid): an
    # EVAL-ONLY measurement flag that exposes the architecture's quality
    # ceiling -- what the generators could deliver if quantization were free.
    # Not a codec mode: nothing storable corresponds to it (the container
    # serializes integer symbols). Used by scripts/eval_bitstream.py
    # --quant-bypass for the runs/r5 ceiling measurement.
    quant_bypass: bool = False
    quantizer: QuantizerConfig = QuantizerConfig()
    dtype: str = "float32"  # compute dtype; 'bfloat16' for fast inference
    param_dtype: str = "float32"

    @property
    def img_shape(self) -> Tuple[int, int, int]:
        return (self.img_size[0], self.img_size[1], self.channels)

    @property
    def hq_latent_dim(self) -> int:
        return self.base_latent_dim * 2

    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def resolved_quantizer(self) -> QuantizerConfig:
        """QuantizerConfig with grad_mode='auto' resolved by skip topology
        (see QuantizerConfig.grad_mode for the measurements behind the map)."""
        q = self.quantizer
        if q.grad_mode != "auto":
            return q
        mode = "reference" if self.skip_mode == "encoder" else "ste"
        return dataclasses.replace(q, grad_mode=mode)


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    """Baseline skip-connection autoencoder (reference: train_autoencoder.py:9-40)."""

    img_size: Tuple[int, int] = (128, 128)
    channels: int = 3
    enc_channels: Tuple[int, int] = (32, 64)
    epochs: int = 50
    batch_size: int = 16
    validation_split: float = 0.1
    learning_rate: float = 1e-3  # keras Adam default
    dtype: str = "float32"

    @property
    def img_shape(self) -> Tuple[int, int, int]:
        return (self.img_size[0], self.img_size[1], self.channels)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Generator multi-loss weights (reference: GAN_train.py:351-365)."""

    recon_weight: float = 0.35
    l1_weight: float = 0.15
    perceptual_weight: float = 0.15
    adv_weight: float = 0.15
    bitrate_weight: float = 0.20
    g_loss_floor: float = 0.5  # floor-offset hack (reference: GAN_train.py:360-361)
    g_loss_floor_coeff: float = 0.5
    ls_loss_weight: float = 0.1  # (reference: GAN_train.py:364)
    rd_loss_weight: float = 0.3  # (reference: GAN_train.py:365)
    rd_bitrate_weight: float = 0.7
    # perceptual internals (reference: GAN_train.py:256-287)
    perceptual_layer_weights: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.3, 0.3)
    perceptual_scale: float = 0.5
    # label smoothing (reference: GAN_train.py:212-213)
    d_real_label: float = 0.9
    d_fake_label: float = 0.1
    # rd target mapping (reference: GAN_train.py:313-314)
    rd_target_bpp_divisor: float = 4.0
    rd_target_clip: Tuple[float, float] = (0.1, 0.9)
    # The reference's TF code broadcasts (B,1) against (B,) producing (B,B) loss
    # matrices in the latent-saliency and bitrate terms (GAN_train.py:307-308,333-335).
    # False = per-sample (correct) semantics; True = bug-compatible mode.
    reference_broadcast_quirk: bool = False
    # Per-branch reconstruction loss: weight * (MSE(img, hq_out) + MSE(img,
    # lq_out)) added to the generator loss. The reference trains ONLY the
    # blended output (GAN_train.py:247), and with the training-time blend map
    # nearly all-LQ (dynamic_threshold mean ~0.008 on mask means ~0.14,
    # GAN_functions.py:655-657) the HQ generator receives essentially no
    # reconstruction signal -- measured on the round-5 trained checkpoint:
    # HQ branch alone decodes at 14.65 dB vs LQ 22.50 dB, so every blend
    # shift toward HQ at eval LOWERS quality and PSNR falls as target bpp
    # rises regardless of the rate schedule (runs/r5_rate_control). With this
    # term both branches train on the full image and the blend leg moves
    # quality the right way. 0.0 = reference-faithful (term compiled out).
    branch_recon_weight: float = 0.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """GAN training harness (reference: GAN_train.py:24-47,129-622)."""

    model: ModelConfig = ModelConfig()
    loss: LossConfig = LossConfig()
    saliency: SaliencyConfig = SaliencyConfig()
    batch_size: int = BATCH_SIZE
    epochs: int = EPOCHS
    learning_rate: float = LEARNING_RATE
    ls_lr_scale: float = 0.5  # latent-saliency optimizer LR (reference: GAN_train.py:159)
    rd_lr_scale: float = 0.5  # rd optimizer LR (reference: GAN_train.py:160)
    clipnorm: float = 1.0  # per-variable norm clip, keras semantics (GAN_train.py:157-160)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-7  # keras default
    bpp_range: Tuple[float, ...] = BPP_RANGE
    d_every_n_steps: int = 2  # D trained every other step (reference: GAN_train.py:426-428)
    fine_tune_epochs: int = 3  # per fixed bpp (reference: GAN_train.py:690)
    seed: int = SEED
    use_perceptual: bool = True  # falls back to off if no VGG weights, like
    # reference: GAN_train.py:187-195
    vgg_weights_path: str = ""  # optional .npz with VGG19 conv weights
    checkpoint_every: int = 5  # epochs (reference: GAN_train.py:548)
    results_dir: str = "results"
    model_dir: str = "models_ckpt"
    sample_visualizations: int = 4  # per-epoch sample grids (reference: GAN_train.py:401-408)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for distributed training (new design; absent in the reference,
    which is single-device -- SURVEY.md section 2.5)."""

    data_axis: str = "data"
    model_axis: str = "model"
    # model-parallel degree; data-parallel fills the rest of the devices.
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation harness (reference: GAN_test.py:23-35)."""

    model: ModelConfig = ModelConfig()
    saliency: SaliencyConfig = SaliencyConfig()
    bpp_values: Tuple[float, ...] = BPP_RANGE
    rate_control_bpps: int = 10  # linspace(0.1, 2.0, 10) (reference: GAN_test.py:534)
    rate_control_bpp_range: Tuple[float, float] = (0.1, 2.0)
    rate_control_max_images: int = 4  # (reference: GAN_test.py:550)
    results_dir: str = "test_results"
    model_dir: str = "models_ckpt"
    test_dir: str = "test_dataset"
    batch_size: int = 16


@dataclasses.dataclass(frozen=True)
class DCTCodecConfig:
    """JPEG-style 8x8 DCT baseline codec (new; the reference's only DCT/JPEG use is
    cv2.imwrite in test_autoencoder.py:93)."""

    quality: int = 75
    block: int = 8
    use_pallas: bool = True


def analytic_bpp(hq_ratio, base_latent_dim: int = BASE_LATENT_DIM,
                 img_size: Tuple[int, int] = IMG_SIZE):
    """The reference's analytic bits-per-pixel model.

    bpp = (hq_ratio * (2*D) * 32 + (1 - hq_ratio) * D * 32) / (H*W)
    (reference: GAN_test.py:314-325, GAN_train.py:325-330; 32 bits per float latent.)
    Attainable range for D=512, 256x256: [0.25, 0.50] bpp.
    """
    hq_bits = hq_ratio * (base_latent_dim * 2) * 32.0
    lq_bits = (1.0 - hq_ratio) * base_latent_dim * 32.0
    return (hq_bits + lq_bits) / float(img_size[0] * img_size[1])
