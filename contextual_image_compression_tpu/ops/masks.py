"""Saliency-mask creation: Otsu + percentile adaptive thresholding and the smooth
(bilateral + Gaussian) mask used for training.

Reference behavior being reproduced (GAN_functions.py:159-208):
  - adaptive threshold = min(Otsu(saliency*255), 70th-percentile-cumsum bin of a
    50-bin histogram), clamped to [0.05, 0.5]
  - smooth=True (the path actually used for training masks) ignores the threshold
    and returns bilateral(9,75,75) -> GaussianBlur(31x31, sigma=0 -> 5.0) ->
    max-normalize of the saliency map
  - smooth=False returns the binary mask (saliency > threshold)

Everything is batched jnp over leading axes; Otsu is a 256-bin histogram +
inter-class-variance argmax, jit-friendly (static shapes, no data-dependent control
flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from contextual_image_compression_tpu.config import SaliencyConfig
from contextual_image_compression_tpu.ops import image_ops as iops


def _histogram_fixed_bins(x: jnp.ndarray, nbins: int, lo: float, hi: float) -> jnp.ndarray:
    """Per-image histogram over the last two axes. x: (..., H, W) -> (..., nbins).

    Sort + searchsorted formulation: O(N log N) compute but O(N) memory (a one-hot
    scatter would materialize an (H, W, nbins) intermediate per image).
    """
    scaled = (x - lo) / (hi - lo) * nbins
    idx = jnp.clip(scaled.astype(jnp.int32), 0, nbins - 1)
    lead = idx.shape[:-2]
    flat = idx.reshape((-1, idx.shape[-2] * idx.shape[-1]))
    flat = jnp.sort(flat, axis=-1)
    queries = jnp.arange(nbins, dtype=jnp.int32)

    def per_image(sorted_idx):
        right = jnp.searchsorted(sorted_idx, queries, side="right")
        left = jnp.searchsorted(sorted_idx, queries, side="left")
        return (right - left).astype(jnp.float32)

    hist = jax.vmap(per_image)(flat)
    return hist.reshape(lead + (nbins,))


def otsu_threshold(x: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold of a [0,1] map, following cv2.threshold(..., THRESH_OTSU)
    on the uint8-quantized map (reference: GAN_functions.py:174-182). Returns the
    threshold normalized back to [0, 1]; batched over leading axes.
    """
    # cv2 quantizes to uint8 first; emulate (saliency*255).astype(uint8).
    u8 = jnp.clip(x * 255.0, 0, 255).astype(jnp.uint8).astype(jnp.float32)
    hist = _histogram_fixed_bins(u8 / 255.0, 256, 0.0, 1.0 + 1e-7)  # (..., 256)

    levels = jnp.arange(256, dtype=jnp.float32)
    total = jnp.sum(hist, axis=-1, keepdims=True)
    p = hist / jnp.maximum(total, 1.0)

    omega0 = jnp.cumsum(p, axis=-1)  # P(class0) for split at t (inclusive)
    mu_t = jnp.cumsum(p * levels, axis=-1)
    mu_total = mu_t[..., -1:]

    omega1 = 1.0 - omega0
    mu0 = mu_t / jnp.maximum(omega0, 1e-12)
    mu1 = (mu_total - mu_t) / jnp.maximum(omega1, 1e-12)

    sigma_b = omega0 * omega1 * (mu0 - mu1) ** 2
    # Invalid splits (empty class) get -inf so argmax picks a valid split, matching
    # cv2's guard (q1 in (0,1)).
    valid = (omega0 > 1e-12) & (omega1 > 1e-12)
    sigma_b = jnp.where(valid, sigma_b, -jnp.inf)
    t = jnp.argmax(sigma_b, axis=-1).astype(jnp.float32)
    return t / 255.0


def percentile_threshold(x: jnp.ndarray, percentile: float = 0.7, nbins: int = 50) -> jnp.ndarray:
    """The reference's distribution threshold: first 50-bin histogram bin (left edge)
    where the normalized cumulative sum exceeds `percentile`
    (reference: GAN_functions.py:185-190). Batched.
    """
    hist = _histogram_fixed_bins(x, nbins, 0.0, 1.0)
    cumsum = jnp.cumsum(hist, axis=-1)
    cumsum = cumsum / jnp.maximum(cumsum[..., -1:], 1.0)
    exceeded = cumsum > percentile
    # np.argmax over booleans: first True (0 if none -- same as numpy).
    first = jnp.argmax(exceeded, axis=-1).astype(jnp.float32)
    return first / nbins  # left bin edge, matching bins[argmax]


def adaptive_threshold(x: jnp.ndarray, config: SaliencyConfig | None = None) -> jnp.ndarray:
    """min(Otsu, percentile) clamped to [0.05, 0.5] (reference: GAN_functions.py:193-194)."""
    cfg = config or SaliencyConfig()
    t = jnp.minimum(otsu_threshold(x), percentile_threshold(x, cfg.mask_percentile))
    return jnp.clip(t, cfg.mask_threshold_min, cfg.mask_threshold_max)


def create_saliency_mask(
    saliency_map: jnp.ndarray,
    threshold: jnp.ndarray | float | None = None,
    smooth: bool = True,
    config: SaliencyConfig | None = None,
) -> jnp.ndarray:
    """Equivalent of the reference's create_saliency_mask (GAN_functions.py:159-208).

    smooth=True (default, the training path): continuous mask =
      max-normalize(GaussianBlur31(bilateral(saliency, 9, 75, 75))); the adaptive
      threshold is NOT consulted, faithfully reproducing the reference.
    smooth=False: binary mask (saliency > threshold), threshold adaptive when None.
    """
    cfg = config or SaliencyConfig()
    if smooth:
        if cfg.mask_use_pallas and jax.default_backend() == "tpu":
            # fused single-VMEM-pass kernel (identical numerics, ~100x less HBM
            # traffic) -- see ops/fused_mask.py
            from contextual_image_compression_tpu.ops.fused_mask import (
                smooth_mask_pallas,
            )

            return smooth_mask_pallas(
                saliency_map,
                d=cfg.mask_bilateral_d,
                sigma_color=cfg.mask_bilateral_sigma_color,
                sigma_space=cfg.mask_bilateral_sigma_space,
                gauss_ksize=cfg.mask_gaussian_ksize,
            )
        # saliency maps are max-normalized to [0,1] -> the Taylor range kernel
        # matches exp to ~1e-13 (see bilateral_filter docstring)
        mask = iops.bilateral_filter(
            saliency_map,
            d=cfg.mask_bilateral_d,
            sigma_color=cfg.mask_bilateral_sigma_color,
            sigma_space=cfg.mask_bilateral_sigma_space,
            unit_range=True,
        )
        mask = iops.gaussian_blur(mask, cfg.mask_gaussian_ksize, 0.0)
        return iops.normalize_max(mask)
    if threshold is None:
        threshold = adaptive_threshold(saliency_map, cfg)[..., None, None]
    return (saliency_map > threshold).astype(jnp.float32)


def compute_contextual_mask(
    images: jnp.ndarray, config: SaliencyConfig | None = None
) -> jnp.ndarray:
    """End-to-end contextual mask: saliency ('combined') -> smooth mask, with the
    fully fused Pallas path on TPU (fine-grained + combine + bilateral + Gaussian
    + normalize in ONE kernel; the cheap 64x64 FFT spectral residual stays in
    XLA). images: (B, H, W, 3) in [-1, 1] -- or uint8 in [0, 255], the
    production wire format: gray255 = rgb_to_gray(float(u8)) is computed
    in-graph, bit-identical to feeding the gray255 f32 image, while moving 4x
    fewer bytes. (A [-1,1] float image DEQUANTIZED from u8 is not the same
    input: for dark pixels the (x+1)*127.5 renormalization carries
    ~2^-24-scale rounding, which the spectral residual's log-amplitude
    cancellation can amplify to ~1e-2 in the mask, input-dependently --
    prefer the u8 wire; see scripts/tpu_selftest.py.)
    Returns (B, H, W) float32 masks."""
    from contextual_image_compression_tpu.ops import saliency as saliency_ops

    cfg = config or SaliencyConfig()
    if images.dtype == jnp.uint8:
        # decode path: saliency only needs gray255, computed exactly from u8
        gray255 = iops.rgb_to_gray(images.astype(jnp.float32))
        images = gray255  # (..., H, W) gray accepted by every path below
    if (
        cfg.mask_use_pallas
        and cfg.method == "combined"
        and cfg.mask_smooth
        and jax.default_backend() == "tpu"
    ):
        from contextual_image_compression_tpu.ops.fused_mask import (
            contextual_mask_pallas,
        )

        spectral_fn = (
            saliency_ops.spectral_residual_small
            if cfg.mask_spec_small
            else saliency_ops.spectral_residual_saliency
        )
        spec = spectral_fn(
            images, cfg.spectral_resolution, cfg.spectral_blur_sigma,
            dft_matmul=cfg.spectral_dft_matmul,
        )
        gray = saliency_ops._as_gray(images)
        batched = gray.ndim == 3
        if not batched:
            gray, spec = gray[None], spec[None]
        out = contextual_mask_pallas(
            gray, spec,
            scales=cfg.fine_grained_scales,
            spectral_weight=cfg.combined_spectral_weight,
            fine_weight=cfg.combined_fine_weight,
            d=cfg.mask_bilateral_d,
            sigma_color=cfg.mask_bilateral_sigma_color,
            sigma_space=cfg.mask_bilateral_sigma_space,
            gauss_ksize=cfg.mask_gaussian_ksize,
            compute_dtype=jnp.dtype(cfg.mask_engine_dtype),
        )
        return out if batched else out[0]
    sal = saliency_ops.compute_saliency_map(images, cfg.method, cfg)
    return create_saliency_mask(sal, smooth=cfg.mask_smooth, config=cfg)


def enhance_saliency_map(saliency_map: jnp.ndarray) -> jnp.ndarray:
    """Multi-scale saliency enhancement. Dead code in the reference
    (GAN_functions.py:123-157, never called) -- provided for capability parity:
    bilateral(9,75,75) -> weighted 3/9/15 Gaussian pyramid (0.5/0.3/0.2) ->
    gamma 0.8 -> clip [0,1].
    """
    filtered = iops.bilateral_filter(saliency_map, 9, 75.0, 75.0)
    scales = (3, 9, 15)
    weights = (0.5, 0.3, 0.2)
    enhanced = jnp.zeros_like(saliency_map)
    for w, k in zip(weights, scales):
        enhanced = enhanced + w * iops.gaussian_blur(filtered, k, 0.0)
    enhanced = jnp.power(jnp.maximum(enhanced, 0.0), 0.8)
    return jnp.clip(enhanced, 0.0, 1.0)
