"""On-device batched static saliency.

The reference computes saliency per image on the host CPU through OpenCV's C++
implementations (reference: GAN_functions.py:52-121):
  - spectral residual (Hou & Zhang 2007) via cv2.saliency.StaticSaliencySpectralResidual
  - fine grained (Montabone & Soto 2010, integral-image center-surround) via
    cv2.saliency.StaticSaliencyFineGrained
  - 'combined' = 0.6*spectral + 0.4*fine_grained, max-normalized
    (reference: GAN_functions.py:94-98)

Here both algorithms are re-derived from their papers as pure jnp math (FFT for the
spectral residual, separable box filters for the integral-image center-surround), so
the whole pipeline is batched, differentiable where meaningful, and runs under jit on
TPU -- removing the reference's dominant non-training cost (SURVEY.md section 3.2).

Inputs are (..., H, W, 3) images in [-1, 1] (the GAN normalization) or (..., H, W)
grayscale in any nonnegative scale; outputs are (..., H, W) maps in [0, 1].
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from contextual_image_compression_tpu.config import SaliencyConfig
from contextual_image_compression_tpu.ops import image_ops as iops


def _as_gray(image: jnp.ndarray) -> jnp.ndarray:
    """Accept (..., H, W, 3) in [-1,1] or (..., H, W); return (..., H, W) gray in [0,255]."""
    if image.ndim >= 3 and image.shape[-1] == 3:
        # Undo the GAN normalization the way the reference does before calling OpenCV
        # (reference: GAN_functions.py:63-67).
        img_255 = (image + 1.0) * 127.5
        return iops.rgb_to_gray(img_255)
    return image.astype(jnp.float32)


def _resize_op_matrix(src: int, dst: int) -> jnp.ndarray:
    """The (dst, src) matrix of jax.image.resize(..., method='linear') along one
    axis, extracted by pushing an identity through resize itself -- so the
    matmul lowering below is the SAME linear map (to f32 rounding)."""
    return jax.image.resize(jnp.eye(src, dtype=jnp.float32), (dst, src),
                            method="linear")


def _blur_op_matrix(n: int, ksize: int, sigma: float) -> jnp.ndarray:
    """The (n, n) matrix of the separable reflect-101 Gaussian along one axis,
    extracted by blurring an identity along axis -2 only."""
    kern = jnp.asarray(iops.gaussian_kernel_1d(ksize, sigma))
    return iops._conv_sep_axis(jnp.eye(n, dtype=jnp.float32), kern, axis=-2)


def _box_op_matrix(n: int, ksize: int) -> jnp.ndarray:
    """The (n, n) matrix of the normalized reflect-101 box mean along one axis
    (iops.box_filter's small-kernel path), extracted from an identity."""
    kern = jnp.full((ksize,), 1.0 / ksize, dtype=jnp.float32)
    return iops._conv_sep_axis(jnp.eye(n, dtype=jnp.float32), kern, axis=-2)


def _box_mean_matmul(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """box_filter(x, ksize) on the last two axes as two operator matmuls."""
    bm = _box_op_matrix(x.shape[-1], ksize)
    x = jnp.einsum("ih,bhw->biw", bm, x)
    return jnp.einsum("biw,jw->bij", x, bm)


def _dft_matrices(n: int):
    """Real/imag parts of the (symmetric) n-point DFT matrix exp(-2*pi*i*jk/n).

    Built in float64 numpy (n is static, so these are trace-time constants)
    with j*k reduced mod n first: in f32, cos((2pi/n)*jk) for jk up to
    (n-1)^2 carries ~|ang|*2^-24 ~ 2e-5 absolute angle error, which the
    log-amplitude cancellation downstream amplifies past the on-chip parity
    bound. Mod-n reduction + f64 evaluation gives entries correctly rounded
    to f32."""
    jk = np.outer(np.arange(n), np.arange(n)) % n
    ang = (2.0 * math.pi / n) * jk.astype(np.float64)
    return (jnp.asarray(np.cos(ang), dtype=jnp.float32),
            jnp.asarray(-np.sin(ang), dtype=jnp.float32))


def _spectral_core_dft(small: jnp.ndarray) -> jnp.ndarray:
    """FFT -> residual -> iFFT -> squared magnitude, with the DFT pair as
    explicit matmuls: fft2(x) = D x D for the symmetric DFT matrix D, so the
    whole transform is four (B*64, 64)x(64, 64) real matmuls each way -- MXU
    noise at the codec's shapes, vs XLA's FFT custom call. The phase factor
    exp(i*angle(F)) is folded algebraically: exp(residual + i*phase)
    = exp(residual)/|F| * (Re F + i Im F), removing angle/cos/sin VPU
    transcendentals entirely. (exp(residual) = (|F| + eps) * exp(-boxmean),
    so the rescale is ~exp(-boxmean) -- finite even at |F| = 0.)

    The DFT matmuls run at Precision.HIGHEST: at the TPU default (bf16
    passes) the ~2^-8 relative error in F is amplified by log(|F|) where
    |F| is small (heavy cancellation off the DC bin), and the on-chip mask
    diverged from the FFT path by 3.5e-2 (runs/tpu_selftest_r3.log). At
    HIGHEST the 64-point matmuls are still MXU noise and the divergence
    drops to ~1.5e-3 -- the residual is genuine cross-algorithm f32 rounding
    (FFT custom call vs DFT factorization through the cancellation), bounded
    at 4e-3 by scripts/tpu_selftest.py and immaterial downstream of the
    Otsu threshold / 0.6-0.4 blend."""
    n = small.shape[-1]
    hi = jax.lax.Precision.HIGHEST

    def ein(spec, a, b):
        return jnp.einsum(spec, a, b, precision=hi)

    dr, di = _dft_matrices(n)
    # t = small @ D (last axis), then F = D @ t (row axis); small is real.
    tr = ein("bhw,wk->bhk", small, dr)
    ti = ein("bhw,wk->bhk", small, di)
    fr = ein("jh,bhk->bjk", dr, tr) - ein("jh,bhk->bjk", di, ti)
    fi = ein("jh,bhk->bjk", dr, ti) + ein("jh,bhk->bjk", di, tr)

    amplitude = jnp.sqrt(fr * fr + fi * fi)
    log_amp = jnp.log(amplitude + 1e-9)
    residual = log_amp - _box_mean_matmul(log_amp, 3)
    scale = jnp.exp(residual) / jnp.maximum(amplitude, 1e-30)
    rr = fr * scale
    ri = fi * scale

    # ifft2(R) = (1/n^2) conj(D) R conj(D); conj(D) = (dr, -di).
    ur = ein("bhw,wk->bhk", rr, dr) + ein("bhw,wk->bhk", ri, di)
    ui = ein("bhw,wk->bhk", ri, dr) - ein("bhw,wk->bhk", rr, di)
    gr = ein("jh,bhk->bjk", dr, ur) + ein("jh,bhk->bjk", di, ui)
    gi = ein("jh,bhk->bjk", dr, ui) - ein("jh,bhk->bjk", di, ur)
    return (gr * gr + gi * gi) * (1.0 / float(n) ** 4)


def _spectral_core_fft(small: jnp.ndarray) -> jnp.ndarray:
    """FFT -> residual -> iFFT -> squared magnitude via jnp.fft.

    The phase factor is folded algebraically: exp(residual + i*phase)
    = exp(residual)/|F| * (Re F + i Im F) -- no angle/cos/sin VPU
    transcendentals, and no complex exp (which is not lowered on all TPU
    runtimes; lax.complex of real parts is)."""
    f = jnp.fft.fft2(small)
    fr, fi = jnp.real(f), jnp.imag(f)
    amplitude = jnp.sqrt(fr * fr + fi * fi)
    log_amp = jnp.log(amplitude + 1e-9)
    residual = log_amp - _box_mean_matmul(log_amp, 3)
    scale = jnp.exp(residual) / jnp.maximum(amplitude, 1e-30)
    recombined = jax.lax.complex(fr * scale, fi * scale)
    return jnp.abs(jnp.fft.ifft2(recombined)) ** 2


def spectral_residual_saliency(
    image: jnp.ndarray,
    resolution: int = 64,
    blur_sigma: float = 3.0,
    dft_matmul: bool = False,
) -> jnp.ndarray:
    """Spectral-residual saliency (Hou & Zhang 2007).

    gray -> resize to `resolution`^2 -> FFT -> log-amplitude minus its 3x3 box mean
    (the 'residual') -> inverse FFT with the original phase -> squared magnitude ->
    Gaussian smooth -> min-max normalize -> resize back.

    Batched over leading axes; the FFTs and filters all run on device.

    The resizes and the 64^2 Gaussian evaluate as explicit operator-matrix
    matmuls (built from jax.image.resize / the separable blur applied to an
    identity, so the linear maps are identical): measured on v5e at b128,
    XLA's gather-based resize lowering alone cost 0.6+ ms/batch, ~half the
    whole spectral stage, while the equivalent (64, 256)x(256, 256) matmuls
    are MXU noise. The minmax normalization commutes with the (constant-
    preserving) linear upsample, so it stays at 64^2.
    """
    gray = _as_gray(image)
    h, w = gray.shape[-2], gray.shape[-1]
    lead = gray.shape[:-2]
    sal = spectral_residual_small(image, resolution, blur_sigma, dft_matmul)
    sal = sal.reshape((-1, resolution, resolution))
    wup_h = _resize_op_matrix(resolution, h)
    wup_w = _resize_op_matrix(resolution, w)
    out = jnp.einsum("ih,bhw->biw", wup_h, sal)
    out = jnp.einsum("biw,jw->bij", out, wup_w)
    return out.reshape(lead + (h, w))


def spectral_residual_small(
    image: jnp.ndarray,
    resolution: int = 64,
    blur_sigma: float = 3.0,
    dft_matmul: bool = False,
) -> jnp.ndarray:
    """The spectral-residual map at its native `resolution`^2, min-max
    normalized but NOT yet upsampled (the final linear upsample commutes with
    the normalization). Consumers that can upsample cheaply themselves (the
    fused mask kernel does it as two in-VMEM matmuls) take this form and skip
    the (B, H, W) f32 round trip through HBM."""
    gray = _as_gray(image)
    h, w = gray.shape[-2], gray.shape[-1]
    lead = gray.shape[:-2]
    g3 = gray.reshape((-1,) + gray.shape[-2:])

    wdn_h = _resize_op_matrix(h, resolution)
    wdn_w = _resize_op_matrix(w, resolution)
    small = jnp.einsum("ih,bhw->biw", wdn_h, g3)
    small = jnp.einsum("biw,jw->bij", small, wdn_w)

    core = _spectral_core_dft if dft_matmul else _spectral_core_fft
    sal = core(small)

    ksize = int(2 * math.ceil(3.0 * blur_sigma) + 1)
    blur = _blur_op_matrix(resolution, ksize, blur_sigma)
    sal = jnp.einsum("ih,bhw->biw", blur, sal)
    sal = jnp.einsum("biw,jw->bij", sal, blur)
    # normalize at 64^2, THEN upsample: identical to the reference order
    # because the linear resize is affine-preserving (rows sum to 1).
    sal = iops.normalize_minmax(sal)
    return sal.reshape(lead + (resolution, resolution))


def fine_grained_saliency(
    image: jnp.ndarray,
    scales: Sequence[int] = (1, 2, 3, 4, 5, 6),
) -> jnp.ndarray:
    """Fine-grained saliency (Montabone & Soto 2010).

    Center-surround differences of the intensity image computed with box means at a
    pyramid of surround sizes (the integral-image trick in the original paper is
    exactly a box filter, which is what we lower to -- two separable cumsum-free
    passes per scale): on = relu(I - surround), off = relu(surround - I), summed over
    scales and max-normalized.
    """
    gray = _as_gray(image) / 255.0
    on_total = jnp.zeros_like(gray)
    off_total = jnp.zeros_like(gray)
    for r in scales:
        surround = iops.box_filter(gray, 2 * r + 1)
        on_total = on_total + jnp.maximum(gray - surround, 0.0)
        off_total = off_total + jnp.maximum(surround - gray, 0.0)
    sal = on_total + off_total
    return iops.normalize_max(sal)


def compute_saliency_map(
    image: jnp.ndarray,
    method: str = "combined",
    config: SaliencyConfig | None = None,
) -> jnp.ndarray:
    """Dispatching equivalent of the reference's compute_saliency_map
    (reference: GAN_functions.py:52-121), batched.

    'combined' = 0.6*spectral + 0.4*fine_grained then max-normalize
    (reference: GAN_functions.py:94-98). Unlike the reference there is no runtime
    failure mode to fall back from (no external library calls), so the uniform-map
    fallback path (GAN_functions.py:88-89,114-115) is unnecessary by construction.
    """
    cfg = config or SaliencyConfig()
    if method == "spectral_residual":
        return spectral_residual_saliency(
            image, cfg.spectral_resolution, cfg.spectral_blur_sigma,
            dft_matmul=cfg.spectral_dft_matmul,
        )
    if method == "fine_grained":
        return fine_grained_saliency(image, cfg.fine_grained_scales)
    if method == "combined":
        spec = spectral_residual_saliency(
            image, cfg.spectral_resolution, cfg.spectral_blur_sigma,
            dft_matmul=cfg.spectral_dft_matmul,
        )
        fine = fine_grained_saliency(image, cfg.fine_grained_scales)
        combined = cfg.combined_spectral_weight * spec + cfg.combined_fine_weight * fine
        return iops.normalize_max(combined)
    raise ValueError(f"Unsupported saliency method: {method}")
