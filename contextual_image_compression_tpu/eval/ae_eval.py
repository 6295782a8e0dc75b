"""Autoencoder evaluation (reference: test_autoencoder.py:1-123).

Batched: one jitted reconstruct over all test images, device-side uint8 metrics
(MSE / PSNR@255 / grayscale SSIM), then per-image JPEG writes for the
file-size-reduction metric -- which, as in the reference, is really 'JPEG size of
the reconstruction vs original file size' (test_autoencoder.py:68-73,102).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from contextual_image_compression_tpu.data import images as image_io
from contextual_image_compression_tpu.ops import metrics as metric_ops
from contextual_image_compression_tpu.train.ae_trainer import AETrainer


def evaluate_autoencoder(
    trainer: AETrainer,
    images01: np.ndarray,
    file_paths: Sequence[str],
    output_dir: str = "compressed_outputs",
) -> Dict[str, float]:
    """Returns average MSE / PSNR / SSIM / size-reduction%, mirroring the
    reference's printed summary (test_autoencoder.py:110-121)."""
    os.makedirs(output_dir, exist_ok=True)
    recon = trainer.reconstruct(images01)

    orig_u8 = np.clip(np.round(images01 * 255.0), 0, 255).astype(np.uint8)
    comp_u8 = np.clip(np.round(recon * 255.0), 0, 255).astype(np.uint8)
    m = jax.jit(metric_ops.ae_metrics)(jnp.asarray(orig_u8), jnp.asarray(comp_u8))

    size_reductions: List[float] = []
    for i, path in enumerate(file_paths):
        out_path = os.path.join(output_dir, os.path.basename(path))
        image_io.save_image_unit(recon[i], out_path)
        original_size = os.path.getsize(path)
        compressed_size = os.path.getsize(out_path)
        if original_size > 0:
            size_reductions.append((1 - compressed_size / original_size) * 100.0)

    results = {
        "mse": float(np.mean(np.asarray(m["mse"]))),
        "psnr": float(np.mean(np.asarray(m["psnr"]))),
        "ssim": float(np.mean(np.asarray(m["ssim"]))),
        "size_reduction": float(np.mean(size_reductions)) if size_reductions else float("nan"),
        "per_image": {
            "mse": [float(x) for x in np.asarray(m["mse"])],
            "psnr": [float(x) for x in np.asarray(m["psnr"])],
            "ssim": [float(x) for x in np.asarray(m["ssim"])],
            "size_reduction": size_reductions,
        },
    }
    return results
