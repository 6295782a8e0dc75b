"""TPU-native contextual (saliency-guided) learned image compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
hassanrizwank/Contextual-Image-Compression (reference mounted at /root/reference):

- a skip-connection convolutional autoencoder codec (reference: train_autoencoder.py:9-40)
- a saliency-adaptive dual-branch (HQ/LQ) GAN codec with latent quantization and
  target-bpp rate control (reference: GAN_functions.py:559-722)
- an on-device batched saliency engine (spectral residual + fine grained + combined),
  replacing the reference's per-image CPU OpenCV pipeline (GAN_functions.py:52-208)
- a multi-loss adversarial training harness (GAN_train.py:129-622) running data-parallel
  (+ tensor-parallel dense layers) over a `jax.sharding.Mesh`
- a rate-distortion evaluation suite (GAN_test.py:342-645)
- a batched 8x8 DCT/JPEG-style Pallas baseline codec for codec shootouts

Everything on the compute path is functional JAX under `jit`; hot fused ops are Pallas
TPU kernels with pure-jnp fallbacks (used automatically off-TPU).
"""

import os as _os

import jax as _jax

# Persistent compilation cache: big model + Pallas compiles cost 30s-7min on this
# class of TPU runtime and would otherwise be repaid by every process. Opt out
# with CIC_TPU_NO_COMPILE_CACHE=1 or by setting JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("CIC_TPU_NO_COMPILE_CACHE") and not _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR"
):
    try:
        _cache_dir = _os.path.expanduser("~/.cache/jax_compilation")
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # non-fatal on exotic runtimes
        pass

from contextual_image_compression_tpu import config as config
from contextual_image_compression_tpu.version import __version__ as __version__
