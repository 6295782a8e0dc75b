"""Latent saliency module (reference: GAN_functions.py:210-234): an MLP that scores
the importance of a latent vector, Dense 512 relu -> Dense 256 relu -> Dense 1 sigmoid.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from contextual_image_compression_tpu.models.layers import KDense


class LatentSaliency(nn.Module):
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent):
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.relu(KDense(512, name="dense1", **dt)(latent))
        x = nn.relu(KDense(256, name="dense2", **dt)(x))
        return nn.sigmoid(KDense(1, name="out", **dt)(x))
