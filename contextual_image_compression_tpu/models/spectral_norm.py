"""Spectral-normalized dense layer (reference: GAN_functions.py:376-426).

Dead code in the reference (the discriminator deliberately omits it,
GAN_functions.py:472) -- provided for capability parity. One power-iteration step per
call; the `u` vector is a non-trainable variable updated only when `update_stats`
(the reference updates it only under `training`, GAN_functions.py:417-418).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from contextual_image_compression_tpu.models.layers import glorot, zeros


def _l2_normalize(x, eps=1e-12):
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x), eps))


class SpectralNormDense(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        in_features = x.shape[-1]
        w = self.param("kernel", glorot, (in_features, self.features), self.param_dtype)
        b = self.param("bias", zeros, (self.features,), self.param_dtype)
        # Deterministic unit init (the reference draws N(0,1); power iteration makes
        # the starting direction irrelevant after a few steps).
        u_var = self.variable(
            "spectral_stats",
            "u",
            lambda: jnp.full((1, self.features), 1.0 / jnp.sqrt(float(self.features)),
                             self.param_dtype),
        )

        u_hat = u_var.value
        v_hat = _l2_normalize(u_hat @ w.T)  # (1, in)
        u_new = _l2_normalize(v_hat @ w)  # (1, out)
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = (v_hat @ w @ u_new.T)[0, 0]
        return x @ (w / sigma) + b
