"""Baseline skip-connection convolutional autoencoder
(reference: train_autoencoder.py:9-40).

128x128x3 in [0,1] -> 32x32x64 bottleneck -> 128x128x3 sigmoid. The decoder
up-samples (nearest, like keras UpSampling2D) and concatenates re-convolved encoder
features (the reference's x2_resized / x1_resized U-Net-style trick).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from contextual_image_compression_tpu.models.layers import KConv


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsampling (keras UpSampling2D default)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class Autoencoder(nn.Module):
    out_channels: int = 3
    enc_channels: Tuple[int, int] = (32, 64)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c1, c2 = self.enc_channels
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.enc_conv1 = KConv(c1, 3, 1, name="enc_conv1", **dt)
        self.enc_conv2 = KConv(c2, 3, 1, name="enc_conv2", **dt)
        self.dec_conv1 = KConv(c2, 3, 1, name="dec_conv1", **dt)
        self.skip_conv2 = KConv(c2, 3, 1, name="skip_conv2", **dt)
        self.dec_conv2 = KConv(c1, 3, 1, name="dec_conv2", **dt)
        self.skip_conv1 = KConv(c1, 3, 1, name="skip_conv1", **dt)
        self.out_conv = KConv(self.out_channels, 3, 1, name="out_conv", **dt)

    def _encode(self, x):
        x1 = nn.relu(self.enc_conv1(x))
        x1p = nn.max_pool(x1, (2, 2), strides=(2, 2), padding="SAME")
        x2 = nn.relu(self.enc_conv2(x1p))
        encoded = nn.max_pool(x2, (2, 2), strides=(2, 2), padding="SAME")
        return encoded, x1, x2

    def __call__(self, x):
        encoded, x1, x2 = self._encode(x)

        y = nn.relu(self.dec_conv1(encoded))
        y = _upsample2(y)
        y = jnp.concatenate([y, nn.relu(self.skip_conv2(x2))], axis=-1)

        y = nn.relu(self.dec_conv2(y))
        y = _upsample2(y)
        y = jnp.concatenate([y, nn.relu(self.skip_conv1(x1))], axis=-1)

        return nn.sigmoid(self.out_conv(y))

    def encode(self, x):
        """Bottleneck features (for analytic compression accounting)."""
        return self._encode(x)[0]
