"""Input-size-adaptive discriminator (reference: GAN_functions.py:448-493).

For H = input size: num_downsampling = max(1, log2(H/4)) capped at 4 stages; filters
start at 16 and double per stage up to 128; a non-power-of-2 input is first resized
to the nearest lower power of two (reference: GAN_functions.py:463-467). Each stage:
conv k4 s2 -> LeakyReLU(0.2) -> BatchNorm (stages > 0 only; note the reference's
activation-then-BN order). Head: flatten -> Dense(128) -> LReLU -> Dense(1, sigmoid).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from contextual_image_compression_tpu.models.layers import (
    KBatchNorm,
    KConv,
    KDense,
    leaky_relu,
)


class Discriminator(nn.Module):
    base_filters: int = 16
    max_filters: int = 128
    max_stages: int = 4
    dense_units: int = 128
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = x.shape[1]
        if h & (h - 1) != 0:  # not a power of two -> resize down (reference :465-467)
            p2 = 2 ** int(math.log2(h))
            x = jax.image.resize(
                x, (x.shape[0], p2, p2, x.shape[3]), method="bilinear"
            )
            h = p2

        num_stages = min(max(1, int(math.log2(h / 4))), self.max_stages)
        filters = self.base_filters
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        for i in range(num_stages):
            x = KConv(filters, 4, 2, name=f"conv{i}", **dt)(x)
            x = leaky_relu(x, self.leaky_slope)
            if i > 0:
                x = KBatchNorm(name=f"bn{i}", **dt)(x, use_running_average=not train)
            filters = min(filters * 2, self.max_filters)

        x = x.reshape(x.shape[0], -1)
        x = leaky_relu(KDense(self.dense_units, name="dense", **dt)(x), self.leaky_slope)
        logit = KDense(1, name="out", **dt)(x)
        return nn.sigmoid(logit)
