"""HQ/LQ convolutional encoder with skip outputs (reference: GAN_functions.py:280-331).

Structure for 256x256x3 input:
    conv 64  k4 s2 -> LeakyReLU(0.2)                      -> skip1 (128,128,64)
    conv 128 k4 s2 -> BN -> LeakyReLU                     -> skip2 (64,64,128)
    conv 256 k4 s2 -> BN -> LeakyReLU                     -> skip3 (32,32,256)
    [SelfAttention(256) on the post-skip3 features, HQ only]
    conv 512 k4 s2 -> BN -> LeakyReLU                     -> (16,16,512)
    flatten -> Dense(latent_dim)

Note: skip3 is captured BEFORE attention is applied, exactly as the reference appends
x3 to skip_outputs before reassigning it (GAN_functions.py:312-318).

The final Dense is the dominant parameter block (16*16*512 x latent); under the
device mesh its kernel is sharded over the 'model' axis (tensor parallelism) -- see
parallel/sharding.py.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from contextual_image_compression_tpu.models.attention import SelfAttention
from contextual_image_compression_tpu.models.layers import (
    KBatchNorm,
    KConv,
    KDense,
    leaky_relu,
)


class Encoder(nn.Module):
    latent_dim: int
    add_attention: bool = True
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    leaky_slope: float = 0.2
    attention_use_pallas: bool = True
    dense_int8: bool = False  # W8A8 latent projection at inference (see KDense)
    dense_w8: bool = False  # weight-only int8 latent projection (see KDense)
    s2d_convs: bool = False  # conv2/conv3 via space-to-depth k3/s1 (see KConv)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c1, c2, c3, c4 = self.channels
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        x1 = KConv(c1, 4, 2, name="conv1", **dt)(x)
        x1 = leaky_relu(x1, self.leaky_slope)
        skip1 = x1

        x2 = KConv(c2, 4, 2, name="conv2", s2d=self.s2d_convs, **dt)(x1)
        x2 = KBatchNorm(name="bn2", **dt)(x2, use_running_average=not train)
        x2 = leaky_relu(x2, self.leaky_slope)
        skip2 = x2

        x3 = KConv(c3, 4, 2, name="conv3", s2d=self.s2d_convs, **dt)(x2)
        x3 = KBatchNorm(name="bn3", **dt)(x3, use_running_average=not train)
        x3 = leaky_relu(x3, self.leaky_slope)
        skip3 = x3  # captured pre-attention (reference: GAN_functions.py:312)

        if self.add_attention:
            x3 = SelfAttention(
                c3, use_pallas=self.attention_use_pallas, name="attention", **dt
            )(x3)

        x4 = KConv(c4, 4, 2, name="conv4", **dt)(x3)
        x4 = KBatchNorm(name="bn4", **dt)(x4, use_running_average=not train)
        x4 = leaky_relu(x4, self.leaky_slope)

        flat = x4.reshape(x4.shape[0], -1)
        latent = KDense(
            self.latent_dim, int8=self.dense_int8 and not train,
            w8=self.dense_w8 and not train, name="latent_dense", **dt,
        )(flat)
        return latent, (skip1, skip2, skip3)
