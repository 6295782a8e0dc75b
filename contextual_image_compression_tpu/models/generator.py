"""Skip-connection transposed-conv generator (reference: GAN_functions.py:236-278).

Structure (latent + skips from the paired Encoder -> 256x256x3 in [-1,1]):
    Dense(16*16*512) -> reshape -> BN -> LeakyReLU(0.2)
    ConvT 256 k4 s2 -> BN -> LReLU -> concat skip3   (32x32)
    ConvT 128 k4 s2 -> BN -> LReLU -> concat skip2   (64x64)
    ConvT 64  k4 s2 -> BN -> LReLU -> concat skip1   (128x128)
    ConvT 32  k4 s2 -> BN -> LReLU                   (256x256)
    Conv C k4 s1 -> tanh
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from contextual_image_compression_tpu.models.layers import (
    BNSurface,
    ConvSurface,
    ConvTSurface,
    KBatchNorm,
    KConv,
    KConvT,
    KDense,
    leaky_relu,
)
from contextual_image_compression_tpu.models.packed_tail import packed_tail_forward


class Generator(nn.Module):
    out_channels: int = 3
    channels: Tuple[int, ...] = (256, 128, 64, 32)
    base_hw: int = 16
    base_ch: int = 512
    leaky_slope: float = 0.2
    polyphase: bool = False  # alt ConvTranspose lowering (same numerics; see config)
    # MXU-packed lowering of deconv4+BN+LeakyReLU+out_conv+tanh (identical
    # numerics and checkpoint layout; inference-only -- see models/packed_tail.py).
    packed_tail: bool = False
    # int8 storage for the packed tail's planar intermediate (serving lowering,
    # bounded-error: see packed_tail_forward int8_planar + ModelConfig).
    packed_tail_int8: bool = False
    dense_int8: bool = False  # W8A8 fc projection at inference (see KDense)
    dense_w8: bool = False  # weight-only int8 fc projection (see KDense)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent, skips, train: bool = True):
        skip1, skip2, skip3 = skips
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        use_packed = self.packed_tail and not train

        x = KDense(
            self.base_hw * self.base_hw * self.base_ch,
            int8=self.dense_int8 and not train,
            w8=self.dense_w8 and not train, name="fc", **dt,
        )(latent)
        x = x.reshape(x.shape[0], self.base_hw, self.base_hw, self.base_ch)
        x = KBatchNorm(name="bn0", **dt)(x, use_running_average=not train)
        x = leaky_relu(x, self.leaky_slope)

        concat_skips = (skip3, skip2, skip1, None)
        n_native = 3 if use_packed else len(self.channels)
        for i, (ch, skip) in enumerate(zip(self.channels[:n_native], concat_skips)):
            x = KConvT(ch, 4, 2, polyphase=self.polyphase, name=f"deconv{i + 1}", **dt)(x)
            x = KBatchNorm(name=f"bn{i + 1}", **dt)(x, use_running_average=not train)
            x = leaky_relu(x, self.leaky_slope)
            if skip is not None:
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)

        if use_packed:
            ch4 = self.channels[3]
            k4, b4 = ConvTSurface(ch4, 4, self.param_dtype, name="deconv4")(x.shape[-1])
            bn_scale, bn_bias, bn_mean, bn_var = BNSurface(
                ch4, self.param_dtype, name="bn4"
            )()
            ko, bo = ConvSurface(self.out_channels, 4, self.param_dtype, name="out_conv")(ch4)
            return packed_tail_forward(
                x,
                k4.astype(self.dtype), b4.astype(self.dtype),
                bn_scale, bn_bias, bn_mean, bn_var,
                ko, bo.astype(self.dtype),
                bn_eps=1e-3, leaky_slope=self.leaky_slope,
                int8_planar=self.packed_tail_int8,
            )

        x = KConv(self.out_channels, 4, 1, name="out_conv", **dt)(x)
        return jnp.tanh(x)
