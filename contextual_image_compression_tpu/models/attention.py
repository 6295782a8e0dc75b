"""SAGAN-style self-attention layer (reference: GAN_functions.py:333-374).

1x1 convs project to Q, K (C/8 channels) and V (C channels); the fused Pallas core
computes softmax(QK^T)V over the H*W positions (unscaled, like the reference); the
output is gamma * context + x with gamma learned from zero.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from contextual_image_compression_tpu.models.layers import KConv
from contextual_image_compression_tpu.ops.attention import attention_block


class SelfAttention(nn.Module):
    channels: int
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inner = self.channels // 8
        q = KConv(inner, kernel=1, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="query_conv")(x)
        k = KConv(inner, kernel=1, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="key_conv")(x)
        v = KConv(self.channels, kernel=1, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="value_conv")(x)

        q = q.reshape(b, h * w, inner)
        k = k.reshape(b, h * w, inner)
        v = v.reshape(b, h * w, self.channels)

        gamma = self.param("gamma", nn.initializers.zeros, (1,), self.param_dtype)
        # gamma*context + x fused into the kernel's output write (saves the
        # separate broadcast-multiply-add pass over the (B,HW,C) tensor)
        out = attention_block(
            q, k, v, x.reshape(b, h * w, c), gamma.astype(x.dtype)[0],
            use_pallas=self.use_pallas,
        )
        return out.reshape(b, h, w, self.channels)
