"""SAGAN-style self-attention layer (reference: GAN_functions.py:333-374).

1x1 convs project to Q, K (C/8 channels) and V (C channels); the fused Pallas core
computes softmax(QK^T)V over the H*W positions (unscaled, like the reference); the
output is gamma * context + x with gamma learned from zero.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from contextual_image_compression_tpu.models.layers import ConvSurface
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
        # The 1x1 Q/K/V projections evaluate as matmuls over the (B, HW, C)
        # view: identical math to 1x1 convs (parameters keep the conv layout
        # and paths, so checkpoints are unchanged), but XLA then keeps ONE
        # layout for the projections, the fused kernel, and the residual,
        # instead of relayout-copying each conv output to feed the custom call.
        #
        # Round-3 negative result (measured on v5e, codec b128): folding the
        # projections INTO the kernel (ops/attention.py::sagan_block /
        # sagan_block_spatial) wins 0.29 ms/batch in isolation (0.753 vs
        # 1.039 ms) but is a wash (batch-major view) or -13% (the (HW, B, C)
        # view: both boundary transposes materialize as 64 MB relayout
        # copies) inside the codec, where XLA already absorbs the projection
        # relayouts into neighboring fusions. Composed stays the default.
        kq, bq = ConvSurface(inner, 1, self.param_dtype, name="query_conv")(c)
        kk, bk = ConvSurface(inner, 1, self.param_dtype, name="key_conv")(c)
        kv, bv = ConvSurface(self.channels, 1, self.param_dtype, name="value_conv")(c)

        xf = x.reshape(b, h * w, c)
        dt = self.dtype

        def proj(kern, bias, n):
            return (
                jnp.einsum("bnc,cf->bnf", xf, kern.reshape(c, n).astype(dt))
                + bias.astype(dt)
            )

        q = proj(kq, bq, inner)
        k = proj(kk, bk, inner)
        v = proj(kv, bv, self.channels)

        gamma = self.param("gamma", nn.initializers.zeros, (1,), self.param_dtype)
        # gamma*context + x fused into the kernel's output write (saves the
        # separate broadcast-multiply-add pass over the (B,HW,C) tensor)
        out = attention_block(
            q, k, v, xf, gamma.astype(dt)[0], use_pallas=self.use_pallas,
        )
        return out.reshape(b, h, w, self.channels)
