"""Rate-distortion parameter network (reference: GAN_functions.py:495-557).

Inputs: image (unused by the graph, kept for interface parity), saliency map
(B,H,W,1), target bpp (B,1). The bpp is normalized by /5 and clipped to [0,1]
(reference :505-507). The saliency branch is two stride-2 convs + global average
pool; the concat with normalized bpp feeds Dense(128) -> Dense(3) base params, and
the three heads are sigmoids biased inversely to bpp (reference :529-541):

    overall_compression = sigmoid(base0 + 1 - 2*bpp_n)
    hq_lq_threshold     = sigmoid(base1 + 1 - 2*bpp_n)
    quant_strength      = sigmoid(base2 + 1 - 1.5*bpp_n)

In the adaptive codec the output feeds ONLY the RD loss -- the parameters actually
applied are deterministic functions of target bpp (reference: GAN_functions.py:623-649);
we reproduce that faithfully in models/adaptive.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from contextual_image_compression_tpu.models.layers import KConv, KDense, leaky_relu


class RDOptimizer(nn.Module):
    bpp_norm_divisor: float = 5.0
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, saliency, target_bpp):
        del image  # interface parity; unused by the reference graph too
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bpp_n = jnp.clip(target_bpp / self.bpp_norm_divisor, 0.0, 1.0)  # (B,1)

        x = leaky_relu(KConv(32, 3, 2, name="conv1", **dt)(saliency), self.leaky_slope)
        x = leaky_relu(KConv(64, 3, 2, name="conv2", **dt)(x), self.leaky_slope)
        x = jnp.mean(x, axis=(1, 2))  # GlobalAveragePooling2D

        x = jnp.concatenate([x, bpp_n.astype(x.dtype)], axis=-1)
        x = leaky_relu(KDense(128, name="dense", **dt)(x), self.leaky_slope)
        base = KDense(3, name="base_params", **dt)(x)

        overall = nn.sigmoid(base[:, 0:1] + 1.0 - 2.0 * bpp_n)
        threshold = nn.sigmoid(base[:, 1:2] + 1.0 - 2.0 * bpp_n)
        quant = nn.sigmoid(base[:, 2:3] + 1.0 - 1.5 * bpp_n)
        return jnp.concatenate([overall, threshold, quant], axis=-1)
