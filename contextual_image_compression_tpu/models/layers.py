"""Shared layer building blocks with Keras-compatible defaults.

The reference's Keras layers use glorot_uniform kernel init, zero bias, and
BatchNormalization(momentum=0.99, epsilon=1e-3); flax defaults differ
(lecun_normal, eps 1e-5), so we pin them here to keep training dynamics comparable.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

glorot = nn.initializers.glorot_uniform()
zeros = nn.initializers.zeros


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=slope)


class KConv(nn.Module):
    """Conv2D with keras defaults (glorot_uniform / zeros, SAME padding)."""

    features: int
    kernel: int = 4
    stride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            kernel_init=glorot,
            bias_init=zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class KConvT(nn.Module):
    """Conv2DTranspose with keras defaults."""

    features: int
    kernel: int = 4
    stride: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            kernel_init=glorot,
            bias_init=zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class KDense(nn.Module):
    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            kernel_init=glorot,
            bias_init=zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class KBatchNorm(nn.Module):
    """BatchNorm with keras defaults (momentum 0.99, eps 1e-3).

    Under a global-batch `jit` over a sharded batch axis, the batch statistics are
    computed over the full global batch -- identical semantics to the reference's
    single-device BN, with XLA inserting the cross-chip reductions (this is the
    sync-BN decision from SURVEY.md section 7 'hard parts', solved by SPMD).
    """

    use_running_average: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
