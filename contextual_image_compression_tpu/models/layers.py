"""Shared layer building blocks with Keras-compatible defaults.

The reference's Keras layers use glorot_uniform kernel init, zero bias, and
BatchNormalization(momentum=0.99, epsilon=1e-3); flax defaults differ
(lecun_normal, eps 1e-5), so we pin them here to keep training dynamics comparable.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

glorot = nn.initializers.glorot_uniform()
zeros = nn.initializers.zeros


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=slope)


def space_to_depth2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channels (py, px, c)."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c)
    )


def conv4s2_s2d_kernel(k4):
    """(4, 4, Cin, Cout) k4/s2 SAME kernel -> (3, 3, 4Cin, Cout) k3/s1 SAME
    kernel over the space-to-depth(2) input; same function.

    Tap dy of the strided conv reads pixel row 2m+dy-1 for output row m; in
    s2d coordinates that is row (2m+dy-1)//2 phase (2m+dy-1)%2, so each dy
    maps to exactly one (s2d row offset, phase): 0->(m-1,1), 1->(m,0),
    2->(m,1), 3->(m+1,0) -- a k3 SAME window. The k3 read presents 4*Cin
    input lanes per tap instead of Cin (fuller MXU input dimension;
    experiment A, scripts/r3_perf_experiments.py)."""
    cin, co = k4.shape[2], k4.shape[3]
    w = jnp.zeros((3, 3, 4, cin, co), k4.dtype)
    pos = {0: (0, 1), 1: (1, 0), 2: (1, 1), 3: (2, 0)}  # dy -> (row, phase)
    for dy in range(4):
        ry, py = pos[dy]
        for dx in range(4):
            rx, px = pos[dx]
            w = w.at[ry, rx, py * 2 + px].set(k4[dy, dx])
    return w.reshape(3, 3, 4 * cin, co)


class KConv(nn.Module):
    """Conv2D with keras defaults (glorot_uniform / zeros, SAME padding).

    s2d=True lowers a 4x4/s2 conv as space-to-depth(2) + 3x3/s1 with the
    remapped kernel (conv4s2_s2d_kernel) -- exact same function and the same
    parameter tree (checkpoints interchangeable), differentiable (the layout
    pass is a reshape/transpose), so it is valid in training and inference."""

    features: int
    kernel: int = 4
    stride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        if self.s2d and self.kernel == 4 and self.stride == 2:
            k, b = _ConvParamHolder(
                self.features, x.shape[-1], 4, self.param_dtype, name="Conv_0"
            )()
            w3 = conv4s2_s2d_kernel(k.astype(self.dtype))
            y = jax.lax.conv_general_dilated(
                space_to_depth2(x.astype(self.dtype)), w3, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + b.astype(self.dtype)
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


class _PolyphaseConvT4x4s2(nn.Module):
    """ConvTranspose(kernel 4x4, stride 2, SAME) via polyphase decomposition.

    Numerically identical to nn.ConvTranspose (verified to fp32 noise) with the
    SAME parameter layout (kernel (4,4,Cin,Cout), bias), but lowered as ONE
    stride-1 K=2 convolution with 4*Cout output channels + a phase interleave --
    avoiding the input-dilated convolution XLA otherwise emits for transposed
    convs (3/4 of whose input taps are structural zeros on a TPU MXU).

    Derivation: with y = conv_transpose(x), y[2i+a, 2j+b] touches exactly the
    2x2 kernel taps rows {0,2} (a=0) / {1,3} (a=1) x cols likewise, applied to a
    1-padded x; phase (a,b) is the (H+1,W+1) VALID conv output shifted by (a,b).
    """

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        cout = self.features
        kernel = self.param("kernel", glorot, (4, 4, cin, cout), self.param_dtype)
        bias = self.param("bias", zeros, (cout,), self.param_dtype)
        kernel = kernel.astype(self.dtype)

        taps = {0: (0, 2), 1: (1, 3)}
        subs = []
        for a in (0, 1):
            for bb in (0, 1):
                ra, ca = taps[a], taps[bb]
                sub = kernel[jnp.asarray(ra)][:, jnp.asarray(ca)]  # (2,2,Cin,Cout)
                subs.append(sub)
        wbig = jnp.concatenate(subs, axis=-1)  # (2,2,Cin,4*Cout)

        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        yall = jax.lax.conv_general_dilated(
            xp, wbig, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H+1, W+1, 4*Cout)
        phases = []
        k = 0
        for a in (0, 1):
            for bb in (0, 1):
                phases.append(yall[:, a : h + a, bb : w + bb, k * cout : (k + 1) * cout])
                k += 1
        ph = jnp.stack(phases, axis=3).reshape(b, h, w, 2, 2, cout)
        y = ph.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)
        return y + bias.astype(self.dtype)


class KConvT(nn.Module):
    """Conv2DTranspose with keras defaults.

    polyphase=True uses the MXU-friendly polyphase lowering for the 4x4/s2 case
    (identical numerics AND parameter paths -- the inner module is named
    'ConvTranspose_0' so checkpoints are interchangeable)."""

    features: int
    kernel: int = 4
    stride: int = 2
    polyphase: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.polyphase and self.kernel == 4 and self.stride == 2:
            return _PolyphaseConvT4x4s2(
                self.features, dtype=self.dtype, param_dtype=self.param_dtype,
                name="ConvTranspose_0",
            )(x)
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


class _ConvTParamHolder(nn.Module):
    """Declares nn.ConvTranspose's parameter surface (kernel/bias) WITHOUT
    applying it, for lowerings that transform the weights (models/packed_tail.py).
    Must be nested under the wrapper name so checkpoint paths match the native
    module exactly (<wrapper>/ConvTranspose_0/{kernel,bias})."""

    features: int
    cin: int
    kernel: int = 4
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", glorot,
            (self.kernel, self.kernel, self.cin, self.features), self.param_dtype,
        )
        b = self.param("bias", zeros, (self.features,), self.param_dtype)
        return k, b


class ConvTSurface(nn.Module):
    features: int
    kernel: int = 4
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cin: int):
        return _ConvTParamHolder(
            self.features, cin, self.kernel, self.param_dtype, name="ConvTranspose_0"
        )()


class _ConvParamHolder(nn.Module):
    features: int
    cin: int
    kernel: int = 4
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", glorot,
            (self.kernel, self.kernel, self.cin, self.features), self.param_dtype,
        )
        b = self.param("bias", zeros, (self.features,), self.param_dtype)
        return k, b


class ConvSurface(nn.Module):
    """Parameter surface matching KConv's <name>/Conv_0/{kernel,bias}."""

    features: int
    kernel: int = 4
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cin: int):
        return _ConvParamHolder(
            self.features, cin, self.kernel, self.param_dtype, name="Conv_0"
        )()


class DenseSurface(nn.Module):
    """Parameter surface matching nn.Dense's {kernel,bias}; nest under the
    wrapper with name='Dense_0' so checkpoint paths are unchanged."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", glorot, (cin, self.features), self.param_dtype)
        b = self.param("bias", zeros, (self.features,), self.param_dtype)
        return k, b


class _BNParamHolder(nn.Module):
    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), self.param_dtype)
        bias = self.param("bias", zeros, (self.features,), self.param_dtype)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class BNSurface(nn.Module):
    """Parameter surface matching KBatchNorm's <name>/BatchNorm_0 params+stats."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return _BNParamHolder(self.features, self.param_dtype, name="BatchNorm_0")()


class KDense(nn.Module):
    """Dense with keras defaults; optional int8 serving paths.

    int8=True (W8A8) evaluates y = (q_x @ q_w) * sx * sw + b with per-row
    activation scales and per-column weight scales (symmetric,
    round-to-nearest). The int8 MACs accumulate in int32 on the MXU and the
    weight stream halves -- these layers (131072x1024-class projections) are
    weight-bandwidth-bound. Parameters stay fp32/bf16 in the checkpoint;
    quantization happens at trace time on the weight side and per-call on the
    activation side. Inference-only (callers gate on train). Measured SLOWER
    end to end (the activation max/round/cast passes win); kept as the record.

    w8=True (WEIGHT-ONLY int8) keeps activations in compute dtype and folds
    the per-column scale into the weight operand: y = x @ (q_w * s_w) + b.
    The kernel param is expected to be PRE-QUANTIZED to int8 by
    `quantize_dense_w8` (once, at load, outside the jit), with the fp32 scale
    row stored as the sibling param `w8_scale`; XLA then fuses the int8->bf16
    convert and the scale multiply into the dot's weight-operand load, so HBM
    streams half the bytes. An unconverted fp kernel falls back to trace-time
    quantization (same numerics, no bandwidth win -- the fp kernel is still
    streamed to compute q_w). Measured on v5e b128: the codec's 4-layer stack
    1.253 -> 0.675 ms (scripts/r3_w8_dense.py, w8_opr placement)."""

    features: int
    int8: bool = False
    w8: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.w8:
            kernel, bias = DenseSurface(
                self.features, self.param_dtype, name="Dense_0"
            )(x.shape[-1])
            cd = jnp.dtype(self.dtype)
            # The scale row is OPTIONAL in the tree: quantize_dense_w8 adds it
            # next to the kernels it converts; an unconverted tree (init
            # template, freshly-loaded checkpoint, sub-threshold layer) has
            # neither the int8 kernel nor the scale and quantizes at trace
            # time instead. Declaring it with self.param would change the init
            # surface and break checkpoint loading.
            if kernel.dtype == jnp.int8:
                if not self.has_variable("params", "w8_scale"):
                    # An int8 kernel with no scale row cannot be evaluated:
                    # re-quantizing it would derive scale~1 from max|q|/127 and
                    # silently drop the true per-column scale. Only
                    # quantize_dense_w8 produces int8 kernels, and it always
                    # stores the sibling w8_scale -- a missing one means a
                    # hand-edited or partially-restored tree. Fail fast.
                    raise ValueError(
                        f"KDense(w8=True) '{self.name}': kernel is int8 but the "
                        "sibling 'w8_scale' param is missing; the tree was not "
                        "produced by quantize_dense_w8 (or lost its scale row)."
                    )
                q_w = kernel
                scale = self.get_variable("params", "w8_scale")
            else:  # unconverted floating kernel: quantize at trace time
                w32 = kernel.astype(jnp.float32)
                scale = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0
                q_w = jnp.round(w32 / jnp.maximum(scale, 1e-12)).astype(jnp.int8)
            wd = q_w.astype(cd) * scale.astype(cd)
            y = jnp.dot(x.astype(cd), wd) + bias.astype(cd)
            return y.astype(cd)
        if not self.int8:
            kernel, bias = DenseSurface(
                self.features, self.param_dtype, name="Dense_0"
            )(x.shape[-1])
            if not jnp.issubdtype(kernel.dtype, jnp.floating):
                # quantize_dense_w8 converted this kernel but the module was
                # built without w8=True: evaluating it as-is would cast the raw
                # int8 symbols to compute dtype WITHOUT the scale -- silent
                # garbage. Fail fast (serve.py/bench.py gate conversion on the
                # flag; this guards every other caller).
                raise TypeError(
                    f"KDense '{self.name}': kernel dtype {kernel.dtype} is not "
                    "floating but the module was built with w8=False/int8=False "
                    "-- a w8-quantized tree is being applied by a non-w8 module."
                )
            cd = jnp.dtype(self.dtype)
            y = jax.lax.dot_general(
                x.astype(cd), kernel.astype(cd),
                (((x.ndim - 1,), (0,)), ((), ())),
            )
            return y + bias.astype(cd)
        kernel, bias = DenseSurface(
            self.features, self.param_dtype, name="Dense_0"
        )(x.shape[-1])
        w32 = kernel.astype(jnp.float32)
        sw = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0  # (1, N)
        q_w = jnp.round(w32 / jnp.maximum(sw, 1e-12)).astype(jnp.int8)
        x32 = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0  # (..., 1)
        q_x = jnp.round(x32 / jnp.maximum(sx, 1e-12)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q_x, q_w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * sx * sw + bias.astype(jnp.float32)
        return y.astype(self.dtype)


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


def quantize_dense_w8(variables, min_elems: int = 1 << 23):
    """Pre-quantize giant Dense kernels to weight-only int8 for serving.

    Walks the params tree for `Dense_0` scopes whose kernel has >= `min_elems`
    elements (the codec's four latent/fc projections at 131072x{512,1024} --
    the next-largest Dense in the zoo is ~4M elements, so the default
    threshold selects exactly those four), replaces each kernel with the
    symmetric per-output-column int8 quantization round(w / s), s =
    max|w|_col / 127, and stores s as the sibling `w8_scale` param that
    `KDense(w8=True)` declares. Quantization happens HERE, on the host, once
    -- never inside the jit (the whole point is that the compiled program
    streams int8, not fp).

    Call on the fp32 checkpoint BEFORE any bf16 cast so scales and symbols
    derive from full-precision weights, and only when the codec is built with
    `ModelConfig.dense_w8=True` (the non-w8 KDense branch would feed an int8
    kernel straight into nn.Dense). Returns a new tree; non-kernel leaves are
    shared, not copied.
    """
    import numpy as np

    def walk(d):
        if not isinstance(d, dict):
            return d
        out = {}
        for key, val in d.items():
            if (
                key == "Dense_0"
                and isinstance(val, dict)
                and "kernel" in val
                and getattr(val["kernel"], "size", 0) >= min_elems
                and jnp.issubdtype(jnp.asarray(val["kernel"]).dtype, jnp.floating)
            ):
                w32 = np.asarray(val["kernel"], dtype=np.float32)
                s = np.max(np.abs(w32), axis=0, keepdims=True) / 127.0
                q = np.round(w32 / np.maximum(s, 1e-12)).astype(np.int8)
                out[key] = {**val, "kernel": jnp.asarray(q)}
                out["w8_scale"] = jnp.asarray(s, dtype=jnp.float32)
            elif isinstance(val, dict):
                out[key] = walk(val)
            else:
                out[key] = val
        return out

    # The adaptive codec's variables are a dict of per-component Flax trees
    # ({"hq_encoder": {"params": ...}, ...}); a single module's are
    # {"params": ...}. Walking everything covers both -- only scopes literally
    # named Dense_0 are touched, which exist only under params collections.
    return walk(variables)
