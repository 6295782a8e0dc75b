"""Batched JPEG-style 8x8 DCT baseline codec, fused as a Pallas TPU kernel.

The reference's only classical-codec exposure is cv2.imwrite's libjpeg call
(test_autoencoder.py:93) used for its file-size-reduction metric; BASELINE.json's
codec-shootout config calls for a batched DCT/JPEG-style baseline on TPU. This
module provides it:

  * RGB <-> YCbCr (BT.601 full-range, the JPEG convention)
  * 8x8 forward DCT -> quality-scaled quantization (libjpeg's quality->table
    scaling) -> round -> dequantize -> inverse DCT, ALL IN ONE PALLAS KERNEL --
    one HBM read of the image strip and one write of (reconstruction, symbols),
    the bandwidth speed-of-light for this op
  * analytic bpp via the empirical entropy of the quantized symbols (the
    reference's accounting is likewise analytic -- GAN_test.py:314-325)
  * an optional REAL bitstream (zlib of the zigzag int16 symbols, host-side),
    which the reference never had

TPU-first formulation: a 2-D tile DCT is D @ X @ D^T. Per (image-row-strip) kernel
invocation we process an (8, W) strip: the row transform is one 8xW matmul, and the
per-tile column transform is a single (8,W) @ (W,W) matmul against a precomputed
BLOCK-DIAGONAL matrix of D^T tiles -- both land on the MXU with no 8-wide
reshuffles. Quant/round/dequant run on the VPU between the two matmul pairs.
"""

from __future__ import annotations

import functools
import zlib
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contextual_image_compression_tpu.config import DCTCodecConfig

# --------------------------------------------------------------------- tables

# Standard JPEG Annex K quantization tables.
_LUMA_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.float32,
)
_CHROMA_TABLE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    np.float32,
)


def quality_scaled_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality -> table scaling."""
    quality = int(np.clip(quality, 1, 100))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    return np.clip(np.floor((base * scale + 50.0) / 100.0), 1.0, 255.0).astype(
        np.float32
    )


@functools.lru_cache(maxsize=8)
def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix."""
    n = 8
    d = np.zeros((n, n), np.float64)
    for k in range(n):
        for i in range(n):
            d[k, i] = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    d *= np.sqrt(2.0 / n)
    d[0] *= 1.0 / np.sqrt(2.0)
    return d.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _block_diag_dt(width: int) -> np.ndarray:
    """Block-diagonal matrix of D^T tiles: (W, W), for the per-tile column DCT as
    one wide matmul."""
    d = _dct_matrix()
    nb = width // 8
    bd = np.zeros((width, width), np.float32)
    for b in range(nb):
        bd[b * 8 : (b + 1) * 8, b * 8 : (b + 1) * 8] = d.T
    return bd


# ------------------------------------------------------------------ colorspace


def rgb_to_ycbcr(rgb255: jnp.ndarray) -> jnp.ndarray:
    """JPEG full-range BT.601. rgb255: (..., 3) in [0, 255]."""
    r, g, b = rgb255[..., 0], rgb255[..., 1], rgb255[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: jnp.ndarray) -> jnp.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------- pallas core


def _dct_strip_kernel(x_ref, d_ref, bd_ref, q_ref, out_ref, sym_ref):
    """One (8, W) strip: forward 2D DCT -> quantize -> round -> dequantize ->
    inverse 2D DCT, entirely in VMEM."""
    x = x_ref[0]          # (8, W), level-shifted
    d = d_ref[:]          # (8, 8)
    bd = bd_ref[:]        # (W, W) block-diag of D^T
    q = q_ref[0]          # (8, W) tiled quant table

    rowt = jnp.dot(d, x, preferred_element_type=jnp.float32)       # D @ X
    coef = jnp.dot(rowt, bd, preferred_element_type=jnp.float32)   # (D X) BD

    sym = jnp.round(coef / q)
    deq = sym * q

    colt = jnp.dot(deq, bd.T, preferred_element_type=jnp.float32)  # undo col DCT
    rec = jnp.dot(d.T, colt, preferred_element_type=jnp.float32)

    out_ref[0] = rec
    sym_ref[0] = sym


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _dct_strips_pallas(strips: jnp.ndarray, qtable_strip: jnp.ndarray):
    """strips: (N, 8, W) level-shifted channel data; qtable_strip: (N, 8, W)."""
    n, eight, w = strips.shape
    d = jnp.asarray(_dct_matrix())
    bd = jnp.asarray(_block_diag_dt(w))
    return pl.pallas_call(
        _dct_strip_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 8, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 8, w), jnp.float32),
            jax.ShapeDtypeStruct((n, 8, w), jnp.float32),
        ),
        interpret=not _on_tpu(),
    )(strips, d, bd, qtable_strip)


def _dct_strips_jnp(strips: jnp.ndarray, qtable_strip: jnp.ndarray):
    """Reference jnp path (same math, XLA-fused)."""
    d = jnp.asarray(_dct_matrix())
    bd = jnp.asarray(_block_diag_dt(strips.shape[-1]))
    rowt = jnp.einsum("ij,njw->niw", d, strips)
    coef = jnp.einsum("niw,wv->niv", rowt, bd)
    sym = jnp.round(coef / qtable_strip)
    deq = sym * qtable_strip
    colt = jnp.einsum("niv,wv->niw", deq, bd)  # deq @ bd.T per strip
    rec = jnp.einsum("ij,niw->njw", d, colt)   # d^T @ colt (contract d's first index)
    return rec, sym


# ------------------------------------------------------------------- codec


def _to_strips(planes: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B*C*H/8, 8, W)."""
    b, c, h, w = planes.shape
    return planes.reshape(b * c * (h // 8), 8, w)


def _entropy_bits_per_symbol(sym: jnp.ndarray, max_abs: int = 1024) -> jnp.ndarray:
    """Empirical entropy (bits/symbol) of quantized coefficients per image.
    sym: (B, N) -> (B,). Sort-based histogram (memory-light, jit-friendly)."""
    clipped = jnp.clip(sym, -max_abs, max_abs) + max_abs  # [0, 2*max_abs]
    sorted_ = jnp.sort(clipped, axis=-1)
    queries = jnp.arange(2 * max_abs + 1, dtype=sorted_.dtype)

    def per_image(s):
        right = jnp.searchsorted(s, queries, side="right")
        left = jnp.searchsorted(s, queries, side="left")
        return (right - left).astype(jnp.float32)

    hist = jax.vmap(per_image)(sorted_)
    p = hist / sym.shape[-1]
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-12)), 0.0), axis=-1)


class DCTCodec:
    """Batched JPEG-style codec: encode+decode in one fused device pass."""

    def __init__(self, cfg: DCTCodecConfig = DCTCodecConfig()):
        self.cfg = cfg
        self._tables = self._tables_for(cfg.quality)

    @staticmethod
    def _tables_for(quality: int) -> np.ndarray:
        luma = quality_scaled_table(_LUMA_TABLE, quality)
        chroma = quality_scaled_table(_CHROMA_TABLE, quality)
        return np.stack([luma, chroma, chroma])  # Y, Cb, Cr

    def _qtable_strips(
        self, b: int, c: int, h: int, w: int, quality: Optional[int] = None
    ) -> jnp.ndarray:
        """Tile the per-channel 8x8 tables into (B*C*H/8, 8, W) strips.
        `quality` overrides the configured quality (used when decoding a stream
        whose header records a different setting)."""
        tables = (
            self._tables
            if quality is None or quality == self.cfg.quality
            else self._tables_for(quality)
        )
        tiled = np.tile(tables[:, None, :, :], (1, h // 8, 1, w // 8))  # (C,H/8,8,W)
        tiled = tiled.reshape(c, h // 8, 8, w)
        strips = np.broadcast_to(tiled[None], (b, c, h // 8, 8, w))
        return jnp.asarray(strips.reshape(b * c * (h // 8), 8, w))

    def roundtrip(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: (B, H, W, 3) in [-1, 1] -> (reconstruction in [-1,1],
        quantized symbols (B, C*H*W)). Jittable."""
        b, h, w, _ = images.shape
        rgb255 = (images + 1.0) * 127.5
        ycc = rgb_to_ycbcr(rgb255) - 128.0
        planes = jnp.moveaxis(ycc, -1, 1)  # (B, 3, H, W)
        strips = _to_strips(planes)
        qstrips = self._qtable_strips(b, 3, h, w)
        if self.cfg.use_pallas:
            rec_strips, sym = _dct_strips_pallas(strips, qstrips)
        else:
            rec_strips, sym = _dct_strips_jnp(strips, qstrips)
        rec_planes = rec_strips.reshape(b, 3, h, w)
        rec_ycc = jnp.moveaxis(rec_planes, 1, -1) + 128.0
        rec_rgb = ycbcr_to_rgb(rec_ycc)
        rec = jnp.clip(rec_rgb / 127.5 - 1.0, -1.0, 1.0)
        return rec, sym.reshape(b, -1)

    def evaluate(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Reconstruction + analytic bpp (entropy of the symbol stream)."""
        rec, sym = self.roundtrip(images)
        bits_per_sym = _entropy_bits_per_symbol(sym)
        h, w = images.shape[1:3]
        bpp = bits_per_sym * sym.shape[-1] / (h * w)
        return {"reconstruction": rec, "symbols": sym, "bpp": bpp}

    # ----------------------------------------------------------- real stream
    # version, coder (0=zlib, 1=native range coder), quality, height, width.
    # The coder byte makes streams self-contained: decode dispatches on the
    # header, not on which coders happen to be available where it is read.
    _STREAM_HEADER = "<BBBHH"
    _STREAM_VERSION = 2

    def encode_stream(self, image: jnp.ndarray) -> bytes:
        """Encode ONE (H, W, 3) [-1,1] image to a self-contained decodable
        bitstream: header + range-coded symbols. (A capability the reference
        lacks entirely -- it never serializes.)"""
        import struct

        rec, sym = self.roundtrip(image[None])
        del rec
        h, w = image.shape[0], image.shape[1]
        coder, payload = self._serialize_tagged(np.asarray(sym[0]))
        return struct.pack(
            self._STREAM_HEADER, self._STREAM_VERSION, coder, self.cfg.quality, h, w
        ) + payload

    def decode_stream(self, data: bytes) -> jnp.ndarray:
        """Inverse of encode_stream: bitstream -> (H, W, 3) image in [-1,1]."""
        import struct
        import zlib as _zlib

        from contextual_image_compression_tpu import native

        hdr = struct.calcsize(self._STREAM_HEADER)
        version, coder, quality, h, w = struct.unpack_from(self._STREAM_HEADER, data, 0)
        if version != self._STREAM_VERSION:
            raise ValueError(f"unknown DCT stream version {version}")
        n = 3 * h * w
        payload = data[hdr:]
        if coder == 1:
            if not native.available():
                raise RuntimeError(
                    "stream was encoded with the native range coder, which is "
                    "unavailable here"
                )
            sym = native.entropy_decode(payload, n)
        elif coder == 0:
            sym = np.frombuffer(_zlib.decompress(payload), np.int16)[:n]
        else:
            raise ValueError(f"unknown entropy coder id {coder}")
        sym = jnp.asarray(sym.astype(np.float32)).reshape(3 * (h // 8), 8, w)
        qstrips = self._qtable_strips(1, 3, h, w, quality=quality)
        deq_strips = sym * qstrips
        # inverse transform only
        d = jnp.asarray(_dct_matrix())
        bd = jnp.asarray(_block_diag_dt(w))
        colt = jnp.einsum("niv,wv->niw", deq_strips, bd)
        rec_strips = jnp.einsum("ij,niw->njw", d, colt)
        rec_planes = rec_strips.reshape(1, 3, h, w)
        rec_ycc = jnp.moveaxis(rec_planes, 1, -1) + 128.0
        rec = jnp.clip(ycbcr_to_rgb(rec_ycc) / 127.5 - 1.0, -1.0, 1.0)
        return rec[0]

    @staticmethod
    def _serialize_tagged(symbols: np.ndarray) -> Tuple[int, bytes]:
        """(coder_id, payload): the native C++ adaptive range coder when available
        (within ~1% of the order-0 entropy bound), zlib otherwise. The reference
        never serializes at all; this provides an honest measured-size option."""
        from contextual_image_compression_tpu import native

        s = np.clip(np.asarray(symbols), -32768, 32767).astype(np.int16)
        if native.available():
            return 1, native.entropy_encode(s.ravel())
        return 0, zlib.compress(s.tobytes(), level=6)

    @staticmethod
    def serialize(symbols: np.ndarray) -> bytes:
        return DCTCodec._serialize_tagged(symbols)[1]

    @staticmethod
    def measured_bpp(symbols: np.ndarray, hw: Tuple[int, int]) -> float:
        return 8.0 * len(DCTCodec.serialize(symbols)) / float(hw[0] * hw[1])
