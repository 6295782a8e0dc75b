"""Real bitstreams for the learned codecs.

The reference never serializes a compressed representation -- its bpp numbers are
analytic functions of latent dimensionality (GAN_test.py:314-325). This module
closes that gap: quantized latents (and DCT symbols) become actual byte streams via
the native C++ adaptive range coder (contextual_image_compression_tpu/native), with
zlib fallback, and 'measured bpp' becomes a real quantity alongside the reference's
analytic one.

Latent stream layout per image (little-endian):
  [uint8 version=2][uint8 coder][float32 scale][uint32 n_symbols][uint32 payload_len][payload]
where symbols = round(latent * scale) as int16 and scale = exp(3*q*(1-s)) is the
quantizer grid scale for this image (GAN_functions.py:436-446 semantics). The coder
byte records which entropy coder produced the payload (0 = zlib, 1 = native range
coder) so a stream is decodable regardless of which coders are available where it
is read -- decode dispatches on the header, never on local availability.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np

from contextual_image_compression_tpu import native

_HEADER = struct.Struct("<BBfII")
_VERSION = 2
CODER_ZLIB = 0
CODER_RANGE = 1


def _encode_payload(symbols: np.ndarray) -> Tuple[int, bytes]:
    """Returns (coder_id, payload)."""
    if native.available():
        return CODER_RANGE, native.entropy_encode(symbols)
    return CODER_ZLIB, zlib.compress(
        np.ascontiguousarray(symbols, np.int16).tobytes(), 6
    )


def _decode_payload(payload: bytes, n: int, coder: int) -> np.ndarray:
    if coder == CODER_RANGE:
        if not native.available():
            raise RuntimeError(
                "stream was encoded with the native range coder, which is "
                "unavailable here (no C++ toolchain?)"
            )
        return native.entropy_decode(payload, n)
    if coder == CODER_ZLIB:
        return np.frombuffer(zlib.decompress(payload), np.int16)[:n].copy()
    raise ValueError(f"unknown entropy coder id {coder}")


def pack_latent(latent: np.ndarray, scale: float) -> bytes:
    """Serialize one latent vector at quantizer grid `scale` to a bitstream.
    `latent` may be the pre- or post-quantization latent; symbols are
    round(latent*scale) either way (idempotent on the quantized latent)."""
    symbols = np.clip(np.round(latent * scale), -32768, 32767).astype(np.int16)
    coder, payload = _encode_payload(symbols)
    return (
        _HEADER.pack(_VERSION, coder, float(scale), symbols.size, len(payload))
        + payload
    )


def unpack_latent(stream: bytes) -> Tuple[np.ndarray, float]:
    """Returns (dequantized latent float32, scale)."""
    version, coder, scale, n, plen = _HEADER.unpack_from(stream, 0)
    if version != _VERSION:
        raise ValueError(f"unknown bitstream version {version}")
    symbols = _decode_payload(stream[_HEADER.size : _HEADER.size + plen], n, coder)
    return symbols.astype(np.float32) / scale, scale


def quantizer_scale(saliency_score: float, quant_strength: float,
                    scale_coeff: float = 3.0) -> float:
    """scale = exp(coeff * quant_strength * (1 - saliency_score))
    (GAN_functions.py:436-441)."""
    return float(np.exp(scale_coeff * quant_strength * (1.0 - saliency_score)))


def pack_symbols(symbols: np.ndarray, scale: float) -> bytes:
    """Serialize PRE-COMPUTED integer symbols (float array of integers) at grid
    `scale`. Use when the forward pass already emitted exact symbols (e.g. the
    serving pipeline computes round(latent*scale) in fp32 on device); avoids
    re-deriving them from dequantized -- possibly bf16-rounded -- latents."""
    sym = np.clip(np.asarray(symbols), -32768, 32767).astype(np.int16)
    coder, payload = _encode_payload(sym)
    return (
        _HEADER.pack(_VERSION, coder, float(scale), sym.size, len(payload)) + payload
    )


def pack_codec_symbols(
    hq_symbols: np.ndarray,    # (B, 2D) integer-valued
    lq_symbols: np.ndarray,    # (B, D) integer-valued
    hq_scales: np.ndarray,     # (B,)
    lq_scales: np.ndarray,     # (B,)
) -> List[Tuple[bytes, bytes]]:
    """Per-image (hq_stream, lq_stream) pairs from device-emitted symbols."""
    return [
        (
            pack_symbols(hq_symbols[i], float(hq_scales[i])),
            pack_symbols(lq_symbols[i], float(lq_scales[i])),
        )
        for i in range(hq_symbols.shape[0])
    ]


def pack_codec_latents(
    hq_latent_q: np.ndarray,   # (B, 2D) quantized
    lq_latent_q: np.ndarray,   # (B, D) quantized
    hq_scales: np.ndarray,     # (B,)
    lq_scales: np.ndarray,     # (B,)
) -> List[Tuple[bytes, bytes]]:
    """Per-image (hq_stream, lq_stream) pairs for a batch."""
    out = []
    for i in range(hq_latent_q.shape[0]):
        out.append(
            (
                pack_latent(hq_latent_q[i], float(hq_scales[i])),
                pack_latent(lq_latent_q[i], float(lq_scales[i])),
            )
        )
    return out


def measured_bpp(streams: List[Tuple[bytes, bytes]], img_hw: Tuple[int, int]) -> np.ndarray:
    """REAL bits-per-pixel of the serialized latents (vs the reference's analytic
    accounting)."""
    hw = float(img_hw[0] * img_hw[1])
    return np.array([8.0 * (len(h) + len(l)) / hw for h, l in streams], np.float32)


# ---------------------------------------------------------------------------
# Self-contained container: everything a decoder needs (no encoder in the loop)
# ---------------------------------------------------------------------------
#
# Layout (little-endian):
#   [magic 'CICZ'][uint8 version=1][uint16 H][uint16 W][float32 target_bpp]
#   [uint16 mh][uint16 mw][uint8 mask_coder][uint32 mask_len][mask payload]
#   [uint32 hq_len][hq latent stream][uint32 lq_len][lq latent stream]
#
# The mask block stores the smooth saliency mask downsampled (default 8x) and
# quantized to uint8, entropy-coded; it drives the per-pixel HQ/LQ blend at
# decode (GAN_functions.py:651-657 semantics). The latent streams are
# pack_latent/pack_symbols streams (scale in their own headers). Decoding needs
# only generator weights -- see models/adaptive.AdaptiveCodec.decode_latents and
# serve.CompressionPipeline.decode_from_bitstream. The reference has no decodable
# format at all (bpp is analytic, GAN_test.py:314-325).

_CONTAINER_MAGIC = b"CICZ"
_CONTAINER_VERSION = 1
_CONTAINER_HEAD = struct.Struct("<4sBHHf")
_MASK_HEAD = struct.Struct("<HHBI")


def _mask_to_u8(mask: np.ndarray, downsample: int) -> np.ndarray:
    """(H, W) float [0,1] -> (H/ds, W/ds) uint8 via box-average (the mask is
    already Gaussian-smoothed, so box decimation loses little)."""
    h, w = mask.shape
    ds = max(1, int(downsample))
    hh, ww = h // ds, w // ds
    m = mask[: hh * ds, : ww * ds].reshape(hh, ds, ww, ds).mean(axis=(1, 3))
    return np.clip(np.round(m * 255.0), 0, 255).astype(np.uint8)


def pack_container(
    hq_stream: bytes,
    lq_stream: bytes,
    mask: np.ndarray,          # (H, W) float in [0, 1]
    target_bpp: float,
    img_hw: Tuple[int, int],
    mask_downsample: int = 8,
) -> bytes:
    mu8 = _mask_to_u8(np.asarray(mask, np.float32), mask_downsample)
    coder, payload = _encode_payload(mu8.astype(np.int16).ravel())
    return b"".join(
        (
            _CONTAINER_HEAD.pack(
                _CONTAINER_MAGIC, _CONTAINER_VERSION,
                img_hw[0], img_hw[1], float(target_bpp),
            ),
            _MASK_HEAD.pack(mu8.shape[0], mu8.shape[1], coder, len(payload)),
            payload,
            struct.pack("<I", len(hq_stream)), hq_stream,
            struct.pack("<I", len(lq_stream)), lq_stream,
        )
    )


def unpack_container(data: bytes):
    """Returns dict with keys: hq_latent (dequantized fp32), lq_latent,
    hq_scale, lq_scale, mask_small (float [0,1], (mh,mw)), target_bpp,
    img_hw."""
    magic, version, h, w, target_bpp = _CONTAINER_HEAD.unpack_from(data, 0)
    if magic != _CONTAINER_MAGIC:
        raise ValueError("not a CICZ container stream")
    if version != _CONTAINER_VERSION:
        raise ValueError(f"unknown container version {version}")
    off = _CONTAINER_HEAD.size
    mh, mw, mcoder, mlen = _MASK_HEAD.unpack_from(data, off)
    off += _MASK_HEAD.size
    mask_small = (
        _decode_payload(data[off : off + mlen], mh * mw, mcoder)
        .astype(np.float32)
        .reshape(mh, mw)
        / 255.0
    )
    off += mlen
    (hq_len,) = struct.unpack_from("<I", data, off)
    off += 4
    hq_latent, hq_scale = unpack_latent(data[off : off + hq_len])
    off += hq_len
    (lq_len,) = struct.unpack_from("<I", data, off)
    off += 4
    lq_latent, lq_scale = unpack_latent(data[off : off + lq_len])
    return {
        "hq_latent": hq_latent,
        "lq_latent": lq_latent,
        "hq_scale": hq_scale,
        "lq_scale": lq_scale,
        "mask_small": mask_small,
        "target_bpp": float(target_bpp),
        "img_hw": (int(h), int(w)),
    }
