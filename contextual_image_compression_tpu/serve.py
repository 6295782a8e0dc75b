"""Production serving pipeline: uint8 images in -> decoded uint8 images out.

Packages the full flagship path -- batched on-device saliency -> contextual
mask -> adaptive GAN codec encode+decode -> uint8 re-encode -- as one jitted
callable in the production wire format (uint8 RGB both ways; the mask engine
consumes u8 exactly, see ops/masks.compute_contextual_mask). This is the
pipeline `bench.py` measures -- the committed, variance-qualified numbers
live in BENCH_DETAILS.json (one source of truth; README mirrors it). The
reference has no serving tier at all (its eval loop is per-image host
OpenCV + predict, GAN_test.py:265-340).

Also exposes real-bitstream serialization of the quantized latents (measured
bpp; ops/bitstream.py). Note the architectural caveat inherited from the
reference: the generators consume encoder SKIP tensors that bypass the latent
bottleneck (GAN_functions.py:256-266), so with the reference topology the
latent bitstream alone cannot reconstruct the image -- the codec is served as
an encode+decode pipeline, and bitstreams quantify the latent rate exactly as
the reference's analytic accounting does (GAN_test.py:314-325), but measured.
The skip-free variant (ModelConfig.skip_mode='zero') removes the caveat:
encode_to_bitstream/decode_from_bitstream then form a true storable codec
(bytes -> image with no encoder in the loop; scripts/eval_bitstream.py
measures its quality).

Multi-chip serving: pass `mesh=parallel.create_mesh(...)` -- parameters are
replicated, request batches shard over the mesh devices, and the same jitted
callable runs SPMD (the codec is embarrassingly data-parallel).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from contextual_image_compression_tpu.config import ModelConfig, SaliencyConfig
from contextual_image_compression_tpu.checkpoint import CheckpointStore
from contextual_image_compression_tpu.models.adaptive import AdaptiveCodec
from contextual_image_compression_tpu.ops import bitstream as bs
from contextual_image_compression_tpu.ops import masks as mask_ops
from contextual_image_compression_tpu.utils.tree import cast_floats


def _serving_model_config(cfg: ModelConfig) -> ModelConfig:
    """bf16 inference with the MXU-packed generator tail, int8 storage for the
    tail's phase-planar intermediate, and weight-only int8 for the four giant
    latent/fc projections (the measured-fastest serving configuration on v5e
    b128; decoded uint8 parity vs the exact bf16 path quantified per lowering
    in the PERF_NOTES.md ledgers -- dense_w8 is u8-bit-identical, and
    packed_tail_int8 was gated on a trained checkpoint on chip in round 5:
    -0.03 dB vs source, int8-vs-bf16 decode PSNR 40.3 dB, +5.5% e2e
    (runs/r5_int8_tail_parity.json, PERF_NOTES.md round-5 ledger))."""
    return dataclasses.replace(
        cfg, dtype="bfloat16", generator_packed_tail=True, dense_w8=True,
        packed_tail_int8=True,
    )


class CompressionPipeline:
    """Batched uint8 -> uint8 contextual-compression serving pipeline.

    pipe = CompressionPipeline(model_dir="models_ckpt")
    decoded_u8, info = pipe(images_u8, target_bpp=1.0)

    `images_u8`: (B, H, W, 3) uint8 RGB. Returns the decoded uint8 batch plus
    a dict with the per-image bit-allocation map and quantized latents.
    `warmup(batch)` pre-compiles for a batch size.
    """

    def __init__(
        self,
        model_dir: Optional[str] = None,
        variables: Optional[Dict] = None,
        model_config: Optional[ModelConfig] = None,
        saliency_config: Optional[SaliencyConfig] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        """`mesh`: optional (data, model) mesh from `parallel.create_mesh` --
        serving then runs SPMD data-parallel: parameters are replicated, every
        request batch is sharded over the mesh devices, and the jitted forward
        executes on all of them at once. The codec has no cross-image
        coupling, so per-image work is independent; no multi-chip serving
        throughput has been MEASURED (this container has one chip) --
        correctness of the sharded path is what is validated, by
        tests/test_serve.py and the driver's dryrun_multichip serving leg.
        Requests are padded to a multiple of the data-axis size.

        Batching contract: requests compile one executable per distinct
        execution batch. Ragged sizes are padded UP to the smallest
        already-compiled batch that fits, else to the next power of two
        (so a 129-image request executes at 256 -- up to ~2x padded compute
        on odd sizes, in exchange for a bounded executable set: warmup sizes
        plus at most log2(max batch) power-of-two buckets). Call
        `warmup(batch)` with your production batch sizes to pin exact-fit
        executables."""
        self.mesh = mesh
        self.mcfg = _serving_model_config(model_config or ModelConfig())
        self.scfg = saliency_config or SaliencyConfig()
        self.codec = AdaptiveCodec(self.mcfg)
        if variables is None:
            template = self.codec.init(jax.random.PRNGKey(0), batch_size=1)
            if model_dir is not None:
                variables, self.provenance = CheckpointStore(
                    model_dir
                ).load_components(template)
            else:
                variables, self.provenance = template, {"all": "init"}
        else:
            self.provenance = {"all": "provided"}
        if self.mcfg.dense_w8:
            # Pre-quantize the giant dense kernels ONCE, from the fp32
            # checkpoint, before the bf16 cast (scales and symbols derive from
            # full precision; the compiled forward then streams int8).
            from contextual_image_compression_tpu.models.layers import (
                quantize_dense_w8,
            )

            variables = quantize_dense_w8(variables)
        # w8_scale rows stay fp32 per the storage contract in models/layers.py
        # (KDense casts them to compute dtype at the multiply).
        self.variables = cast_floats(
            variables, jnp.bfloat16, skip_keys=("w8_scale",)
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # Replicate parameters across the mesh; batches shard on 'data'.
            self.variables = jax.device_put(
                self.variables, NamedSharding(mesh, P())
            )
            self._data_size = int(mesh.shape.get("data", 1)) * int(
                mesh.shape.get("model", 1)
            )
            self._batch_sharding = lambda ndim: NamedSharding(
                mesh, P(("data", "model"), *([None] * (ndim - 1)))
            )
        else:
            self._data_size = 1
            self._batch_sharding = None
        self._compiled_batches: set = set()

        scfg = self.scfg
        codec = self.codec
        coeff = float(self.mcfg.quantizer.scale_coeff)

        def _run(variables, imgs_u8, bpp):
            mask = mask_ops.compute_contextual_mask(imgs_u8, scfg)[..., None]
            img = imgs_u8.astype(jnp.bfloat16) * (1.0 / 127.5) - 1.0
            out, _ = codec.apply(
                variables, img, mask.astype(jnp.bfloat16), bpp, train=False
            )
            decoded = (out.blended.astype(jnp.float32) + 1.0) * 127.5
            decoded = jnp.clip(jnp.round(decoded), 0, 255).astype(jnp.uint8)
            # Integer bitstream symbols, emitted ON DEVICE in fp32 from the
            # pre-quantization latents: reconstructing them on the host from
            # the bf16-stored dequantized latents drifts by ~|symbol|/512 for
            # large symbols (bf16 has an 8-bit mantissa).
            qs = out.quant_strength.astype(jnp.float32)
            hq_scale = jnp.exp(
                coeff * qs * (1.0 - out.hq_saliency_quant.astype(jnp.float32))
            )
            lq_scale = jnp.exp(
                coeff * qs * (1.0 - out.lq_saliency_quant.astype(jnp.float32))
            )
            hq_sym = jnp.round(out.hq_latent.astype(jnp.float32) * hq_scale)
            lq_sym = jnp.round(out.lq_latent.astype(jnp.float32) * lq_scale)
            return decoded, {
                "bit_allocation": out.dynamic_threshold[..., 0],
                "hq_latent_q": out.hq_latent_q,
                "lq_latent_q": out.lq_latent_q,
                "hq_saliency": out.hq_saliency_quant,
                "lq_saliency": out.lq_saliency_quant,
                "quant_strength": out.quant_strength,
                "hq_symbols": hq_sym,
                "lq_symbols": lq_sym,
                "hq_scale": hq_scale[:, 0],
                "lq_scale": lq_scale[:, 0],
                "mask": mask[..., 0],
            }

        self._run = jax.jit(_run)

        def _decode(variables, hq_latent, lq_latent, mask_small, bpp):
            h, w = self.mcfg.img_size
            mask = jax.image.resize(
                mask_small, (mask_small.shape[0], h, w), method="bilinear"
            )[..., None]
            img = codec.decode_latents(
                variables, hq_latent, lq_latent, mask, bpp
            )
            decoded = (img.astype(jnp.float32) + 1.0) * 127.5
            return jnp.clip(jnp.round(decoded), 0, 255).astype(jnp.uint8)

        self._decode = jax.jit(_decode)

    def warmup(self, batch: int) -> None:
        h, w = self.mcfg.img_size
        dummy = jnp.zeros((batch, h, w, self.mcfg.channels), jnp.uint8)
        self(np.asarray(dummy), target_bpp=1.0)

    def _padded_batch(self, b: int) -> int:
        """Pick the execution batch for a request of b images: the smallest
        already-compiled batch size that fits, else the next power of two
        (which then joins the compiled set). Ragged tail batches therefore
        reuse an existing executable instead of triggering a multi-second
        recompile per novel size."""
        fitting = [c for c in self._compiled_batches if c >= b]
        if fitting:
            return min(fitting)
        p = 1
        while p < b:
            p *= 2
        # On a mesh the executed batch must divide evenly over the devices.
        d = self._data_size
        return p if p % d == 0 else ((p + d - 1) // d) * d

    def __call__(
        self, images_u8: np.ndarray, target_bpp: float = 1.0
    ) -> Tuple[np.ndarray, Dict]:
        b = images_u8.shape[0]
        bp = self._padded_batch(b)
        if bp != b:
            pad = np.zeros((bp - b,) + images_u8.shape[1:], images_u8.dtype)
            images_u8 = np.concatenate([np.asarray(images_u8), pad], axis=0)
        bpp = jnp.full((bp, 1), float(target_bpp), jnp.bfloat16)
        imgs_dev = jnp.asarray(images_u8)
        if self.mesh is not None:
            imgs_dev = jax.device_put(imgs_dev, self._batch_sharding(imgs_dev.ndim))
            bpp = jax.device_put(bpp, self._batch_sharding(2))
        decoded, info = self._run(self.variables, imgs_dev, bpp)
        self._compiled_batches.add(bp)
        if bp != b:
            decoded = decoded[:b]
            info = {k: v[:b] for k, v in info.items()}
        return np.asarray(decoded), info

    def serialize_latents(self, info: Dict) -> Tuple[List[Tuple[bytes, bytes]], np.ndarray]:
        """Entropy-code the quantized latents into real per-image bitstreams;
        returns (streams, measured bits-per-pixel). Uses the exact integer
        symbols emitted on device by the forward pass. See module caveat."""
        streams = bs.pack_codec_symbols(
            np.asarray(info["hq_symbols"], np.float32),
            np.asarray(info["lq_symbols"], np.float32),
            np.asarray(info["hq_scale"], np.float32),
            np.asarray(info["lq_scale"], np.float32),
        )
        return streams, bs.measured_bpp(streams, self.mcfg.img_size)

    # ------------------------------------------------- storable codec format
    def encode_to_bitstream(
        self,
        images_u8: np.ndarray,
        target_bpp: float = 1.0,
        mask_downsample: int = 8,
    ) -> List[bytes]:
        """Encode a uint8 batch to self-contained per-image container streams
        (latents + downsampled mask + target bpp -- everything decode needs,
        ops/bitstream.pack_container). For a faithful round trip the model
        should be trained with skip_mode='zero' (see ModelConfig.skip_mode):
        with the reference's 'encoder' skips, decoding from the bitstream
        reconstructs only what the latents carry."""
        _, info = self(images_u8, target_bpp=target_bpp)
        latent_streams, _ = self.serialize_latents(info)
        mask = np.asarray(info["mask"], np.float32)
        return [
            bs.pack_container(
                hq, lq, mask[i], target_bpp, self.mcfg.img_size, mask_downsample
            )
            for i, (hq, lq) in enumerate(latent_streams)
        ]

    def decode_from_bitstream(self, streams) -> np.ndarray:
        """bytes -> decoded uint8 images, with NO encoder in the loop: unpack
        latents + mask, run the generator-only decoder
        (AdaptiveCodec.decode_latents). Accepts one stream or a list."""
        if isinstance(streams, (bytes, bytearray)):
            streams = [streams]
        parts = [bs.unpack_container(s) for s in streams]
        h, w = self.mcfg.img_size
        for p in parts:
            if p["img_hw"] != (h, w):
                raise ValueError(
                    f"stream image size {p['img_hw']} != pipeline {(h, w)}"
                )
        hq = np.stack([p["hq_latent"] for p in parts])
        lq = np.stack([p["lq_latent"] for p in parts])
        mask_small = np.stack([p["mask_small"] for p in parts])
        bpp = np.array([[p["target_bpp"]] for p in parts], np.float32)
        b = hq.shape[0]
        bp = self._padded_batch(b) if self.mesh is not None else b
        if bp != b:
            pad = lambda a: np.concatenate(
                [a, np.zeros((bp - b,) + a.shape[1:], a.dtype)], axis=0
            )
            hq, lq, mask_small, bpp = pad(hq), pad(lq), pad(mask_small), pad(bpp)
        args = [jnp.asarray(hq), jnp.asarray(lq), jnp.asarray(mask_small), jnp.asarray(bpp)]
        if self.mesh is not None:
            args = [
                jax.device_put(a, self._batch_sharding(a.ndim)) for a in args
            ]
        out = np.asarray(self._decode(self.variables, *args))
        return out[:b]
