"""GAN codec evaluation harness (reference: GAN_test.py:265-693).

TPU-first redesign: the reference loops `model.predict` per (image, bpp) pair and
recomputes CPU saliency for every pair (SURVEY.md section 3.3); here saliency/masks
are computed once for all images in one batched jitted call, and each bpp sweep
evaluates the whole image set in batched jitted forwards -- including the metrics,
which stay on device.

Capability parity:
  * compress_and_reconstruct        (GAN_test.py:265-340)
  * test_compression bpp sweep with per-bpp dirs, compressed outputs,
    visualizations, metrics.txt     (GAN_test.py:342-454)
  * plot_rate_distortion_curve      (GAN_test.py:456-530) -- in eval/plots.py
  * test_rate_control fine sweep    (GAN_test.py:532-645)
  * model loading with fallback     (GAN_test.py:37-220) -- via CheckpointStore
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from contextual_image_compression_tpu.checkpoint import CheckpointStore
from contextual_image_compression_tpu.config import EvalConfig, analytic_bpp
from contextual_image_compression_tpu.data import images as image_io
from contextual_image_compression_tpu.data.pipeline import prepare_masks
from contextual_image_compression_tpu.eval import plots
from contextual_image_compression_tpu.models.adaptive import AdaptiveCodec
from contextual_image_compression_tpu.ops import bitstream
from contextual_image_compression_tpu.ops import metrics as metric_ops

# The reference's bit-allocation visualization bpps (GAN_functions.py:835).
_VIS_BPPS = (0.1, 1.0, 2.0)


@dataclasses.dataclass
class CodecEvaluator:
    cfg: EvalConfig = EvalConfig()
    mesh: Optional[object] = None  # jax.sharding.Mesh for data-parallel eval

    def __post_init__(self):
        self.codec = AdaptiveCodec(self.cfg.model)
        self._apply = jax.jit(
            lambda variables, img, mask, bpp: self.codec.apply(
                variables, img, mask, bpp, train=False
            )[0]
        )
        self._metrics = jax.jit(metric_ops.gan_metrics)

    def _place_variables(self, variables):
        if self.mesh is None:
            return variables
        from contextual_image_compression_tpu.parallel import sharding as shard_lib

        return shard_lib.shard_state(variables, self.mesh)

    def _place_batch(self, tree):
        if self.mesh is None:
            return tree
        from contextual_image_compression_tpu.parallel import sharding as shard_lib

        return shard_lib.shard_batch(tree, self.mesh)

    # ------------------------------------------------------------------ load
    def load_models(self, model_dir: Optional[str] = None, rng_seed: int = 0):
        """Load codec components with the reference's fallback ladder
        (GAN_test.py:37-220): final -> latest epoch -> fresh init per component."""
        store = CheckpointStore(model_dir or self.cfg.model_dir)
        templates = self.codec.init(jax.random.PRNGKey(rng_seed), batch_size=1)
        variables, provenance = store.load_components(templates)
        return self._place_variables(variables), provenance

    # ------------------------------------------------------------- inference
    def run_batch(
        self, variables, images: np.ndarray, masks: np.ndarray, bpp: float,
        batch_size: Optional[int] = None,
    ):
        """Codec forward over an image set at one target bpp, device-batched.

        The tail batch is PADDED to the full batch size (then sliced back) so the
        jitted forward compiles exactly once regardless of dataset size."""
        bs = batch_size or self.cfg.batch_size
        outs = []
        for start in range(0, len(images), bs):
            img_np = images[start : start + bs]
            mask_np = masks[start : start + bs]
            n = len(img_np)
            if n < bs:
                pad = bs - n
                img_np = np.concatenate([img_np, np.repeat(img_np[-1:], pad, 0)])
                mask_np = np.concatenate([mask_np, np.repeat(mask_np[-1:], pad, 0)])
            img = self._place_batch(jnp.asarray(img_np))
            bpp_arr = self._place_batch(jnp.full((bs, 1), bpp, img.dtype))
            out = self._apply(variables, img, self._place_batch(jnp.asarray(mask_np)), bpp_arr)
            if n < bs:
                out = jax.tree.map(lambda x: x[:n], out)
            outs.append(out)
        return outs

    def compress_and_reconstruct(
        self, variables, images: np.ndarray, masks: np.ndarray, target_bpp: float
    ) -> Dict[str, np.ndarray]:
        """Batched equivalent of the reference's per-image compress_and_reconstruct
        (GAN_test.py:265-340): returns arrays over the image axis."""
        mcfg = self.cfg.model
        all_metrics = {"psnr": [], "ssim": [], "mse": []}
        compressed, allocations, hq_ratios, measured = [], [], [], []
        offset = 0
        for out in self.run_batch(variables, images, masks, target_bpp):
            n = out.blended.shape[0]
            m = self._metrics(jnp.asarray(images[offset : offset + n]), out.blended)
            offset += n
            for k in all_metrics:
                all_metrics[k].append(np.asarray(m[k]))
            compressed.append(np.asarray(out.blended))
            allocations.append(np.asarray(out.dynamic_threshold))
            hq_ratios.append(np.asarray(jnp.mean(out.dynamic_threshold, axis=(1, 2, 3))))
            # REAL bitstream sizes next to the reference's analytic accounting
            # (GAN_test.py:314-325 is analytic only): serialize the quantized
            # latents through the entropy coder at each image's quantizer grid
            # scale exp(coeff*q*(1-s)) (GAN_functions.py:436-441).
            qs = np.asarray(out.quant_strength)[:, 0]
            coeff = mcfg.quantizer.scale_coeff
            hq_scales = np.exp(coeff * qs * (1.0 - np.asarray(out.hq_saliency_quant)[:, 0]))
            lq_scales = np.exp(coeff * qs * (1.0 - np.asarray(out.lq_saliency_quant)[:, 0]))
            streams = bitstream.pack_codec_latents(
                np.asarray(out.hq_latent_q), np.asarray(out.lq_latent_q),
                hq_scales, lq_scales,
            )
            measured.append(bitstream.measured_bpp(streams, mcfg.img_size))

        hq_ratio = np.concatenate(hq_ratios)
        actual_bpp = np.asarray(
            analytic_bpp(hq_ratio, mcfg.base_latent_dim, mcfg.img_size)
        )
        original_bits = mcfg.img_size[0] * mcfg.img_size[1] * 3 * 8
        total_bits = actual_bpp * mcfg.img_size[0] * mcfg.img_size[1]
        return {
            "compressed": np.concatenate(compressed),
            "bit_allocation": np.concatenate(allocations),
            "psnr": np.concatenate(all_metrics["psnr"]),
            "ssim": np.concatenate(all_metrics["ssim"]),
            "mse": np.concatenate(all_metrics["mse"]),
            "hq_ratio": hq_ratio,
            "lq_ratio": 1.0 - hq_ratio,
            "actual_bpp": actual_bpp,
            "measured_bpp": np.concatenate(measured),
            "compression_ratio": original_bits / np.maximum(total_bits, 1e-9),
        }

    # ------------------------------------------------------------------ sweep
    def test_compression(
        self,
        variables,
        images: np.ndarray,
        masks: np.ndarray,
        file_names: Sequence[str],
        results_dir: Optional[str] = None,
        save_artifacts: bool = True,
    ) -> Dict[str, Dict]:
        """BPP sweep over the image set (reference: GAN_test.py:342-454): per-bpp
        directories with compressed outputs + visualizations + metrics.txt, and the
        averaged metrics dict feeding the RD plots."""
        results_dir = results_dir or self.cfg.results_dir
        results_by_bpp: Dict[float, Dict[str, list]] = {}
        avg_metrics: Dict[float, Dict[str, float]] = {}

        for bpp in self.cfg.bpp_values:
            r = self.compress_and_reconstruct(variables, images, masks, bpp)
            results_by_bpp[bpp] = {
                "psnr": list(map(float, r["psnr"])),
                "ssim": list(map(float, r["ssim"])),
                "mse": list(map(float, r["mse"])),
                "compression_ratio": list(map(float, r["compression_ratio"])),
                "actual_bpp": list(map(float, r["actual_bpp"])),
                "measured_bpp": list(map(float, r["measured_bpp"])),
                "hq_ratio": list(map(float, r["hq_ratio"])),
            }
            avg_metrics[bpp] = {
                k: float(np.mean(v)) if v else 0.0
                for k, v in results_by_bpp[bpp].items()
            }

            if save_artifacts:
                bpp_dir = os.path.join(results_dir, f"bpp_{bpp}")
                out_dir = os.path.join(bpp_dir, "compressed")
                vis_dir = os.path.join(bpp_dir, "visualizations")
                image_io.create_directories([bpp_dir, out_dir, vis_dir])
                for i, name in enumerate(file_names):
                    image_io.save_image(r["compressed"][i], os.path.join(out_dir, name))
                    plots.visualize_results(
                        images[i],
                        masks[i, :, :, 0],
                        r["compressed"][i],
                        os.path.join(
                            vis_dir, f"{os.path.splitext(name)[0]}_vis.png"
                        ),
                        r["bit_allocation"][i],
                    )
                self._write_metrics_txt(
                    os.path.join(bpp_dir, "metrics.txt"),
                    bpp,
                    avg_metrics[bpp],
                    results_by_bpp[bpp],
                    file_names,
                )

        return {"by_bpp": results_by_bpp, "avg_metrics": avg_metrics}

    @staticmethod
    def _write_metrics_txt(path, bpp, avg, per_image, file_names):
        """metrics.txt format (reference: GAN_test.py:430-449)."""
        with open(path, "w") as f:
            f.write(f"Target BPP: {bpp}\n\n")
            f.write(f"Average PSNR: {avg['psnr']:.2f} dB\n")
            f.write(f"Average SSIM: {avg['ssim']:.4f}\n")
            f.write(f"Average MSE: {avg['mse']:.6f}\n")
            f.write(f"Average Compression Ratio: {avg['compression_ratio']:.2f}x\n")
            f.write(f"Average Actual BPP: {avg['actual_bpp']:.4f}\n")
            f.write(f"Average Measured BPP (real bitstream): {avg['measured_bpp']:.4f}\n")
            f.write(f"Average HQ Region Ratio: {avg['hq_ratio'] * 100:.2f}%\n\n")
            f.write("Image-by-image metrics:\n")
            for i, name in enumerate(file_names):
                f.write(f"\n{name}:\n")
                f.write(f"  PSNR: {per_image['psnr'][i]:.2f} dB\n")
                f.write(f"  SSIM: {per_image['ssim'][i]:.4f}\n")
                f.write(f"  MSE: {per_image['mse'][i]:.6f}\n")
                f.write(f"  Compression Ratio: {per_image['compression_ratio'][i]:.2f}x\n")
                f.write(f"  Actual BPP: {per_image['actual_bpp'][i]:.4f}\n")
                f.write(f"  Measured BPP: {per_image['measured_bpp'][i]:.4f}\n")
                f.write(f"  HQ Region Ratio: {per_image['hq_ratio'][i] * 100:.2f}%\n")

    # ----------------------------------------------------------- rate control
    def test_rate_control(
        self,
        variables,
        images: np.ndarray,
        masks: np.ndarray,
        file_names: Sequence[str],
        results_dir: Optional[str] = None,
        save_artifacts: bool = True,
    ) -> Dict[str, list]:
        """Fine-grained rate-control sweep (reference: GAN_test.py:532-645):
        linspace(0.1, 2.0, 10) x first 4 images, producing the
        rate_control_accuracy / hq_ratio_by_bpp scatter artifacts."""
        cfg = self.cfg
        results_dir = results_dir or cfg.results_dir
        k = min(cfg.rate_control_max_images, len(images))
        sub_images, sub_masks = images[:k], masks[:k]
        sub_names = list(file_names[:k])
        test_bpps = np.linspace(*cfg.rate_control_bpp_range, cfg.rate_control_bpps)

        results = {"target_bpp": [], "actual_bpp": [], "hq_ratio": [], "image": []}
        allocations_per_image: List[Dict[float, np.ndarray]] = [dict() for _ in range(k)]
        for bpp in test_bpps:
            r = self.compress_and_reconstruct(variables, sub_images, sub_masks, float(bpp))
            for i in range(k):
                results["target_bpp"].append(float(bpp))
                results["actual_bpp"].append(float(r["actual_bpp"][i]))
                results["hq_ratio"].append(float(r["hq_ratio"][i]))
                results["image"].append(sub_names[i])
                if float(bpp) in _VIS_BPPS:
                    allocations_per_image[i][float(bpp)] = r["bit_allocation"][i]
        # The reference renders bit-allocation panels at exactly {0.1, 1.0, 2.0}
        # (GAN_functions.py:835); the linspace sweep only contains the endpoints,
        # so run any missing panel bpps explicitly.
        if save_artifacts:
            for bpp in _VIS_BPPS:
                if any(bpp not in allocations_per_image[i] for i in range(k)):
                    r = self.compress_and_reconstruct(variables, sub_images, sub_masks, bpp)
                    for i in range(k):
                        allocations_per_image[i][bpp] = r["bit_allocation"][i]

        if save_artifacts:
            rc_dir = os.path.join(results_dir, "rate_control_test")
            image_io.create_directories([rc_dir])
            for i, name in enumerate(sub_names):
                if allocations_per_image[i]:
                    plots.visualize_bit_allocation_by_bpp(
                        sub_images[i],
                        allocations_per_image[i],
                        os.path.join(
                            rc_dir, f"{os.path.splitext(name)[0]}_bit_allocation.png"
                        ),
                    )
            plots.plot_rate_control_scatter(results, rc_dir)
        return results

    # ------------------------------------------------------------------- main
    def run(self, model_dir: Optional[str] = None, test_dir: Optional[str] = None):
        """Full evaluation flow (reference: GAN_test.py:647-693)."""
        cfg = self.cfg
        variables, provenance = self.load_models(model_dir)
        print(f"Loaded components: {provenance}")
        images, file_names, _sizes = image_io.load_folder_gan(
            test_dir or cfg.test_dir, cfg.model.img_size
        )
        if len(images) == 0:
            print("No test images found!")
            return None
        masks = prepare_masks(images, cfg.saliency)
        image_io.create_directories([cfg.results_dir])
        results = self.test_compression(variables, images, masks, file_names)
        self.test_rate_control(variables, images, masks, file_names)
        if results["avg_metrics"]:
            plots.plot_rate_distortion_curve(results["avg_metrics"], cfg.results_dir)
        return results
