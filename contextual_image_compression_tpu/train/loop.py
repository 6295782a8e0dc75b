"""High-level GAN training loop (reference: GAN_train.py:410-622,662-693).

Per-epoch behavior mirrors the reference:
  * D trained every other step, G every step (GAN_train.py:426-431)
  * running-mean step prints (GAN_train.py:445-448)
  * per-epoch sample visualizations (GAN_train.py:450-465)
  * per-epoch rate-control gradient probe (GAN_train.py:468-472,624-660)
  * per-epoch 4-panel + final 8-panel loss plots (GAN_train.py:502-544,583-609)
  * component checkpoints every N epochs + final (GAN_train.py:547-581)
  * main() flow: full training then per-bpp fine-tuning (GAN_train.py:662-693)

plus what the reference lacks: optimizer-state checkpointing, resume, profiling
hooks, and mesh sharding.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contextual_image_compression_tpu.checkpoint import CheckpointStore
from contextual_image_compression_tpu.config import TrainConfig
from contextual_image_compression_tpu.data.pipeline import CompressionDataset
from contextual_image_compression_tpu.eval import plots
from contextual_image_compression_tpu.models.vgg import load_vgg19_features
from contextual_image_compression_tpu.parallel import sharding as shard_lib
from contextual_image_compression_tpu.train.gan_trainer import (
    Batch,
    GANStepBuilder,
    GANTrainState,
)

HISTORY_KEYS = (
    "d_loss",
    "g_loss",
    "reconstruction_loss",
    "gan_loss",
    "perceptual_loss",
    "l1_loss",
    "latent_saliency_loss",
    "rd_loss",
)


class GANTrainer:
    """Owns the step functions, state, history, checkpoints, and artifacts."""

    def __init__(
        self,
        cfg: TrainConfig,
        mesh=None,
        bn_mode: str = "train",
        disc_bn_mode: Optional[str] = None,
        log_fn: Callable[[str], None] = print,
        nan_guard: bool = False,
        save_mode: str = "background",
    ):
        # 'background': HBM snapshot + writer thread; 'host': blocking
        # device->host serialization with zero extra HBM (see save()).
        if save_mode not in ("background", "host"):
            raise ValueError(f"unknown save_mode {save_mode!r}")
        self.save_mode = save_mode
        self.cfg = cfg
        self.mesh = mesh
        self.log = log_fn
        # NaN/Inf sentinel (SURVEY.md section 5 'race detection/sanitizers' slot):
        # checks step metrics each step and diagnoses the offending parameter
        # leaves on trigger. Costs one host sync per step -- debug tool, off by
        # default.
        self.nan_guard = nan_guard

        vgg_bundle = (
            load_vgg19_features(cfg.vgg_weights_path) if cfg.use_perceptual else None
        )
        if vgg_bundle is not None:
            vgg, vgg_vars = vgg_bundle
            self.log("Perceptual loss: VGG19 weights loaded")
        else:
            vgg, vgg_vars = None, None
            if cfg.use_perceptual:
                # Same fallback contract as the reference (GAN_train.py:187-195).
                self.log(
                    "WARNING: no VGG19 weights available -- perceptual loss disabled"
                )
        self.builder = GANStepBuilder(
            cfg, vgg=vgg, vgg_vars=vgg_vars, bn_mode=bn_mode, disc_bn_mode=disc_bn_mode
        )
        self.codec = self.builder.codec
        self.disc = self.builder.disc
        self.step_with_d, self.step_without_d = self.builder.jitted_steps()
        # Jitted inference/probe paths: un-jitted module.apply dispatches op-by-op,
        # which on a remote-TPU relay costs minutes per epoch of artifacts.
        def _eval_apply(v, img, mask, bpp):
            return self.codec.apply(v, img, mask, bpp, train=False)[0]

        def _hq_ratio(v, img, mask, bpp_scalar):
            bpp = jnp.full((img.shape[0], 1), bpp_scalar)
            out = _eval_apply(v, img, mask, bpp)
            return jnp.mean(out.dynamic_threshold), out.dynamic_threshold

        self._eval_apply = jax.jit(_eval_apply)
        self._hq_ratio_grad = jax.jit(jax.value_and_grad(_hq_ratio, argnums=3, has_aux=True))
        self.store = CheckpointStore(cfg.model_dir)
        self.history: Dict[str, List[float]] = {k: [] for k in HISTORY_KEYS}
        self.state: Optional[GANTrainState] = None

    # ----------------------------------------------------------------- state
    def init_state(self, resume: bool = True) -> GANTrainState:
        state = self.builder.init_state(
            jax.random.PRNGKey(self.cfg.seed), batch_size=self.cfg.batch_size
        )
        self.start_epoch = 0
        if resume:
            templates = dict(state.codec_vars)
            templates["discriminator"] = state.disc_vars
            templates["optimizers"] = {
                "g_opt": state.g_opt,
                "ls_opt": state.ls_opt,
                "rd_opt": state.rd_opt,
                "d_opt": state.d_opt,
                "step": state.step,
            }
            loaded, provenance = self.store.load_components(templates)
            if any(p != "init" for p in provenance.values()):
                self.log(f"Restored components: {provenance}")
                disc_vars = loaded.pop("discriminator")
                opts = loaded.pop("optimizers")
                state = state.replace(codec_vars=loaded, disc_vars=disc_vars)
                if provenance["optimizers"] != "init":
                    # Resume must also restore the 4 Adam states + step, or the
                    # moments silently reinitialize (beyond-reference capability:
                    # the reference saves weights only, GAN_train.py:547-581).
                    state = state.replace(
                        g_opt=opts["g_opt"],
                        ls_opt=opts["ls_opt"],
                        rd_opt=opts["rd_opt"],
                        d_opt=opts["d_opt"],
                        step=jnp.asarray(opts["step"], jnp.int32),
                    )
                meta = self.store.latest_metadata()
                if meta:
                    self.start_epoch = int(meta.get("epoch", 0))
                    self.history = {
                        k: list(meta.get("history", {}).get(k, []))
                        for k in HISTORY_KEYS
                    }
        if self.mesh is not None:
            state = shard_lib.shard_state(state, self.mesh)
        self.state = state
        return state

    def _place(self, batch: Batch) -> Batch:
        if self.mesh is not None:
            return shard_lib.shard_batch(batch, self.mesh)
        return batch

    # ------------------------------------------------------------------ train
    def fit(
        self,
        dataset: CompressionDataset,
        epochs: Optional[int] = None,
        steps_per_epoch: Optional[int] = None,
        artifacts: bool = True,
        sample_batch: Optional[Batch] = None,
        profile_dir: Optional[str] = None,
        profile_steps: int = 3,
    ) -> Dict[str, List[float]]:
        """profile_dir: capture a jax.profiler trace (XProf/Perfetto) of
        `profile_steps` early steps of the first epoch -- the tracing tier the
        reference lacks entirely (SURVEY.md section 5)."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        steps_per_epoch = steps_per_epoch or dataset.steps_per_epoch
        if self.state is None:
            self.init_state()
        os.makedirs(cfg.results_dir, exist_ok=True)
        samples_dir = os.path.join(cfg.results_dir, "training_samples")
        os.makedirs(samples_dir, exist_ok=True)
        if sample_batch is None:
            sample_batch = dataset.first_samples(cfg.sample_visualizations)

        for epoch in range(epochs):
            t0 = time.time()
            # Metric sums stay ON DEVICE during the epoch (each host fetch costs a
            # full relay round trip on remote-TPU runtimes; fetching 10 metrics per
            # step dominated the epoch time). One transfer at epoch end.
            sums: Dict[str, jnp.ndarray] = {}
            counts = {k: 0 for k in HISTORY_KEYS}
            step_iter = dataset.epoch()
            n_images = 0
            for step in range(steps_per_epoch):
                if profile_dir and epoch == 0:
                    # skip step 0 (compile); trace steps 1..profile_steps
                    if step == 1:
                        jax.profiler.start_trace(profile_dir)
                    elif step == 1 + profile_steps:
                        jax.profiler.stop_trace()
                        self.log(f"profiler trace written to {profile_dir}")
                try:
                    batch = next(step_iter)
                except StopIteration:
                    step_iter = dataset.epoch()
                    batch = next(step_iter)
                batch = self._place(batch)
                # D every other step (reference: GAN_train.py:426-428)
                step_fn = (
                    self.step_with_d
                    if step % cfg.d_every_n_steps == 0
                    else self.step_without_d
                )
                self.state, metrics = step_fn(self.state, batch)
                if self.nan_guard and not all(
                    np.isfinite(float(v)) for v in metrics.values()
                ):
                    from contextual_image_compression_tpu.utils.tree import (
                        find_nonfinite,
                    )

                    bad_params = find_nonfinite(
                        {n: v for n, v in self.state.codec_vars.items()}
                    )
                    raise FloatingPointError(
                        f"non-finite training metrics at step {int(self.state.step)}: "
                        f"{ {k: float(v) for k, v in metrics.items()} }; "
                        f"non-finite params: {bad_params}"
                    )
                n_images += int(batch.image.shape[0])
                for k, v in metrics.items():
                    if k in counts:
                        sums[k] = v if k not in sums else sums[k] + v
                        counts[k] += 1

            if profile_dir and epoch == 0 and 1 < steps_per_epoch <= 1 + profile_steps:
                try:  # epoch too short to hit the stop step above
                    jax.profiler.stop_trace()
                    self.log(f"profiler trace written to {profile_dir}")
                except Exception:
                    pass

            means = {
                k: (float(sums[k]) / counts[k] if counts[k] else float("nan"))
                for k in HISTORY_KEYS
            }
            for k in HISTORY_KEYS:
                self.history[k].append(means[k])
            # Global epoch number = total history length (restored history already
            # includes pre-resume epochs, so start_epoch must NOT be added again).
            epoch_label = len(self.history["g_loss"])

            dt = time.time() - t0
            ips = n_images / dt if dt > 0 else float("nan")
            self.log(
                f"Epoch {epoch_label}: "
                f"D {means['d_loss']:.4f}, G {means['g_loss']:.4f}, "
                f"Recon {means['reconstruction_loss']:.4f}, RD {means['rd_loss']:.4f}, "
                f"LS {means['latent_saliency_loss']:.4f} "
                f"({dt:.2f}s, {ips:.1f} img/s)"
            )

            if artifacts:
                self._epoch_artifacts(epoch_label, sample_batch, samples_dir)
            # The fit's last epoch is covered by the unconditional 'final' save
            # below -- an epoch-tagged save there would serialize the identical
            # state twice (minutes per save on remote-TPU runtimes).
            if (epoch + 1) % cfg.checkpoint_every == 0 and epoch + 1 != epochs:
                self.save(f"epoch_{epoch_label}")

        self.save("final")
        self._join_saver()  # final checkpoint must be durable before returning
        if artifacts:
            plots.plot_final_losses(
                self.history, os.path.join(cfg.results_dir, "final_loss_history.png")
            )
        return self.history

    # -------------------------------------------------------------- artifacts
    def _eval_codec(self, batch: Batch):
        return self._eval_apply(
            self.state.codec_vars, batch.image, batch.mask, batch.bpp
        )

    def _epoch_artifacts(self, epoch: int, sample_batch: Batch, samples_dir: str):
        cfg = self.cfg
        out = self._eval_codec(self._place(sample_batch))
        imgs = np.asarray(sample_batch.image)
        masks = np.asarray(sample_batch.mask)
        bpps = np.asarray(sample_batch.bpp)
        comp = np.asarray(out.blended)
        alloc = np.asarray(out.dynamic_threshold)
        for i in range(len(imgs)):
            plots.visualize_results(
                imgs[i],
                masks[i, :, :, 0],
                comp[i],
                os.path.join(
                    samples_dir,
                    f"sample_{i + 1}_epoch_{epoch}_bpp_{bpps[i, 0]:.2f}.png",
                ),
                alloc[i],
            )
        self.rate_control_probe(
            sample_batch,
            os.path.join(cfg.results_dir, "rate_control_test.png"),
        )
        plots.plot_epoch_losses(
            self.history,
            os.path.join(cfg.results_dir, f"loss_history_epoch_{epoch}.png"),
        )

    def rate_control_probe(self, sample_batch: Batch, save_path: Optional[str] = None):
        """d(hq_ratio)/d(target_bpp) probe at bpp in {0.1, 1.0, 2.0}
        (reference: GAN_train.py:624-660), computed with jax.grad instead of a
        GradientTape, plus the bit-allocation strip visualization."""
        img = sample_batch.image[:1]
        mask = sample_batch.mask[:1]
        vars_ = self.state.codec_vars

        results = []
        allocations = {}
        for bpp in (0.1, 1.0, 2.0):
            (ratio, alloc), grad = self._hq_ratio_grad(
                vars_, img, mask, jnp.float32(bpp)
            )
            results.append((bpp, float(ratio), float(grad)))
            allocations[bpp] = np.asarray(alloc[0])
        self.log("Rate Control Gradient Test:")
        for bpp, ratio, grad in results:
            self.log(f"  BPP: {bpp}, HQ Ratio: {ratio:.4f}, Gradient: {grad:.6f}")
        if save_path:
            plots.visualize_bit_allocation_by_bpp(
                np.asarray(img[0]), allocations, save_path
            )
        return results

    # ------------------------------------------------------------ checkpoints
    def save(self, tag: str, blocking: bool = False):
        """Checkpoint the full train state.

        Non-blocking by default: the state is snapshotted with a fast device-side
        copy (the training steps DONATE their input state, so the live buffers
        cannot be handed to a background reader), then the slow device->host
        transfer + serialization runs on a writer thread while training
        continues. The reference has no analogue (its Keras saves block,
        GAN_train.py:547-581); on remote-TPU runtimes a blocking save of the
        ~2.4 GB state costs minutes per save point.

        save_mode='host' (trainer constructor) skips the HBM snapshot entirely:
        the state is serialized straight to host memory, blocking, with zero
        extra HBM. Use when HBM headroom is gone -- the background mode's
        transient second copy of the ~5 GB state OOMed the perceptual-loss
        reference-scale run (VGG activations + device-resident corpus +
        2x state > one v5e chip).
        """
        import threading

        state_tuple = (
            self.state.codec_vars,
            self.state.disc_vars,
            {
                "g_opt": self.state.g_opt,
                "ls_opt": self.state.ls_opt,
                "rd_opt": self.state.rd_opt,
                "d_opt": self.state.d_opt,
                "step": self.state.step,
            },
        )
        if self.save_mode == "host":
            # no steps are in flight between epochs; read the live buffers
            # directly to host (no jnp.copy), then write synchronously
            snapshot = jax.tree.map(lambda x: np.asarray(x), state_tuple)
            blocking = True
        else:
            # Join the previous writer BEFORE snapshotting: two live snapshots
            # of the ~5 GB train state (plus the state itself and a
            # device-resident corpus) exceed one chip's HBM -- observed as
            # RESOURCE_EXHAUSTED when the final save overlapped the last
            # epoch-tagged save.
            self._join_saver()
            # device-side snapshot (HBM->HBM, milliseconds)
            snapshot = jax.tree.map(jnp.copy, state_tuple)
        # History length IS the global epoch count (it includes restored epochs).
        epoch = len(self.history["g_loss"])
        history = {k: list(v) for k, v in self.history.items()}

        def write():
            codec_vars, disc_vars, opts = snapshot
            components = dict(codec_vars)
            components["discriminator"] = disc_vars
            self.store.save_components(components, tag)
            self.store.save_component("optimizers", opts, tag)
            self.store.save_metadata({"epoch": epoch, "history": history}, tag)

        if blocking:
            write()
            return
        self._saver = threading.Thread(target=write, name=f"ckpt-{tag}", daemon=False)
        self._saver.start()

    def _join_saver(self):
        saver = getattr(self, "_saver", None)
        if saver is not None and saver.is_alive():
            saver.join()
        self._saver = None


def train_full_reference_flow(
    cfg: TrainConfig, dataset: CompressionDataset, mesh=None, log=print
) -> GANTrainer:
    """The reference main() flow: train EPOCHS, then fine-tune per fixed bpp
    (reference: GAN_train.py:662-693)."""
    trainer = GANTrainer(cfg, mesh=mesh, log_fn=log)
    trainer.init_state()
    trainer.fit(dataset)
    for target_bpp in cfg.bpp_range:
        log(f"Fine-tuning for target bitrate: {target_bpp} bpp...")
        trainer.fit(
            dataset.with_target_bpp(float(target_bpp)), epochs=cfg.fine_tune_epochs
        )
    return trainer
