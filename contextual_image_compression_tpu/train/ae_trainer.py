"""Autoencoder training (reference: train_autoencoder.py:58-90).

The reference uses keras `.fit(images, images, epochs=50, batch_size=16,
shuffle=True, validation_split=0.1)` with Adam(1e-3)+MSE. Here: a jitted optax train
step (mesh-shardable like the GAN step), the same 90/10 split, per-epoch
train/validation MSE history, msgpack checkpointing.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from contextual_image_compression_tpu.checkpoint import CheckpointStore
from contextual_image_compression_tpu.config import AutoencoderConfig
from contextual_image_compression_tpu.models.autoencoder import Autoencoder
from contextual_image_compression_tpu.parallel import sharding as shard_lib


class AETrainer:
    def __init__(self, cfg: AutoencoderConfig = AutoencoderConfig(), mesh=None,
                 log_fn: Callable[[str], None] = print):
        self.cfg = cfg
        self.mesh = mesh
        self.log = log_fn
        self.model = Autoencoder(
            out_channels=cfg.channels, enc_channels=cfg.enc_channels,
            dtype=jnp.dtype(cfg.dtype),
        )
        self.tx = optax.adam(cfg.learning_rate)
        self.params = None
        self.opt_state = None

        @jax.jit
        def train_step(params, opt_state, batch):
            def loss_fn(p):
                recon = self.model.apply(p, batch)
                return jnp.mean((recon - batch) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_loss(params, batch):
            recon = self.model.apply(params, batch)
            return jnp.mean((recon - batch) ** 2)

        self._train_step = train_step
        self._eval_loss = eval_loss
        self._apply = jax.jit(self.model.apply)

    def init(self, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(42)
        h, w = self.cfg.img_size
        self.params = self.model.init(rng, jnp.zeros((1, h, w, self.cfg.channels)))
        self.opt_state = self.tx.init(self.params)
        if self.mesh is not None:
            self.params = shard_lib.shard_state(self.params, self.mesh)
            self.opt_state = shard_lib.shard_state(self.opt_state, self.mesh)
        return self.params

    def fit(
        self,
        images: np.ndarray,
        epochs: Optional[int] = None,
        batch_size: Optional[int] = None,
        seed: int = 42,
    ) -> Dict[str, List[float]]:
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        batch_size = batch_size or cfg.batch_size
        if self.params is None:
            self.init()

        n = len(images)
        n_val = int(round(n * cfg.validation_split))
        rng = np.random.RandomState(seed)
        perm = rng.permutation(n)
        val_idx, train_idx = perm[:n_val], perm[n_val:]
        history: Dict[str, List[float]] = {"loss": [], "val_loss": []}

        for epoch in range(epochs):
            t0 = time.time()
            rng.shuffle(train_idx)
            losses = []
            for start in range(0, len(train_idx) - batch_size + 1, batch_size):
                batch = jnp.asarray(images[train_idx[start : start + batch_size]])
                if self.mesh is not None:
                    batch = shard_lib.shard_batch(batch, self.mesh)
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, batch
                )
                losses.append(float(loss))
            train_loss = float(np.mean(losses)) if losses else float("nan")
            if len(val_idx):
                val_loss = float(
                    self._eval_loss(self.params, jnp.asarray(images[val_idx]))
                )
            else:
                val_loss = float("nan")
            history["loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            self.log(
                f"AE epoch {epoch + 1}/{epochs}: loss {train_loss:.5f}, "
                f"val_loss {val_loss:.5f} ({time.time() - t0:.2f}s)"
            )
        return history

    def reconstruct(self, images: np.ndarray, batch_size: int = 64) -> np.ndarray:
        outs = []
        for start in range(0, len(images), batch_size):
            chunk = images[start : start + batch_size]
            n = len(chunk)
            if n < batch_size and start > 0:  # pad tail to avoid a recompile
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], batch_size - n, 0)])
            out = np.asarray(self._apply(self.params, jnp.asarray(chunk)))
            outs.append(out[:n])
        return np.concatenate(outs) if outs else np.zeros_like(images)

    # ---------------------------------------------------------------- persist
    def save(self, directory: str, tag: str = "final"):
        store = CheckpointStore(directory)
        store.save_component("autoencoder", self.params, tag)

    def load(self, directory: str, tag: str = "final"):
        store = CheckpointStore(directory)
        if self.params is None:
            self.init()
        self.params = store.load_component("autoencoder", self.params, tag)
        self.opt_state = self.tx.init(self.params)
        return self.params
