"""Sharding rules: place train state and batches onto the mesh.

Strategy (new design; the reference has no distribution at all):

  * Batches: leading (batch) axis sharded over 'data'.
  * Parameters and optimizer moments: any tensor with >= `min_shard_elems` elements
    is sharded over 'model' along its largest mesh-divisible axis (this catches
    exactly the two dominant dense kernels per encoder/generator and their Adam
    moments); everything else is replicated. Optimizer moments mirror the param
    pytree structure, so one shape-driven rule covers both.
  * The training step is a pure jitted function; computation follows the input
    shardings ("computation follows data"), so XLA derives all-reduces for the
    data axis and all-gathers/reduce-scatters for the model axis automatically.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEFAULT_MIN_SHARD_ELEMS = 1 << 20  # 1M elements (~4 MB fp32)


def leaf_spec(shape, mesh: Mesh, min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS) -> P:
    """PartitionSpec for one array: big tensors sharded on 'model' along the largest
    divisible axis, everything else replicated."""
    model_size = mesh.shape.get("model", 1)
    if model_size <= 1 or not shape or int(np.prod(shape)) < min_shard_elems:
        return P()
    # Largest axis divisible by the model-parallel degree.
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % model_size == 0:
            spec = [None] * len(shape)
            spec[axis] = "model"
            return P(*spec)
    return P()


def state_shardings(state: Any, mesh: Mesh,
                    min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS):
    """Matching pytree of NamedShardings for an arbitrary train-state pytree."""

    def one(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, leaf_spec(shape, mesh, min_shard_elems))

    return jax.tree.map(one, state)


def batch_shardings(batch: Any, mesh: Mesh):
    """Shard the leading axis of every batch leaf over 'data'."""

    def one(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim >= 1:
            return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(one, batch)


def shard_state(state: Any, mesh: Mesh,
                min_shard_elems: int = DEFAULT_MIN_SHARD_ELEMS):
    """device_put the train state according to the rules (one-time placement;
    subsequent jitted steps keep the layout via donation)."""
    return jax.device_put(state, state_shardings(state, mesh, min_shard_elems))


def shard_batch(batch: Any, mesh: Mesh):
    """Place a batch on the mesh's 'data' axis.

    Single-process: a plain device_put of the (globally visible) batch.
    Multi-process (after parallel.initialize_multihost): each process passes its
    LOCAL shard of the batch (see CompressionDataset's process_index /
    process_count fields) and the global array is assembled from the per-process
    pieces without any cross-host data movement."""
    shardings = batch_shardings(batch, mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda leaf, sh: jax.make_array_from_process_local_data(
                sh, np.asarray(leaf)
            ),
            batch,
            shardings,
        )
    return jax.device_put(batch, shardings)
