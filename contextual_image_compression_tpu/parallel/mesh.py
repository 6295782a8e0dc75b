"""Device mesh construction (single-host and multi-host).

Axes:
  'data'  -- batch parallelism: the batch dimension of every input is sharded here;
             gradient all-reduce rides this axis (XLA-inserted psum over ICI, or
             DCN between slices).
  'model' -- tensor parallelism for the dominant parameter blocks (the encoder
             latent Dense of 16*16*512 x 2048 and the generator fc of
             latent x 16*16*512 -- ~400M combined params at reference scale).

On a multi-slice deployment, put 'data' on the DCN (slower, gradient-sized traffic
once per step) and keep 'model' inside a slice (activation-sized traffic per layer,
needs ICI). `create_mesh` orders the global device list by (process_index, id) and
assigns contiguous devices to 'model', so model groups never straddle a host;
`multihost=True` additionally *enforces* that invariant.

Multi-host bring-up (a from-scratch design -- the reference is single-process,
single-device, GAN_train.py:38-47):

    from contextual_image_compression_tpu.parallel import initialize_multihost, create_mesh
    initialize_multihost()                      # on TPU pods: auto-discovers peers
    mesh = create_mesh(model_parallel=4, multihost=True)

Each process then feeds its local shard of every batch
(`CompressionDataset(process_index=..., process_count=...)`), and
`sharding.shard_batch` assembles the global array via
`jax.make_array_from_process_local_data` when more than one process is present.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> Tuple[int, int]:
    """Bring up the JAX distributed runtime so `jax.devices()` spans every host.

    On TPU pod slices all arguments are auto-discovered from the metadata server
    and may be omitted; elsewhere (or for CPU-based rehearsal of the multi-process
    pattern) pass coordinator_address/num_processes/process_id explicitly.
    Idempotent: a second call is a no-op. Returns (process_index, process_count).
    """
    if _distributed_client_active():
        return jax.process_index(), jax.process_count()
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def _distributed_client_active() -> bool:
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:
        return False


def create_mesh(
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    multihost: bool = False,
) -> Mesh:
    """(data, model) mesh over `devices` (default: all global devices).

    Devices are ordered by (process_index, id) and contiguous runs of
    `model_parallel` devices form the model groups, so with per-host device
    counts divisible by `model_parallel` the model axis stays on one host's
    ICI. `multihost=True` asserts that invariant instead of silently building
    a DCN-crossing model axis.
    """
    devices = list(devices) if devices is not None else jax.devices()
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    n = len(devices)
    m = max(1, model_parallel)
    if n % m != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={m}")
    if multihost:
        per_process: dict = {}
        for d in devices:
            per_process[d.process_index] = per_process.get(d.process_index, 0) + 1
        for pi, cnt in per_process.items():
            if cnt % m != 0:
                raise ValueError(
                    f"model_parallel={m} does not divide process {pi}'s "
                    f"{cnt} local devices -- the model axis would straddle "
                    "hosts (DCN); use a divisor of the per-host device count"
                )
    arr = np.array(devices).reshape(n // m, m)
    return Mesh(arr, ("data", "model"))
