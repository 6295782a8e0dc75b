"""Multi-host entry point (parallel.initialize_multihost + DCN-aware mesh +
per-process data sharding).

The reference is single-process/single-device (GAN_train.py:38-47), so this tier
is new design. Real pods aren't available here; coverage is (a) the single-process
degenerate case and device-order contract on the 8-virtual-device CPU mesh, and
(b) a REAL 2-process jax.distributed rehearsal over CPU subprocesses exercising
initialize_multihost, the process-spanning mesh, per-host dataset shards, and
`shard_batch`'s make_array_from_process_local_data path.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from contextual_image_compression_tpu.data.pipeline import CompressionDataset
from contextual_image_compression_tpu.parallel import create_mesh

REPO = Path(__file__).resolve().parent.parent


class _FakeDevice:
    def __init__(self, pid, did):
        self.process_index = pid
        self.id = did


def test_mesh_device_order_contract(eight_devices):
    """Devices are ordered by (process_index, id); contiguous runs form model
    groups. Single-process: row-major by device id."""
    mesh = create_mesh(model_parallel=2, multihost=True)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert ids.tolist() == [[0, 1], [2, 3], [4, 5], [6, 7]]


def test_mesh_multihost_rejects_dcn_straddling_model_axis():
    """model_parallel that doesn't divide a host's local device count would put
    the model (activation-traffic) axis on DCN -- must be rejected."""
    fakes = [_FakeDevice(pid, pid * 4 + i) for pid in range(2) for i in range(4)]
    with pytest.raises(ValueError, match="straddle"):
        create_mesh(model_parallel=8, devices=fakes, multihost=True)


def test_dataset_process_shards_partition_corpus():
    rng = np.random.RandomState(0)
    images = rng.rand(12, 8, 8, 3).astype(np.float32)
    masks = rng.rand(12, 8, 8, 1).astype(np.float32)
    shards = [
        CompressionDataset(
            images, masks, batch_size=8, process_index=i, process_count=2, seed=5
        )
        for i in range(2)
    ]
    # disjoint strided shards covering the corpus
    assert len(shards[0]) == len(shards[1]) == 6
    np.testing.assert_array_equal(shards[0].images, images[0::2])
    np.testing.assert_array_equal(shards[1].images, images[1::2])
    # local batches of global/process_count samples
    b0 = next(shards[0].epoch(shuffle=False))
    assert b0.image.shape[0] == 4
    # per-process RNG streams differ
    e0 = next(shards[0].epoch(shuffle=True))
    e1 = next(shards[1].epoch(shuffle=True))
    assert not np.array_equal(np.asarray(e0.bpp), np.asarray(e1.bpp))
    # a with_target_bpp view must NOT re-slice the already-local shard
    view = shards[0].with_target_bpp(0.1)
    assert len(view) == 6 and view.batch_size == 4
    assert np.all(np.asarray(next(view.epoch()).bpp) == np.float32(0.1))


def test_dataset_process_shard_validation():
    images = np.zeros((4, 8, 8, 3), np.float32)
    masks = np.zeros((4, 8, 8, 1), np.float32)
    with pytest.raises(ValueError, match="divisible"):
        CompressionDataset(images, masks, batch_size=9, process_count=2)
    with pytest.raises(ValueError, match="out of range"):
        CompressionDataset(
            images, masks, batch_size=8, process_index=2, process_count=2
        )


_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, {repo!r})
from contextual_image_compression_tpu.parallel import (
    create_mesh, initialize_multihost, sharding,
)
from contextual_image_compression_tpu.data.pipeline import CompressionDataset
from contextual_image_compression_tpu.train.gan_trainer import Batch

pid = int(sys.argv[1])
idx, count = initialize_multihost(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid
)
assert (idx, count) == (pid, 2), (idx, count)
# second call is an idempotent no-op
assert initialize_multihost(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid
) == (pid, 2)
assert jax.device_count() == 8 and jax.local_device_count() == 4

mesh = create_mesh(model_parallel=2, multihost=True)
assert dict(mesh.shape) == {{"data": 4, "model": 2}}
# model groups never straddle processes
for row in mesh.devices:
    assert len({{d.process_index for d in row}}) == 1

rng = np.random.RandomState(0)  # same global corpus on both hosts
images = (rng.rand(16, 8, 8, 3).astype(np.float32)) * 2 - 1
masks = rng.rand(16, 8, 8, 1).astype(np.float32)
ds = CompressionDataset(
    images, masks, batch_size=8, process_index=pid, process_count=2, seed=3
)
local = next(ds.epoch(shuffle=False))
assert local.image.shape[0] == 4

gbatch = sharding.shard_batch(local, mesh)
assert gbatch.image.shape == (8, 8, 8, 3), gbatch.image.shape  # GLOBAL batch

# a jitted global computation over the process-spanning mesh
total = jax.jit(lambda b: (b.image.sum(), b.bpp.sum()))(gbatch)
want_img = images[0::2][:4].sum() + images[1::2][:4].sum()
np.testing.assert_allclose(float(total[0]), want_img, rtol=1e-5)
print("WORKER_OK", pid, float(total[0]))
"""


@pytest.mark.parametrize("port", [29517])
def test_two_process_cpu_rehearsal(port, tmp_path):
    """Spawn 2 real jax.distributed processes over CPU: the full multi-host
    bring-up path (initialize -> global mesh -> per-host data shard ->
    make_array_from_process_local_data -> jitted global reduction)."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=str(REPO), port=port))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out
