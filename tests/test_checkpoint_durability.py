"""Checkpoint durability: atomic writes and corrupt-file fallback.

Two failure modes observed in long runs (and absent from the reference, whose
Keras saves can also truncate on crash -- GAN_train.py:547-581):

  * a writer that dies mid-save must never truncate a previously good file
    (save goes to a temp file + atomic rename);
  * a corrupt/truncated 'final' file must fall back to the epoch scan instead
    of crashing resume (extends the reference's 3-level fallback ladder,
    GAN_test.py:37-220, to cover corruption).
"""

import numpy as np
import jax.numpy as jnp

from contextual_image_compression_tpu.checkpoint import CheckpointStore


def _tree(val):
    return {"w": jnp.full((4, 4), val, jnp.float32), "b": jnp.zeros((4,))}


def test_corrupt_final_falls_back_to_epoch_scan(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.save_component("enc", _tree(3.0), "epoch_7")
    # simulate a writer that died after truncating the final file
    with open(store._path("enc", "final"), "wb"):
        pass
    loaded, provenance = store.load_components({"enc": _tree(0.0)})
    assert provenance["enc"] == "epoch_7"
    np.testing.assert_array_equal(np.asarray(loaded["enc"]["w"]), 3.0)


def test_corrupt_epoch_falls_back_to_earlier_epoch(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.save_component("enc", _tree(1.0), "epoch_5")
    with open(store._path("enc", "epoch_10"), "wb") as f:
        f.write(b"\x00garbage")
    loaded, provenance = store.load_components({"enc": _tree(0.0)})
    assert provenance["enc"] == "epoch_5"
    np.testing.assert_array_equal(np.asarray(loaded["enc"]["w"]), 1.0)


def test_save_is_atomic_no_tmp_left_behind(tmp_path):
    store = CheckpointStore(str(tmp_path))
    path = store.save_component("enc", _tree(2.0), "final")
    assert not path.endswith(".tmp")
    assert all(not f.endswith(".tmp") for f in tmp_path.iterdir() for f in [f.name])
    store.save_metadata({"epoch": 3}, "final")
    assert store.load_metadata("final") == {"epoch": 3}
    assert all(not f.name.endswith(".tmp") for f in tmp_path.iterdir())
