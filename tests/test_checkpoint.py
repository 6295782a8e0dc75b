"""Checkpoint store: component addressing, fallback ladder, resume
(reference semantics: GAN_train.py:547-581, GAN_test.py:37-220)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contextual_image_compression_tpu.checkpoint import CheckpointStore


@pytest.fixture
def tree():
    return {
        "params": {
            "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
        }
    }


def test_save_load_roundtrip(tmp_path, tree):
    store = CheckpointStore(str(tmp_path))
    store.save_component("hq_encoder", tree, "final")
    template = jax.tree.map(jnp.zeros_like, tree)
    loaded = store.load_component("hq_encoder", template, "final")
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["dense"]["kernel"]), 1.0
    )


def test_epoch_scan(tmp_path, tree):
    store = CheckpointStore(str(tmp_path))
    for epoch in (5, 10, 15):
        store.save_component("hq_encoder", tree, f"epoch_{epoch}")
    assert store.available_epochs("hq_encoder") == [5, 10, 15]


def test_fallback_ladder(tmp_path, tree):
    """final -> latest epoch -> init, per component."""
    store = CheckpointStore(str(tmp_path))
    two = jax.tree.map(lambda x: x * 2, tree)
    three = jax.tree.map(lambda x: x * 3, tree)
    store.save_component("a", tree, "final")       # a: from final
    store.save_component("b", two, "epoch_5")      # b: from epoch scan
    store.save_component("b", three, "epoch_10")   # latest wins
    templates = {
        "a": jax.tree.map(jnp.zeros_like, tree),
        "b": jax.tree.map(jnp.zeros_like, tree),
        "c": jax.tree.map(lambda x: x * -1, tree),  # c: missing -> template kept
    }
    loaded, provenance = store.load_components(templates)
    assert provenance == {"a": "final", "b": "epoch_10", "c": "init"}
    np.testing.assert_array_equal(np.asarray(loaded["a"]["params"]["dense"]["kernel"]), 1.0)
    np.testing.assert_array_equal(np.asarray(loaded["b"]["params"]["dense"]["kernel"]), 3.0)
    np.testing.assert_array_equal(np.asarray(loaded["c"]["params"]["dense"]["kernel"]), -1.0)


def test_metadata(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.save_metadata({"epoch": 7, "history": {"g_loss": [1.0, 0.5]}}, "epoch_7")
    assert store.latest_metadata()["epoch"] == 7
    store.save_metadata({"epoch": 20}, "final")
    assert store.latest_metadata()["epoch"] == 20
