"""Pytree helpers."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def param_count(tree: Any) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))


def param_bytes(tree: Any) -> int:
    return sum(int(x.size) * x.dtype.itemsize for x in jax.tree.leaves(tree))


def tree_finite(tree: Any) -> jnp.ndarray:
    """Scalar bool: every leaf everywhere finite. Use inside jitted guards."""
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return jnp.asarray(True)
    return jnp.stack(leaves).all()


def find_nonfinite(tree: Any) -> Dict[str, float]:
    """Host-side debugging: {path: max-abs-nonfinite-count} for offending leaves."""
    bad = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            n = int(jnp.sum(~jnp.isfinite(leaf)))
            if n:
                bad[jax.tree_util.keystr(path)] = n
    return bad


def cast_floats(tree: Any, dtype, skip_keys: tuple = ()) -> Any:
    """Cast floating-point leaves (e.g. fp32 -> bf16 for inference).

    `skip_keys`: leaf key names left untouched -- serving uses it to keep the
    fp32 `w8_scale` rows that quantize_dense_w8 stores next to int8 kernels in
    their documented storage dtype (models/layers.py::KDense).
    """
    def one(path, x):
        if skip_keys and path and getattr(path[-1], "key", None) in skip_keys:
            return x
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(one, tree)
