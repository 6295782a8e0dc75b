"""Optax optimizers with keras-Adam semantics.

The reference uses keras Adam(lr, clipnorm=1.0) x4 (reference: GAN_train.py:157-160).
Keras `clipnorm` clips EACH gradient tensor to the given L2 norm independently
(not the global norm), so we provide a per-leaf clip transform; keras' Adam epsilon
is 1e-7 (optax default 1e-8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_per_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """Per-variable L2 norm clipping, keras `clipnorm` semantics."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def keras_adam(
    learning_rate: float,
    clipnorm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
) -> optax.GradientTransformation:
    """Adam with keras defaults + per-variable clipnorm (reference: GAN_train.py:157-160)."""
    return optax.chain(
        clip_per_leaf_norm(clipnorm),
        optax.adam(learning_rate, b1=b1, b2=b2, eps=eps),
    )
