"""VGG19 feature extractor for the perceptual loss (reference: GAN_train.py:168-195).

The reference taps block{1,2}_conv2 and block{3,4,5}_conv4 of an ImageNet-pretrained
VGG19 with layer weights [0.1, 0.1, 0.2, 0.3, 0.3], feeding z-score-normalized MSE
per layer (GAN_train.py:256-287). Inputs go through keras' caffe-style
preprocess_input: [-1,1] -> [0,255] -> RGB->BGR -> subtract ImageNet BGR means
(GAN_train.py:258-263).

This container has no network egress and no bundled ImageNet weights, so we mirror
the reference's own fallback contract (GAN_train.py:187-195: VGG load failure =>
perceptual loss disabled): `load_vgg19_features` returns None unless a weights file
is available at `weights_path` (a .npz of conv kernels/biases, convertible from any
public VGG19 checkpoint with scripts/convert_vgg_weights.py). Training code treats
None exactly like the reference's `use_perceptual_loss = False`.
"""

from __future__ import annotations

import os
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# (block, conv-in-block) counts for VGG19 features.
_VGG19_LAYOUT = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))
# Reference taps: block1_conv2, block2_conv2, block3_conv4, block4_conv4, block5_conv4
_TAPS = ((1, 2), (2, 2), (3, 4), (4, 4), (5, 4))

_BGR_MEAN = np.array([103.939, 116.779, 123.68], dtype=np.float32)


def preprocess_caffe(img_minus1_1: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] RGB -> caffe-style VGG input (BGR, mean-subtracted)
    (reference: GAN_train.py:258-263 + keras preprocess_input)."""
    x = (img_minus1_1 + 1.0) * 127.5
    x = x[..., ::-1]  # RGB -> BGR
    return x - jnp.asarray(_BGR_MEAN)


class VGG19Features(nn.Module):
    """VGG19 conv tower returning the five reference tap activations."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        for bi, (width, n_convs) in enumerate(_VGG19_LAYOUT, start=1):
            for ci in range(1, n_convs + 1):
                x = nn.Conv(
                    width,
                    (3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"block{bi}_conv{ci}",
                )(x)
                x = nn.relu(x)
                if (bi, ci) in _TAPS:
                    taps.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def load_vgg19_params(weights_path: str) -> Optional[dict]:
    """Load VGG19 conv weights from an .npz with keys 'block{i}_conv{j}_kernel' (HWIO)
    and 'block{i}_conv{j}_bias'. Returns a flax params dict, or None if missing."""
    if not weights_path or not os.path.exists(weights_path):
        return None
    data = np.load(weights_path)
    params = {}
    for bi, (width, n_convs) in enumerate(_VGG19_LAYOUT, start=1):
        for ci in range(1, n_convs + 1):
            name = f"block{bi}_conv{ci}"
            kkey, bkey = f"{name}_kernel", f"{name}_bias"
            if kkey not in data or bkey not in data:
                return None
            params[name] = {
                "kernel": jnp.asarray(data[kkey]),
                "bias": jnp.asarray(data[bkey]),
            }
    return {"params": params}


# ---------------------------------------------------------------- fingerprint
# Deterministic self-check carried INSIDE the weights file: the converter
# (scripts/convert_vgg_weights.py) runs a fixed synthetic batch through the
# five reference taps of the freshly-converted tower and stores each tap's
# [mean, std] as the npz key 'fingerprint' (shape (5, 2)). The loader then
# recomputes the same statistics at load time and refuses a file whose
# activations drifted -- catching a wrong kernel transpose, a truncated
# download, bit rot, or a mismatched source architecture, none of which the
# shape check above can see.

_FINGERPRINT_KEY = "fingerprint"
_FINGERPRINT_SEED = 20260819
_FINGERPRINT_SHAPE = (2, 64, 64, 3)


def _fingerprint_batch() -> jnp.ndarray:
    rs = np.random.RandomState(_FINGERPRINT_SEED)
    x = rs.rand(*_FINGERPRINT_SHAPE).astype(np.float32) * 2.0 - 1.0
    return jnp.asarray(x)


def compute_tap_fingerprint(module: "VGG19Features", variables: dict) -> np.ndarray:
    """(5, 2) float32 of per-tap [mean, std] activations on the fixed batch
    (caffe-preprocessed, like every training-time call)."""
    taps = module.apply(variables, preprocess_caffe(_fingerprint_batch()))
    return np.array(
        [[float(jnp.mean(t)), float(jnp.std(t))] for t in taps], np.float32
    )


def verify_tap_fingerprint(
    module: "VGG19Features", variables: dict, expected: np.ndarray,
    rtol: float = 2e-2,
) -> None:
    """Raise ValueError if the tower's tap statistics do not reproduce
    `expected` within rtol (loose enough for CPU-vs-TPU f32 accumulation
    differences; orders of magnitude tighter than any layout error)."""
    got = compute_tap_fingerprint(module, variables)
    expected = np.asarray(expected, np.float32)
    if expected.shape != got.shape:
        raise ValueError(
            f"VGG19 fingerprint shape {expected.shape} != {got.shape}"
        )
    denom = np.maximum(np.abs(expected), 1e-3)
    rel = np.abs(got - expected) / denom
    if not np.all(rel <= rtol):
        worst = float(rel.max())
        raise ValueError(
            "VGG19 weights failed their stored activation fingerprint "
            f"(max rel error {worst:.3g} > {rtol}): the file is corrupt, "
            "mis-converted, or from a different architecture. Re-run "
            "scripts/convert_vgg_weights.py on a fresh source checkpoint."
        )


def load_vgg19_features(weights_path: str):
    """Returns (module, variables) or None (=> perceptual loss disabled, mirroring the
    reference's fallback at GAN_train.py:187-195).

    weights_path accepts:
      * a path to an .npz from scripts/convert_vgg_weights.py (ImageNet weights);
      * 'random' or 'random:<seed>' -- a fixed-seed randomly-initialized VGG19.
        Random conv features are a usable perceptual metric when pretrained
        weights are unavailable (no-egress environments): the z-scored multi-layer
        MSE of the reference's loss (GAN_train.py:256-287) only needs a fixed,
        structure-rich feature basis, and random VGG features are an established
        substitute (cf. 'A Powerful Generative Model Using Random Weights',
        He et al. 2016). Clearly NOT ImageNet-equivalent; opt-in via
        --vgg-weights random.
    """
    if weights_path and weights_path.split(":", 1)[0] == "random":
        import jax

        seed = int(weights_path.split(":", 1)[1]) if ":" in weights_path else 0
        module = VGG19Features()
        dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = module.init(jax.random.PRNGKey(seed), dummy)
        return module, variables
    variables = load_vgg19_params(weights_path)
    if variables is None:
        return None
    module = VGG19Features()
    data = np.load(weights_path)
    if _FINGERPRINT_KEY in data:
        verify_tap_fingerprint(module, variables, data[_FINGERPRINT_KEY])
    return module, variables
