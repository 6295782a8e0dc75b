#!/usr/bin/env python
"""Convert public VGG19 weights to the .npz layout used by models/vgg.py.

The training container has no network egress, so ImageNet VGG19 weights must be
brought in as a file. This converter accepts either
  * a keras VGG19 `.h5` (notop) checkpoint, or
  * a torchvision `vgg19*.pth` state dict,
and writes an .npz with keys 'block{i}_conv{j}_kernel' (HWIO) and
'block{i}_conv{j}_bias' that `load_vgg19_features` reads. With the file present,
`TrainConfig.vgg_weights_path` turns the perceptual loss on
(reference semantics: GAN_train.py:168-195).

One-command recipe (first machine WITH egress):

    curl -LO https://download.pytorch.org/models/vgg19-dcbb9e9d.pth
    python scripts/convert_vgg_weights.py vgg19-dcbb9e9d.pth vgg19_imagenet.npz
    python scripts/train_gan.py --data-dir dataset --vgg-weights vgg19_imagenet.npz

Verification performed here, so a bad file fails AT CONVERSION, not mid-run:
  * the source file's sha256 is printed, and for torchvision checkpoints whose
    filename embeds the hash prefix (`vgg19-dcbb9e9d.pth` style, the torch hub
    convention) the prefix is CHECKED against the actual digest;
  * every converted kernel/bias is shape-checked against the VGG19 layout;
  * a deterministic tap-activation fingerprint (per-tap [mean, std] on a fixed
    synthetic batch, models/vgg.py::compute_tap_fingerprint) is computed from
    the converted tower and stored INSIDE the npz -- `load_vgg19_features`
    re-verifies it at every load, so a corrupt/mis-transposed file can never
    silently train.
"""

import argparse
import hashlib
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from contextual_image_compression_tpu.models.vgg import (  # noqa: E402
    _FINGERPRINT_KEY,
    _VGG19_LAYOUT,
    VGG19Features,
    compute_tap_fingerprint,
)


def convert_torch(path: str) -> dict:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    # torchvision vgg19.features: conv indices 0,2, 5,7, 10,12,14,16, 19,... OIHW
    conv_indices = []
    idx = 0
    for _, n_convs in _VGG19_LAYOUT:
        for _ in range(n_convs):
            conv_indices.append(idx)
            idx += 2  # conv, relu
        idx += 1  # maxpool
    out = {}
    flat = list(conv_indices)
    k = 0
    for bi, (_, n_convs) in enumerate(_VGG19_LAYOUT, start=1):
        for ci in range(1, n_convs + 1):
            conv_idx = flat[k]
            k += 1
            w = state[f"features.{conv_idx}.weight"].numpy()  # OIHW
            b = state[f"features.{conv_idx}.bias"].numpy()
            out[f"block{bi}_conv{ci}_kernel"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
            out[f"block{bi}_conv{ci}_bias"] = b
    return out


def convert_keras_h5(path: str) -> dict:
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for bi, (_, n_convs) in enumerate(_VGG19_LAYOUT, start=1):
            for ci in range(1, n_convs + 1):
                name = f"block{bi}_conv{ci}"
                grp = root[name]
                # keras nests one more level: name/name/kernel:0
                inner = grp[name] if name in grp else grp
                out[f"{name}_kernel"] = np.array(inner["kernel:0"])  # already HWIO
                out[f"{name}_bias"] = np.array(inner["bias:0"])
    return out


def check_source_digest(path: str) -> str:
    """sha256 the source; enforce a torch-hub filename hash prefix if present."""
    digest = hashlib.sha256(Path(path).read_bytes()).hexdigest()
    m = re.search(r"-([0-9a-f]{8,64})\.(?:pth|pt)$", Path(path).name)
    if m:
        prefix = m.group(1)
        if not digest.startswith(prefix):
            raise SystemExit(
                f"source {path} sha256 {digest[:16]}... does not start with the "
                f"hash prefix '{prefix}' embedded in its filename -- the "
                "download is corrupt or renamed. Re-download it."
            )
        print(f"source sha256 {digest} (filename prefix '{prefix}' verified)")
    else:
        print(f"source sha256 {digest}")
    return digest


def check_shapes(weights: dict) -> None:
    cin = 3
    for bi, (width, n_convs) in enumerate(_VGG19_LAYOUT, start=1):
        for ci in range(1, n_convs + 1):
            name = f"block{bi}_conv{ci}"
            k, b = weights[f"{name}_kernel"], weights[f"{name}_bias"]
            want = (3, 3, cin, width)
            if tuple(k.shape) != want or tuple(b.shape) != (width,):
                raise SystemExit(
                    f"{name}: kernel {k.shape} / bias {b.shape}, expected "
                    f"{want} / {(width,)} -- not a VGG19 checkpoint?"
                )
            cin = width


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source", help=".h5 (keras) or .pth (torchvision) VGG19 weights")
    p.add_argument("output", help="output .npz path")
    args = p.parse_args()

    check_source_digest(args.source)
    if args.source.endswith((".pth", ".pt")):
        weights = convert_torch(args.source)
    else:
        weights = convert_keras_h5(args.source)
    check_shapes(weights)

    # Fingerprint the converted tower and store it in the file; the loader
    # (models/vgg.py::load_vgg19_features) re-verifies on every load.
    import jax.numpy as jnp

    params = {}
    for bi, (_, n_convs) in enumerate(_VGG19_LAYOUT, start=1):
        for ci in range(1, n_convs + 1):
            name = f"block{bi}_conv{ci}"
            params[name] = {
                "kernel": jnp.asarray(weights[f"{name}_kernel"]),
                "bias": jnp.asarray(weights[f"{name}_bias"]),
            }
    fp = compute_tap_fingerprint(VGG19Features(), {"params": params})
    weights[_FINGERPRINT_KEY] = fp
    print("tap fingerprint [mean, std] per reference tap:")
    for (tap, row) in zip(
        ("block1_conv2", "block2_conv2", "block3_conv4", "block4_conv4",
         "block5_conv4"), fp,
    ):
        print(f"  {tap}: mean {row[0]:.4f}  std {row[1]:.4f}")

    np.savez(args.output, **weights)
    out_digest = hashlib.sha256(Path(args.output).read_bytes()).hexdigest()
    print(f"Wrote {len(weights)} arrays to {args.output} (sha256 {out_digest})")

    # Load-path self-check: exactly what training will do.
    from contextual_image_compression_tpu.models.vgg import load_vgg19_features

    bundle = load_vgg19_features(args.output)
    assert bundle is not None, "loader rejected the file it just verified?"
    print("loader fingerprint re-verification: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
