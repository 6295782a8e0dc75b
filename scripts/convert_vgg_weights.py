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
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from contextual_image_compression_tpu.models.vgg import _VGG19_LAYOUT  # noqa: E402


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


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source", help=".h5 (keras) or .pth (torchvision) VGG19 weights")
    p.add_argument("output", help="output .npz path")
    args = p.parse_args()

    if args.source.endswith((".pth", ".pt")):
        weights = convert_torch(args.source)
    else:
        weights = convert_keras_h5(args.source)
    np.savez(args.output, **weights)
    print(f"Wrote {len(weights)} arrays to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
