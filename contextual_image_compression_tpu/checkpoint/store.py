"""Component-addressable checkpoint store.

Reproduces the reference's checkpoint semantics on a pytree substrate:

  * every component is saved as its own artifact -- the reference writes 9 .h5 files
    per save point (GAN_train.py:547-581): adaptive model (implicit here: it IS the
    components), discriminator, 6 sub-models, rd_optimizer;
  * save points at every Nth epoch plus '_final' (reference: GAN_train.py:548);
  * loading falls back: final -> latest '_epoch_N' scan -> rebuild missing
    components from fresh init (reference: GAN_test.py:37-220's 3-level fallback);
  * unlike the reference (which drops optimizer state entirely -- SURVEY.md
    section 5), full train state (4 optimizer states + step) is saved too, making
    resume-training possible.

Serialization is flax msgpack (host-side bytes); restored leaves are placed back on
device by the caller's sharding rules, so checkpoints written on an N-chip mesh
restore onto any other mesh.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import flax.serialization
import jax
import numpy as np

_EPOCH_RE = re.compile(r"^(?P<name>.+)_epoch_(?P<epoch>\d+)\.msgpack$")


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointStore:
    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    # ------------------------------------------------------------------ paths
    def _path(self, name: str, tag: str) -> str:
        return os.path.join(self.directory, f"{name}_{tag}.msgpack")

    def available_epochs(self, name: str = "hq_encoder") -> List[int]:
        """Scan for saved epochs of a component (reference: GAN_test.py:84-95 scans
        hq_encoder files)."""
        epochs = []
        if not os.path.isdir(self.directory):
            return epochs
        for f in os.listdir(self.directory):
            m = _EPOCH_RE.match(f)
            if m and m.group("name") == name:
                epochs.append(int(m.group("epoch")))
        return sorted(epochs)

    # ------------------------------------------------------------------- save
    def save_component(self, name: str, tree: Any, tag: str) -> str:
        """Atomic write: serialize to a temp file, then rename over the target.
        A writer that dies mid-save (OOM during the device->host transfer was
        observed) must never truncate a previously good checkpoint."""
        path = self._path(name, tag)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(flax.serialization.to_bytes(_to_host(tree)))
        os.replace(tmp, path)
        return path

    def save_components(self, components: Dict[str, Any], tag: str) -> None:
        for name, tree in components.items():
            self.save_component(name, tree, tag)

    def save_metadata(self, meta: Dict[str, Any], tag: str) -> None:
        path = os.path.join(self.directory, f"metadata_{tag}.json")
        with open(path + ".tmp", "w") as f:
            json.dump(meta, f)
        os.replace(path + ".tmp", path)

    # ------------------------------------------------------------------- load
    def load_component(self, name: str, template: Any, tag: str) -> Any:
        path = self._path(name, tag)
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(template, f.read())

    def has(self, name: str, tag: str) -> bool:
        return os.path.exists(self._path(name, tag))

    def load_components(
        self,
        templates: Dict[str, Any],
        prefer_tag: str = "final",
    ) -> Tuple[Dict[str, Any], Dict[str, str]]:
        """Load every component with the reference's fallback ladder:
        prefer_tag (default 'final') -> latest epoch save -> keep template (fresh
        init), recording the provenance of each component.

        Returns (components, provenance) where provenance[name] is 'final',
        'epoch_N', or 'init'.
        """
        out: Dict[str, Any] = {}
        provenance: Dict[str, str] = {}
        for name, template in templates.items():
            if self.has(name, prefer_tag):
                try:
                    out[name] = self.load_component(name, template, prefer_tag)
                    provenance[name] = prefer_tag
                    continue
                except Exception as e:  # corrupted file: fall through to scan
                    print(f"Failed to load {name} at {prefer_tag}: {e}")
            epochs = self.available_epochs(name)
            loaded = False
            for epoch in reversed(epochs):
                tag = f"epoch_{epoch}"
                try:
                    out[name] = self.load_component(name, template, tag)
                    provenance[name] = tag
                    loaded = True
                    break
                except Exception as e:  # corrupted file: keep scanning back
                    print(f"Failed to load {name} at {tag}: {e}")
            if not loaded:
                out[name] = template
                provenance[name] = "init"
        return out, provenance

    def load_metadata(self, tag: str) -> Optional[Dict[str, Any]]:
        path = os.path.join(self.directory, f"metadata_{tag}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def latest_metadata(self) -> Optional[Dict[str, Any]]:
        if (m := self.load_metadata("final")) is not None:
            return m
        epochs = sorted(
            int(f.split("_epoch_")[1].split(".json")[0])
            for f in os.listdir(self.directory)
            if f.startswith("metadata_epoch_") and f.endswith(".json")
        )
        if epochs:
            return self.load_metadata(f"epoch_{epochs[-1]}")
        return None
