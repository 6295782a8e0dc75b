"""Device mesh construction.

Axes:
  'data'  -- batch parallelism: the batch dimension of every input is sharded here;
             gradient all-reduce rides this axis (XLA-inserted psum over ICI).
  'model' -- tensor parallelism for the dominant parameter blocks (the encoder
             latent Dense of 16*16*512 x 2048 and the generator fc of
             latent x 16*16*512 -- ~400M combined params at reference scale).

On a multi-slice deployment, put 'data' on the DCN (slower, gradient-sized traffic
once per step) and keep 'model' inside a slice (activation-sized traffic per layer,
needs ICI); `create_mesh` orders axes so contiguous devices land on 'model'.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    model_parallel: int = 1, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    m = max(1, model_parallel)
    if n % m != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={m}")
    arr = np.array(devices).reshape(n // m, m)
    return Mesh(arr, ("data", "model"))
