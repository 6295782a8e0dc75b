"""Distributed execution over a `jax.sharding.Mesh`.

The reference is strictly single-device (SURVEY.md section 0); everything here is
new TPU-native design: a (data, model) mesh, data-parallel batches, tensor-parallel
sharding of the dominant dense kernels, with XLA inserting all collectives.
"""

from contextual_image_compression_tpu.parallel.mesh import create_mesh as create_mesh
from contextual_image_compression_tpu.parallel.mesh import (
    initialize_multihost as initialize_multihost,
)
from contextual_image_compression_tpu.parallel import sharding as sharding
