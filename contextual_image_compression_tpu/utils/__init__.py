"""Utilities: pytree helpers, profiling/tracing, NaN guards."""

from contextual_image_compression_tpu.utils import profiling as profiling
from contextual_image_compression_tpu.utils import tree as tree
