"""On-device image/compute ops: filters, saliency, masks, metrics, quantization,
attention, blending and the DCT baseline codec.

Everything here is pure-functional jnp (jit/vmap/grad-compatible); the hot fused ops
additionally have Pallas TPU kernels with automatic jnp fallback off-TPU.
"""

from contextual_image_compression_tpu.ops import image_ops as image_ops
from contextual_image_compression_tpu.ops import metrics as metrics
from contextual_image_compression_tpu.ops import saliency as saliency
from contextual_image_compression_tpu.ops import masks as masks
from contextual_image_compression_tpu.ops import quantize as quantize
