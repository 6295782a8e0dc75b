"""Host-side input pipeline: image IO, on-device saliency precompute, batching."""

from contextual_image_compression_tpu.data import images as images
from contextual_image_compression_tpu.data import pipeline as pipeline
