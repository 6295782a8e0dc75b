"""Component-addressable checkpointing with latest-epoch fallback."""

from contextual_image_compression_tpu.checkpoint.store import (
    CheckpointStore as CheckpointStore,
)
