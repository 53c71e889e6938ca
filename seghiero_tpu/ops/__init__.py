from seghiero_tpu.ops.resize import (
    resize_bilinear,
    downsample_labels_nearest,
    half_size,
)

__all__ = ["resize_bilinear", "downsample_labels_nearest", "half_size"]
