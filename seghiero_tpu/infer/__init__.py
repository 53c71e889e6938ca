from seghiero_tpu.infer.predictor import Predictor
from seghiero_tpu.infer.viz import (
    create_colormap,
    mask_to_color_image,
    draw_class_indices,
    save_mask,
)

__all__ = [
    "Predictor",
    "create_colormap",
    "mask_to_color_image",
    "draw_class_indices",
    "save_mask",
]
