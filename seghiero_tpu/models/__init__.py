from seghiero_tpu.models.resnet import ResNetBackbone
from seghiero_tpu.models.convnext import ConvNeXtBackbone
from seghiero_tpu.models.hrnet import HRNetBackbone
from seghiero_tpu.models.unet import UNetBackbone
from seghiero_tpu.models.mit import MiTBackbone
from seghiero_tpu.models.swin import SwinBackbone
from seghiero_tpu.models.vit import ViTBackbone
from seghiero_tpu.models.heads import (
    ProjectionHead,
    DepthwiseSeparableConv,
    DepthwiseSeparableASPP,
    SepASPPContrastHead,
    AuxHead,
)
from seghiero_tpu.models.segmenter import HieroSegmenter, build_model
from seghiero_tpu.models.registry import (
    register_backbone,
    register_head,
    list_backbones,
    list_heads,
)

__all__ = [
    "register_backbone",
    "register_head",
    "list_backbones",
    "list_heads",
    "ResNetBackbone",
    "ConvNeXtBackbone",
    "HRNetBackbone",
    "UNetBackbone",
    "MiTBackbone",
    "SwinBackbone",
    "ViTBackbone",
    "ProjectionHead",
    "DepthwiseSeparableConv",
    "DepthwiseSeparableASPP",
    "SepASPPContrastHead",
    "AuxHead",
    "HieroSegmenter",
    "build_model",
]
