from seghiero_tpu.models.resnet import ResNetBackbone
from seghiero_tpu.models.heads import (
    ProjectionHead,
    DepthwiseSeparableConv,
    DepthwiseSeparableASPP,
    SepASPPContrastHead,
    AuxHead,
)
from seghiero_tpu.models.segmenter import HieroSegmenter, build_model

__all__ = [
    "ResNetBackbone",
    "ProjectionHead",
    "DepthwiseSeparableConv",
    "DepthwiseSeparableASPP",
    "SepASPPContrastHead",
    "AuxHead",
    "HieroSegmenter",
    "build_model",
]
