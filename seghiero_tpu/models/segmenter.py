"""Assembled hierarchical segmenter = backbone + decode head + aux head.

The reference assembles these as three separate nn.Modules in train.py
(:154-173) and infer.py (:253-263); we package them as one Flax module so
a single ``init``/``apply`` covers the whole forward and the parameter
tree has stable top-level keys (``backbone`` / ``head`` / ``aux_head``)
that mirror the reference checkpoint layout for conversion.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from seghiero_tpu.config import ModelConfig, SegHieroConfig
from seghiero_tpu.models.heads import AuxHead, SepASPPContrastHead
from seghiero_tpu.models.registry import (
    backbone_builder,
    head_builder,
    register_backbone,
    register_head,
)
from seghiero_tpu.models.resnet import ResNetBackbone


class HieroSegmenter(nn.Module):
    """forward(images NHWC) → dict with:
      - ``logits``     [B, H/4, W/4, num_classes]  (fine|coarse|super)
      - ``embedding``  [B, H/32, W/32, proj_dim]   L2-normalized
      - ``aux_logits`` [B, H/16, W/16, n_fine]     (when with_aux)

    ``backbone`` / ``head_type`` name builders in
    :mod:`seghiero_tpu.models.registry`; the free-form
    ``backbone_options`` / ``head_options`` mappings are passed through
    to custom builders untouched.
    """

    num_classes: int
    n_fine: int
    backbone: str = "resnet"
    depth: int = 101
    output_stride: int = 32
    stem: str = "conv7"
    head_type: str = "sep_aspp_contrast"
    c1_channels: int = 48
    aspp_channels: int = 512
    dilations: tuple = (1, 12, 24, 36)
    proj_dim: int = 256
    proj_type: str = "convmlp"
    with_aux: bool = True
    dtype: Any = jnp.float32
    # mesh axis name for cross-replica (sync) BatchNorm inside shard_map'd
    # ddp training; None = batch-local statistics
    bn_axis: Any = None
    # free-form option mappings for custom registry builders
    backbone_options: Any = None
    head_options: Any = None
    # gradient checkpointing: recompute the backbone's internal
    # activations in backward (jax.checkpoint via nn.remat) — only its
    # four output feature maps are stored. model.remat in the config.
    remat: bool = False
    # model.depthwise_backend: "xla" | "pallas" for the head's
    # depthwise-separable convs (see ops/pallas/depthwise.py)
    dw_backend: str = "xla"

    def init_sample_hw(self) -> tuple:
        """Smallest input the assembled model can trace. Param shapes are
        input-size-independent for every family, so state init uses a
        tiny sample — but windowed-attention backbones need the
        stride-32 map to be at least one window."""
        if self.backbone == "swin":
            w = int((self.backbone_options or {}).get("window", 7))
            return (32 * w, 32 * w)
        return (64, 64)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        bb = backbone_builder(self.backbone)(self)
        if self.remat:
            # lifted jax.checkpoint over the backbone apply; `train` is
            # trace-static. Exact same math — XLA re-runs the backbone
            # forward inside the backward pass instead of keeping its
            # activations live across the loss computation.
            feats = nn.remat(
                lambda mdl, x, t: mdl(x, t), static_argnums=(2,)
            )(bb, images, train)
        else:
            feats = bb(images, train)
        logits, embedding = head_builder(self.head_type)(self)(feats, train)
        out = {"logits": logits, "embedding": embedding}
        if self.with_aux:
            out["aux_logits"] = AuxHead(
                self.n_fine, dtype=self.dtype, bn_axis=self.bn_axis, name="aux_head"
            )(feats[2], train)
        return out


@register_backbone("resnet")
def _build_resnet(seg: "HieroSegmenter") -> nn.Module:
    return ResNetBackbone(
        seg.depth,
        seg.output_stride,
        stem=seg.stem,
        dtype=seg.dtype,
        bn_axis=seg.bn_axis,
        name="backbone",
    )


@register_backbone("convnext")
def _build_convnext(seg: "HieroSegmenter") -> nn.Module:
    from seghiero_tpu.models.convnext import ConvNeXtBackbone

    opts = dict(seg.backbone_options or {})
    return ConvNeXtBackbone(
        variant=str(opts.get("variant", "tiny")),
        output_stride=seg.output_stride,
        drop_path_rate=float(opts.get("drop_path_rate", 0.0)),
        layer_scale_init=float(opts.get("layer_scale_init", 1e-6)),
        dtype=seg.dtype,
        name="backbone",
    )


@register_backbone("hrnet")
def _build_hrnet(seg: "HieroSegmenter") -> nn.Module:
    from seghiero_tpu.models.hrnet import HRNetBackbone

    opts = dict(seg.backbone_options or {})
    return HRNetBackbone(
        variant=str(opts.get("variant", "w18")),
        fuse_upsample=str(opts.get("fuse_upsample", "nearest")),
        output_stride=seg.output_stride,
        dtype=seg.dtype,
        bn_axis=seg.bn_axis,
        name="backbone",
    )


@register_backbone("unet")
def _build_unet(seg: "HieroSegmenter") -> nn.Module:
    from seghiero_tpu.models.unet import UNetBackbone

    opts = dict(seg.backbone_options or {})
    return UNetBackbone(
        base_width=int(opts.get("base_width", 32)),
        max_width=int(opts.get("max_width", 512)),
        output_stride=seg.output_stride,
        dtype=seg.dtype,
        bn_axis=seg.bn_axis,
        name="backbone",
    )


@register_backbone("mit")
def _build_mit(seg: "HieroSegmenter") -> nn.Module:
    from seghiero_tpu.models.mit import MiTBackbone

    opts = dict(seg.backbone_options or {})
    return MiTBackbone(
        variant=str(opts.get("variant", "b0")),
        drop_path_rate=float(opts.get("drop_path_rate", 0.0)),
        output_stride=seg.output_stride,
        dtype=seg.dtype,
        name="backbone",
    )


@register_backbone("vit")
def _build_vit(seg: "HieroSegmenter") -> nn.Module:
    from seghiero_tpu.models.vit import ViTBackbone

    opts = dict(seg.backbone_options or {})
    return ViTBackbone(
        variant=str(opts.get("variant", "base")),
        patch=int(opts.get("patch", 16)),
        pos_grid=int(opts.get("pos_grid", 0)),
        drop_path_rate=float(opts.get("drop_path_rate", 0.0)),
        layer_scale_init=float(opts.get("layer_scale_init", 0.0)),
        n_register=int(opts.get("n_register", 0)),
        norm_eps=float(opts.get("norm_eps", 1e-6)),
        output_stride=seg.output_stride,
        dtype=seg.dtype,
        name="backbone",
    )


@register_backbone("swin")
def _build_swin(seg: "HieroSegmenter") -> nn.Module:
    from seghiero_tpu.models.swin import SwinBackbone

    opts = dict(seg.backbone_options or {})
    return SwinBackbone(
        variant=str(opts.get("variant", "tiny")),
        window=int(opts.get("window", 7)),
        drop_path_rate=float(opts.get("drop_path_rate", 0.0)),
        output_stride=seg.output_stride,
        dtype=seg.dtype,
        name="backbone",
    )


@register_head("sep_aspp_contrast")
def _build_sep_aspp_contrast(seg: "HieroSegmenter") -> nn.Module:
    return SepASPPContrastHead(
        num_classes=seg.num_classes,
        c1_channels=seg.c1_channels,
        aspp_channels=seg.aspp_channels,
        dilations=tuple(seg.dilations),
        proj_dim=seg.proj_dim,
        proj_type=seg.proj_type,
        dtype=seg.dtype,
        bn_axis=seg.bn_axis,
        dw_pallas=seg.dw_backend == "pallas",
        name="head",
    )


@register_head("aspp")
def _build_aspp(seg: "HieroSegmenter") -> nn.Module:
    from seghiero_tpu.models.decode_heads import ASPPHead

    return ASPPHead(
        num_classes=seg.num_classes,
        channels=seg.aspp_channels,
        dilations=tuple(seg.dilations),
        with_projection=True,  # triplet loss needs an embedding
        proj_dim=seg.proj_dim,
        proj_type=seg.proj_type,
        dtype=seg.dtype,
        bn_axis=seg.bn_axis,
        name="head",
    )


@register_head("segformer_mlp")
def _build_segformer_mlp(seg: "HieroSegmenter") -> nn.Module:
    from seghiero_tpu.models.decode_heads import SegFormerMLPHead

    opts = dict(seg.head_options or {})
    return SegFormerMLPHead(
        num_classes=seg.num_classes,
        channels=int(opts.get("channels", 256)),
        dropout_rate=float(opts.get("dropout_rate", 0.1)),
        with_projection=True,  # triplet loss needs an embedding
        proj_dim=seg.proj_dim,
        proj_type=seg.proj_type,
        dtype=seg.dtype,
        bn_axis=seg.bn_axis,
        name="head",
    )


@register_head("upernet")
def _build_upernet(seg: "HieroSegmenter") -> nn.Module:
    from seghiero_tpu.models.decode_heads import UPerNetHead

    opts = dict(seg.head_options or {})
    return UPerNetHead(
        num_classes=seg.num_classes,
        channels=int(opts.get("channels", 512)),
        pool_scales=tuple(opts.get("pool_scales", (1, 2, 3, 6))),
        dropout_rate=float(opts.get("dropout_rate", 0.1)),
        with_projection=True,  # triplet loss needs an embedding
        proj_dim=seg.proj_dim,
        proj_type=seg.proj_type,
        dtype=seg.dtype,
        bn_axis=seg.bn_axis,
        name="head",
    )


def build_model(
    cfg: SegHieroConfig, with_aux: bool = True, bn_axis: Any = None
) -> HieroSegmenter:
    """Model from a validated config (mirrors train.py:154-173 defaults).

    ``bn_axis``: mesh axis for sync-BN — only meaningful for apply calls
    inside a ``shard_map`` over that axis (trainer ddp mode)."""
    m: ModelConfig = cfg.model
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[m.dtype]
    return HieroSegmenter(
        num_classes=cfg.hierarchy.total_classes,
        n_fine=cfg.hierarchy.n_fine,
        backbone=m.backbone,
        depth=m.depth,
        output_stride=m.output_stride,
        stem=m.stem,
        head_type=m.head,
        c1_channels=m.c1_channels,
        aspp_channels=m.aspp_channels,
        dilations=tuple(m.dilations),
        proj_dim=m.proj_dim,
        proj_type=m.proj_type,
        with_aux=with_aux,
        dtype=dtype,
        bn_axis=bn_axis,
        backbone_options=m.backbone_options,
        head_options=m.head_options,
        remat=m.remat,
        dw_backend=m.depthwise_backend,
    )
