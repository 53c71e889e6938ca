"""HRNet backbone family (NHWC, TPU-native) — a third backbone for the
plug-in registry.

The reference documents swapping its ResNet for "``UNet`` or ``HRNet``"
as an edit-the-code exercise (README.md:319-328: "replace
``ResNetBackbone`` in train.py (lines 115-118) with ``UNet`` or
``HRNet``"). This module is the HRNet half of that promise as a
first-class family:

    model:
      backbone: hrnet
      backbone_options: {variant: w18}

Architecture per "Deep High-Resolution Representation Learning"
(Wang et al., arXiv:1908.07919, HRNetV2): a two-conv stride-4 stem, a
Bottleneck stage at 64 width, then progressively added parallel
branches at strides 4/8/16/32 with channels (C, 2C, 4C, 8C). Each
stage module runs BasicBlocks per branch and then fully fuses: lower
resolutions reach higher ones via 1x1 conv + BN + nearest upsample,
higher reach lower via chains of strided 3x3 conv + BN (+ReLU between),
summed and ReLU'd. The four branch outputs ARE the (C1, C2, C3, C4)
contract of the registry — HRNet needs no dilation trick because the
stride-4 branch never downsamples (``output_stride`` is accepted and
ignored; the model is inherently high-resolution).

Parameter names mirror the official state_dict layout 1:1 (conv1/bn1,
layer1.{i}, transition{t}.{b}, stage{s}.{m}.branches/fuse_layers) so
``models/torch_convert.import_hrnet_backbone`` can load the published
ImageNet weights; the fuse upsample defaults to the classification
model's nearest mode (the graph those weights were trained in), with
``fuse_upsample: bilinear`` matching the segmentation repo's variant.

TPU notes: all convs are dense NHWC MXU work; the nearest upsample is a
broadcast-reshape (no gather); BasicBlock branches reuse the ResNet
blocks, so sync-BN (``bn_axis``) composes the same way in ddp mode.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seghiero_tpu.models.resnet import BasicBlock, Bottleneck, batch_norm, conv

# variant: stem-stage Bottleneck count, modules per stage (2,3,4),
# BasicBlocks per branch, base width C
VARIANTS = {
    # official cls_hrnet_w18_small_v2
    "w18_small": dict(width=18, stage1_blocks=2, modules=(1, 3, 2), blocks=2),
    "w18": dict(width=18, stage1_blocks=4, modules=(1, 4, 3), blocks=4),
    "w32": dict(width=32, stage1_blocks=4, modules=(1, 4, 3), blocks=4),
    "w48": dict(width=48, stage1_blocks=4, modules=(1, 4, 3), blocks=4),
}


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor x``factor`` upsample as a broadcast + reshape —
    no gather, XLA lowers it to a copy it can fuse."""
    b, h, w, c = x.shape
    y = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return y.reshape(b, h * factor, w * factor, c)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch BasicBlocks, then full
    cross-resolution fusion (arXiv:1908.07919 §3.2)."""

    channels: Sequence[int]
    n_blocks: int
    fuse_upsample: str = "nearest"  # "nearest" (cls graph) | "bilinear" (seg)
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, xs, train: bool):
        ys = []
        for b, c in enumerate(self.channels):
            x = xs[b]
            for i in range(self.n_blocks):
                x = BasicBlock(
                    c, dtype=self.dtype, bn_axis=self.bn_axis,
                    name=f"branch{b}_{i}",
                )(x, train)
            ys.append(x)
        if len(self.channels) == 1:
            return ys

        outs = []
        for i, ci in enumerate(self.channels):
            acc = None
            for j, cj in enumerate(self.channels):
                if j == i:
                    t = ys[j]
                elif j > i:
                    # low-res -> high-res: 1x1 conv + BN, upsample 2^(j-i)
                    t = conv(ci, 1, dtype=self.dtype, name=f"fuse{i}_{j}_conv")(
                        ys[j]
                    )
                    t = batch_norm(
                        train, self.dtype, name=f"fuse{i}_{j}_bn",
                        axis_name=self.bn_axis,
                    )(t)
                    if self.fuse_upsample == "bilinear":
                        bsz, _, _, ch = t.shape
                        hh, ww = ys[i].shape[1], ys[i].shape[2]
                        t = jax.image.resize(
                            t.astype(jnp.float32), (bsz, hh, ww, ch), "linear"
                        ).astype(t.dtype)
                    else:
                        t = upsample_nearest(t, 2 ** (j - i))
                else:
                    # high-res -> low-res: (i-j) strided 3x3 convs; the
                    # last maps to ci with BN only, earlier keep cj +ReLU
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        t = conv(
                            ci if last else cj, 3, 2, dtype=self.dtype,
                            name=f"fuse{i}_{j}_{k}_conv",
                        )(t)
                        t = batch_norm(
                            train, self.dtype, name=f"fuse{i}_{j}_{k}_bn",
                            axis_name=self.bn_axis,
                        )(t)
                        if not last:
                            t = nn.relu(t)
                acc = t if acc is None else acc + t
            outs.append(nn.relu(acc))
        return outs


class HRNetBackbone(nn.Module):
    """Returns (C1, C2, C3, C4) at strides 4/8/16/32 with channels
    (C, 2C, 4C, 8C) — the four parallel HRNet branches."""

    variant: str = "w18"
    fuse_upsample: str = "nearest"
    output_stride: int = 32  # accepted for interface uniformity; HRNet's
    # high-res branch is already stride 4, no dilation mode exists
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.variant not in VARIANTS:
            raise ValueError(
                f"hrnet variant must be one of {sorted(VARIANTS)}, "
                f"got {self.variant!r}"
            )
        if self.fuse_upsample not in ("nearest", "bilinear"):
            raise ValueError("fuse_upsample must be 'nearest' or 'bilinear'")
        spec = VARIANTS[self.variant]
        width = spec["width"]
        chs = tuple(width * (2 ** i) for i in range(4))

        x = x.astype(self.dtype)
        # stem: two 3x3/s2 convs -> stride 4 (official conv1/bn1/conv2/bn2)
        for ci in (1, 2):
            x = conv(64, 3, 2, dtype=self.dtype, name=f"conv{ci}")(x)
            x = batch_norm(
                train, self.dtype, name=f"bn{ci}", axis_name=self.bn_axis
            )(x)
            x = nn.relu(x)
        # stage 1: Bottlenecks at width 64 (256 out)
        for i in range(spec["stage1_blocks"]):
            x = Bottleneck(
                64, dtype=self.dtype, bn_axis=self.bn_axis, name=f"layer1_{i}"
            )(x, train)

        # transition1: split into the first two branches
        xs = []
        for b, stride in enumerate((1, 2)):
            t = conv(
                chs[b], 3, stride, dtype=self.dtype,
                name=f"transition1_{b}_conv",
            )(x)
            t = batch_norm(
                train, self.dtype, name=f"transition1_{b}_bn",
                axis_name=self.bn_axis,
            )(t)
            xs.append(nn.relu(t))

        for stage, n_modules in zip((2, 3, 4), spec["modules"]):
            if stage > 2:
                # transition{stage-1}: one new branch, strided conv from
                # the previous stage's lowest-resolution branch
                b = stage - 1
                t = conv(
                    chs[b], 3, 2, dtype=self.dtype,
                    name=f"transition{stage - 1}_{b}_conv",
                )(xs[-1])
                t = batch_norm(
                    train, self.dtype, name=f"transition{stage - 1}_{b}_bn",
                    axis_name=self.bn_axis,
                )(t)
                xs = list(xs) + [nn.relu(t)]
            for m in range(n_modules):
                xs = HRModule(
                    chs[: stage],
                    spec["blocks"],
                    fuse_upsample=self.fuse_upsample,
                    dtype=self.dtype,
                    bn_axis=self.bn_axis,
                    name=f"stage{stage}_m{m}",
                )(xs, train)
        return tuple(xs)

    @staticmethod
    def stage_channels(variant: str) -> Tuple[int, int, int, int]:
        w = VARIANTS[variant]["width"]
        return (w, 2 * w, 4 * w, 8 * w)
