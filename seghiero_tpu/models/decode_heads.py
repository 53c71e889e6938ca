"""Generic decode-head framework + plain-ASPP head family.

The reference carries two dead mmseg-derived modules as extension-point
evidence (SURVEY.md §1): ``models/head/decode_head.py`` (a
``BaseDecodeHead`` clone — input_transform None/"resize_concat"/
"multiple_select", dropout before cls_seg) and ``models/head/aspp_head.py``
(DeepLabV3's plain ``ASPPHead``). Neither is importable there (mmseg
registry leftovers); here they are live, tested model families:

  * ``select_inputs``: the three input-transform policies
    (decode_head.py:114-140,184-214 semantics).
  * ``ASPPHead``: DeepLabV3 (not V3+): full-conv ASPP on C4 + bottleneck
    + dropout + 1×1 classifier (aspp_head.py:70-158). No C1 skip, no
    projection head — when used as the main head the trainer pairs it
    with a zero embedding (triplet inactive) unless combined with
    ``with_projection=True``.

  * ``SegFormerMLPHead``: SegFormer's all-MLP decoder (arXiv:2105.15203
    §3.2) — the natural pairing for ``model.backbone: mit``: per-stage
    linear projection, bilinear-unify to the C1 (stride-4) grid, concat,
    1×1 fuse ConvBNReLU, dropout, 1×1 classifier.

  * ``UPerNetHead``: UPerNet (arXiv:1807.10221) — PSP pooling + FPN
    fusion, the standard pairing for Swin/ConvNeXt backbones.

Select via config ``model.head: "sep_aspp_contrast" (default) | "aspp"
| "segformer_mlp" | "upernet"``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from seghiero_tpu.models.heads import ProjectionHead
from seghiero_tpu.models.resnet import batch_norm, conv
from seghiero_tpu.ops.resize import resize_bilinear


def select_inputs(feats: Sequence[jnp.ndarray], in_index, input_transform: Optional[str]):
    """BaseDecodeHead input selection (decode_head.py:184-214).

    - None: single feature at ``in_index``
    - "resize_concat": resize every indexed feature to the first's HW and
      concat channels
    - "multiple_select": list of indexed features
    """
    if input_transform is None:
        idx = in_index if isinstance(in_index, int) else in_index[0]
        return feats[idx]
    selected = [feats[i] for i in in_index]
    if input_transform == "multiple_select":
        return selected
    if input_transform == "resize_concat":
        hw = selected[0].shape[1:3]
        up = [
            x if x.shape[1:3] == hw
            else resize_bilinear(x.astype(jnp.float32), hw).astype(x.dtype)
            for x in selected
        ]
        return jnp.concatenate(up, axis=-1)
    raise ValueError(f"unknown input_transform {input_transform!r}")


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, self.kernel, dilation=self.dilation,
                 dtype=self.dtype, name="conv")(x)
        x = batch_norm(train, self.dtype, name="bn", axis_name=self.bn_axis)(x)
        return nn.relu(x)


class ASPPHead(nn.Module):
    """DeepLabV3 ASPP head (aspp_head.py:70-158): image pool + 1×1 + full
    (non-separable) dilated 3×3 branches → bottleneck → dropout →
    classifier. Returns (logits_at_c4_res, embedding|None)."""

    num_classes: int
    channels: int = 512
    dilations: Sequence[int] = (1, 12, 24, 36)
    dropout_rate: float = 0.1  # decode_head.py:216-224 cls_seg dropout
    with_projection: bool = False
    proj_dim: int = 256
    proj_type: str = "convmlp"
    in_index: int = -1
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool):
        x = select_inputs(feats, self.in_index, None)
        embedding = None
        if self.with_projection:
            embedding = ProjectionHead(
                self.proj_dim, self.proj_type, dtype=self.dtype,
                bn_axis=self.bn_axis, name="proj_head"
            )(x, train)

        H, W = x.shape[1:3]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        imgp = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                   bn_axis=self.bn_axis, name="image_pool")(
            pooled, train
        )
        branches = [jnp.broadcast_to(imgp, (x.shape[0], H, W, self.channels))]
        branches.append(
            ConvBNReLU(self.channels, 1, dtype=self.dtype,
                       bn_axis=self.bn_axis, name="branch0")(x, train)
        )
        for i, d in enumerate(self.dilations[1:], start=1):
            branches.append(
                ConvBNReLU(self.channels, 3, dilation=d, dtype=self.dtype,
                           bn_axis=self.bn_axis, name=f"branch{i}")(x, train)
            )
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.channels, 3, dtype=self.dtype,
                       bn_axis=self.bn_axis, name="bottleneck")(y, train)
        if self.dropout_rate and train:
            y = nn.Dropout(self.dropout_rate, deterministic=False)(y)
        logits = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype, name="cls_seg"
        )(y)
        return logits.astype(jnp.float32), embedding


class SegFormerMLPHead(nn.Module):
    """SegFormer all-MLP decoder (arXiv:2105.15203 §3.2, official
    segformer_head.py): Dense per stage → resize all to the stride-4
    grid → concat → 1×1 ConvBNReLU fuse → dropout → 1×1 classifier.
    Returns (logits_at_stride4, embedding) — the embedding comes from a
    ProjectionHead on C4 so the triplet term keeps its contract.

    TPU notes: the per-stage projections and the fuse are 1×1 convs =
    dense channel contractions (MXU); the bilinear unify reuses the
    shared gather-free two-matmul resize (ops/resize.py)."""

    num_classes: int
    channels: int = 256
    dropout_rate: float = 0.1
    with_projection: bool = True
    proj_dim: int = 256
    proj_type: str = "convmlp"
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool):
        c1, c2, c3, c4 = feats
        embedding = None
        if self.with_projection:
            embedding = ProjectionHead(
                self.proj_dim, self.proj_type, dtype=self.dtype,
                bn_axis=self.bn_axis, name="proj_head"
            )(c4, train)

        hw = c1.shape[1:3]
        parts = []
        for i, x in enumerate((c1, c2, c3, c4)):
            y = nn.Dense(self.channels, dtype=self.dtype, name=f"linear_c{i + 1}")(x)
            if y.shape[1:3] != hw:
                y = resize_bilinear(y.astype(jnp.float32), hw).astype(y.dtype)
            parts.append(y)
        # official concats [c4, c3, c2, c1]
        y = jnp.concatenate(parts[::-1], axis=-1)
        y = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                       bn_axis=self.bn_axis, name="linear_fuse")(y, train)
        if self.dropout_rate and train:
            y = nn.Dropout(self.dropout_rate, deterministic=False)(y)
        logits = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
            name="cls_seg",
        )(y)
        return logits.astype(jnp.float32), embedding


def adaptive_avg_pool(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Exact torch ``AdaptiveAvgPool2d(s)`` semantics on NHWC: output
    cell (i, j) averages rows [⌊iH/s⌋, ⌈(i+1)H/s⌉) × cols alike. The
    ≤ s² cell slices are trace-time static — no gather, each cell is
    one fused mean."""
    b, h, w, c = x.shape
    import math

    def bounds(n):
        return [
            (math.floor(i * n / s), math.ceil((i + 1) * n / s)) for i in range(s)
        ]

    rows, cols = bounds(h), bounds(w)
    return jnp.stack(
        [
            jnp.stack(
                [x[:, r0:r1, c0:c1].mean(axis=(1, 2)) for (c0, c1) in cols],
                axis=1,
            )
            for (r0, r1) in rows
        ],
        axis=1,
    )


class UPerNetHead(nn.Module):
    """UPerNet decode head (Xiao et al., arXiv:1807.10221; the standard
    pairing for Swin/ConvNeXt backbones): PSP pooling on C4 (scales
    1/2/3/6, 1×1 ConvBNReLU each, upsampled + concat + 3×3 bottleneck),
    1×1 lateral convs on C1–C3, top-down FPN summation, 3×3 FPN convs,
    resize-concat of all pyramid levels at the stride-4 grid, 3×3 fuse,
    dropout, 1×1 classifier. Returns (logits_at_stride4, embedding) —
    the embedding rides C4 via a ProjectionHead (triplet contract).

    TPU notes: the PSP pools are static slice-means; every conv is dense
    NHWC MXU work; the upsamples reuse the gather-free two-matmul
    resize."""

    num_classes: int
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_rate: float = 0.1
    with_projection: bool = True
    proj_dim: int = 256
    proj_type: str = "convmlp"
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool):
        c1, c2, c3, c4 = feats
        embedding = None
        if self.with_projection:
            embedding = ProjectionHead(
                self.proj_dim, self.proj_type, dtype=self.dtype,
                bn_axis=self.bn_axis, name="proj_head"
            )(c4, train)

        # PSP module on C4
        hw4 = c4.shape[1:3]
        psp = [c4]
        for i, s in enumerate(self.pool_scales):
            y = adaptive_avg_pool(c4, s)
            y = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                           bn_axis=self.bn_axis, name=f"psp{i}")(y, train)
            y = resize_bilinear(y.astype(jnp.float32), hw4).astype(y.dtype)
            psp.append(y)
        top = ConvBNReLU(self.channels, 3, dtype=self.dtype,
                         bn_axis=self.bn_axis, name="psp_bottleneck")(
            jnp.concatenate(psp, axis=-1), train
        )

        # FPN: laterals + top-down sums
        laterals = [
            ConvBNReLU(self.channels, 1, dtype=self.dtype,
                       bn_axis=self.bn_axis, name=f"lateral{i}")(x, train)
            for i, x in enumerate((c1, c2, c3))
        ] + [top]
        for i in (2, 1, 0):
            up = resize_bilinear(
                laterals[i + 1].astype(jnp.float32), laterals[i].shape[1:3]
            ).astype(laterals[i].dtype)
            laterals[i] = laterals[i] + up
        outs = [
            ConvBNReLU(self.channels, 3, dtype=self.dtype,
                       bn_axis=self.bn_axis, name=f"fpn{i}")(laterals[i], train)
            for i in range(3)
        ] + [laterals[3]]

        hw1 = c1.shape[1:3]
        outs = [
            o if o.shape[1:3] == hw1
            else resize_bilinear(o.astype(jnp.float32), hw1).astype(o.dtype)
            for o in outs
        ]
        y = ConvBNReLU(self.channels, 3, dtype=self.dtype,
                       bn_axis=self.bn_axis, name="fuse")(
            jnp.concatenate(outs, axis=-1), train
        )
        if self.dropout_rate and train:
            y = nn.Dropout(self.dropout_rate, deterministic=False)(y)
        logits = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
            name="cls_seg",
        )(y)
        return logits.astype(jnp.float32), embedding
