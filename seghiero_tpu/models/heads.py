"""Decode heads in Flax (NHWC).

Rebuilds models/head/sep_aspp_contrast_head.py of the reference:
  - ``ProjectionHead``            (:6-30)   — C6
  - ``DepthwiseSeparableConv``    (:33-62)  — C7
  - ``DepthwiseSeparableASPP``    (:65-132) — C8
  - ``SepASPPContrastHead``       (:135-254)— C9
plus the inline aux head of train.py:168-173 — C10.

TPU notes:
  * Depthwise convs lower to XLA ``feature_group_count`` convolutions
    which Mosaic maps onto the VPU/MXU directly; the
    depthwise→BN→ReLU→pointwise chain is left to XLA fusion (profiling
    hook point for a Pallas fused kernel lives in ops/).
  * The reference upsamples the 1×1 global-pool branch back to feature
    size with bilinear interpolation (:106) — on a 1×1 source that is a
    broadcast, so we broadcast (identical values, no gather work).
  * The reference head keeps a ``step`` buffer incremented every forward
    (:169,223) that nothing consumes; our step lives in the train state
    where it belongs. Checkpoint importers ignore the buffer.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from flax.linen import dtypes as nn_dtypes

from seghiero_tpu.models.resnet import batch_norm, conv
from seghiero_tpu.ops.resize import resize_bilinear


class ProjectionHead(nn.Module):
    """Per-pixel L2-normalized embedding ('linear' = 1×1 conv;
    'convmlp' = 1×1→BN→ReLU→1×1). Reference :6-30."""

    proj_dim: int = 256
    proj_type: str = "convmlp"
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.proj_type == "linear":
            y = conv(self.proj_dim, 1, dtype=self.dtype, name="proj")(x)
        elif self.proj_type == "convmlp":
            dim_in = x.shape[-1]
            y = conv(dim_in, 1, dtype=self.dtype, name="fc1")(x)
            y = batch_norm(train, self.dtype, name="bn", axis_name=self.bn_axis)(y)
            y = nn.relu(y)
            y = conv(self.proj_dim, 1, dtype=self.dtype, name="fc2")(y)
        else:
            raise ValueError(f"Unknown proj type: {self.proj_type}")
        # L2-normalize over channels in f32. Grad-safe form: the naive
        # y / max(||y||, eps) has a 1/||y|| factor in its VJP that blows
        # up as embeddings shrink (observed NaN after ~18 train steps);
        # rsqrt(sum(y²) + eps) bounds the gradient. Matches
        # F.normalize(p=2, dim=1) to ~eps for healthy embeddings.
        y = y.astype(jnp.float32)
        return y * jax.lax.rsqrt(
            jnp.sum(jnp.square(y), axis=-1, keepdims=True) + 1e-12
        )


class DepthwiseConv(nn.Module):
    """k×k depthwise conv (one filter per channel), same parameter tree
    as ``nn.Conv(feature_group_count=C)`` (kernel [k, k, 1, C]).

    ``use_pallas=True`` routes the 3×3/s1/dilation-1 case through the
    Pallas VPU kernel (ops/pallas/depthwise.py). DEFAULT OFF: measured
    slower than XLA in the full program, in BOTH training and
    forward-only serving (config 5: 27.2 → 37.8 ms/step) — the
    custom-call boundary breaks XLA's conv-pipeline fusions.
    ``model.depthwise_backend: pallas`` plumbs it here as the
    experiment switch (see the kernel module docstring for numbers)."""

    kernel: int = 3
    dilation: int = 1
    dtype: Any = jnp.float32
    bn_axis: Any = None  # unused; accepted for call-site uniformity
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, 1, c_in),
        )
        x, k = nn_dtypes.promote_dtype(x, k, dtype=self.dtype)
        from seghiero_tpu.ops.pallas.depthwise import (
            depthwise3x3,
            depthwise3x3_available,
        )

        if self.use_pallas and depthwise3x3_available(
            k.shape, (1, 1), (self.dilation, self.dilation), x.shape[2]
        ):
            return depthwise3x3(x, k.reshape(self.kernel * self.kernel, c_in))
        pad = self.dilation * (self.kernel - 1) // 2
        return jax.lax.conv_general_dilated(
            x,
            k,
            (1, 1),
            ((pad, pad), (pad, pad)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c_in,
        )


class DepthwiseSeparableConv(nn.Module):
    """depthwise(k×k, dilated) → BN → ReLU → pointwise 1×1 → BN → ReLU.
    Reference :33-62."""

    features: int
    kernel: int = 3
    dilation: int = 1
    dtype: Any = jnp.float32
    bn_axis: Any = None
    dw_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        c_in = x.shape[-1]
        y = DepthwiseConv(
            self.kernel, self.dilation, dtype=self.dtype,
            use_pallas=self.dw_pallas, name="depthwise"
        )(x)
        y = batch_norm(train, self.dtype, name="bn_dw", axis_name=self.bn_axis)(y)
        y = nn.relu(y)
        y = conv(self.features, 1, dtype=self.dtype, name="pointwise")(y)
        y = batch_norm(train, self.dtype, name="bn_pw", axis_name=self.bn_axis)(y)
        return nn.relu(y)


class DepthwiseSeparableASPP(nn.Module):
    """ASPP: global-pool branch + 1×1 branch + |dilations[1:]| dilated
    sep-conv branches, concatenated. Output channel order mirrors the
    reference forward (:100-114): [image_pool, 1×1, sep(d1), sep(d2), ...].
    """

    channels: int
    dilations: Sequence[int] = (1, 12, 24, 36)
    dtype: Any = jnp.float32
    bn_axis: Any = None
    dw_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        H, W = x.shape[1:3]
        # image-pool branch: GAP → 1×1 conv → BN → ReLU → broadcast
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        imgp = conv(self.channels, 1, dtype=self.dtype, name="image_pool_conv")(pooled)
        imgp = batch_norm(train, self.dtype, name="image_pool_bn", axis_name=self.bn_axis)(imgp)
        imgp = nn.relu(imgp)
        imgp = jnp.broadcast_to(imgp, (x.shape[0], H, W, self.channels))

        branches = [imgp]
        y = conv(self.channels, 1, dtype=self.dtype, name="branch0_conv")(x)
        y = batch_norm(train, self.dtype, name="branch0_bn", axis_name=self.bn_axis)(y)
        branches.append(nn.relu(y))
        for i, d in enumerate(self.dilations[1:], start=1):
            branches.append(
                DepthwiseSeparableConv(
                    self.channels, 3, dilation=d, dtype=self.dtype,
                    bn_axis=self.bn_axis, dw_pallas=self.dw_pallas,
                    name=f"branch{i}"
                )(x, train)
            )
        return jnp.concatenate(branches, axis=-1)


class SepASPPContrastHead(nn.Module):
    """DeepLabV3+-style decode head with a contrastive projection.

    forward([C1..C4]) → (logits [B, H/4, W/4, num_classes],
                          embedding [B, h4, w4, proj_dim])
    where h4/w4 is C4's resolution. Reference :212-254.
    """

    num_classes: int
    c1_channels: int = 48
    aspp_channels: int = 512
    dilations: Sequence[int] = (1, 12, 24, 36)
    proj_dim: int = 256
    proj_type: str = "convmlp"
    use_c1_skip: bool = True
    dtype: Any = jnp.float32
    bn_axis: Any = None
    dw_pallas: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool):
        c1, c4 = feats[0], feats[-1]

        embedding = ProjectionHead(
            self.proj_dim, self.proj_type, dtype=self.dtype,
            bn_axis=self.bn_axis, name="proj_head"
        )(c4, train)

        y = DepthwiseSeparableASPP(
            self.aspp_channels, self.dilations, dtype=self.dtype,
            bn_axis=self.bn_axis, dw_pallas=self.dw_pallas, name="aspp"
        )(c4, train)
        y = conv(self.aspp_channels, 1, dtype=self.dtype, name="bottleneck_conv")(y)
        y = batch_norm(train, self.dtype, name="bottleneck_bn", axis_name=self.bn_axis)(y)
        y = nn.relu(y)

        if self.use_c1_skip:
            skip = conv(self.c1_channels, 1, dtype=self.dtype, name="c1_conv")(c1)
            skip = batch_norm(train, self.dtype, name="c1_bn", axis_name=self.bn_axis)(skip)
            skip = nn.relu(skip)
            y = resize_bilinear(y.astype(jnp.float32), c1.shape[1:3]).astype(self.dtype)
            y = jnp.concatenate([y, skip], axis=-1)

        y = DepthwiseSeparableConv(
            self.aspp_channels, 3, dtype=self.dtype,
            bn_axis=self.bn_axis, dw_pallas=self.dw_pallas,
            name="sep_bottleneck0"
        )(y, train)
        y = DepthwiseSeparableConv(
            self.aspp_channels, 3, dtype=self.dtype,
            bn_axis=self.bn_axis, dw_pallas=self.dw_pallas,
            name="sep_bottleneck1"
        )(y, train)

        logits = nn.Conv(
            self.num_classes,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            name="cls_seg",
        )(y)
        return logits.astype(jnp.float32), embedding


class AuxHead(nn.Module):
    """1×1 conv → BN → ReLU on C3, fine classes only (train.py:168-173).
    (Yes, ReLU *after* the classifier — kept for parity.)"""

    n_fine: int
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, c3, train: bool):
        y = conv(self.n_fine, 1, dtype=self.dtype, name="conv")(c3)
        y = batch_norm(train, self.dtype, name="bn", axis_name=self.bn_axis)(y)
        return nn.relu(y).astype(jnp.float32)
