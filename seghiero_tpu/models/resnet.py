"""ResNet backbone in Flax (NHWC, TPU-native).

Capability parity with models/backbone/resnet.py of the reference (which
wraps torchvision resnet50/101 and returns the four stage features C1..C4
at strides 4/8/16/32, resnet.py:6-75). Differences by design:

  * NHWC layout — channels-last is the natural layout for TPU convs.
  * bfloat16 compute / float32 params by default (MXU-friendly).
  * depths 18/34/50/101/152 — the reference README advertises 18-152
    (README.md:95) but its code accepts only 50/101 (resnet.py:34-39);
    we implement the full advertised family.
  * explicit torch-style symmetric padding (not XLA "SAME") so converted
    torchvision weights produce identical activations.

Structure matches torchvision v1 ResNet (stride-2 placed on the 3×3 conv
of bottlenecks — "v1.5") so ImageNet weights convert 1:1; see
models/torch_convert.py.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import dtypes as nn_dtypes

STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
BOTTLENECK_DEPTHS = (50, 101, 152)


def conv(features, kernel, stride=1, dilation=1, dtype=jnp.float32, name=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


def batch_norm(train: bool, dtype=jnp.float32, name=None, axis_name=None):
    # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax decay 0.9).
    # ``axis_name`` enables cross-replica (sync-BN) statistics inside
    # shard_map'd ddp training; None = batch-local stats.
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
        axis_name=axis_name,
    )


class StemConv(nn.Module):
    """The 7×7/s2 stem conv, optionally evaluated via space-to-depth.

    The parameter is always the canonical ``kernel`` of shape
    ``[7, 7, C_in, 64]`` — identical to the plain-conv parameterization —
    so checkpoints and torch-converted ImageNet weights are interchangeable
    between modes.

    ``mode="s2d"`` is the MLPerf-style TPU stem: a 7×7 stride-2 conv over
    3-channel input has a contraction dim of 147 built from a tiny C=3,
    which the MXU executes at ~2 TFLOP/s (measured; docs/ROADMAP.md).
    Rewriting it as a 2×2 space-to-depth followed by a 4×4 stride-1 VALID
    conv (contraction dim 192 over 12 channels) is mathematically exact:

        y(i,j) = Σ_{a,b=0..6} x[2i+a-3, 2j+b-3] · W7[a,b]
               = Σ_{a,b=0..7} x̂[2i+a, 2j+b] · W8[a,b]
        with  W8[a,b] = W7[a-1,b-1] (zero row/col 0),  x̂ = pad(x, (4,2))
               = Σ_{A,B=0..3} z[i+A, j+B] · Ŵ[A,B]
        with  z[p,q,(dy,dx,c)] = x̂[2p+dy, 2q+dx, c]
              Ŵ[A,B,(dy,dx,c),o] = W8[2A+dy, 2B+dx, c, o]

    Only the floating-point reduction order differs. Requires even H, W
    (static shapes); odd inputs fall back to the plain conv.
    """

    mode: str = "conv7"  # "conv7" | "s2d"
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, c_in, self.features)
        )
        x, kernel = nn_dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        _, h, w, _ = x.shape
        if self.mode == "s2d" and h % 2 == 0 and w % 2 == 0:
            xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
            hp, wp = h + 6, w + 6
            z = xp.reshape(-1, hp // 2, 2, wp // 2, 2, c_in)
            z = z.transpose(0, 1, 3, 2, 4, 5).reshape(-1, hp // 2, wp // 2, 4 * c_in)
            k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k = k8.reshape(4, 2, 4, 2, c_in, self.features)
            k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c_in, self.features)
            return jax.lax.conv_general_dilated(
                z, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            (2, 2),
            ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = conv(
            self.features, 3, self.stride, self.dilation, dtype=self.dtype, name="conv1"
        )(x)
        y = batch_norm(train, self.dtype, name="bn1", axis_name=self.bn_axis)(y)
        y = nn.relu(y)
        y = conv(self.features, 3, dilation=self.dilation, dtype=self.dtype,
                 name="conv2")(y)
        y = batch_norm(train, self.dtype, name="bn2", axis_name=self.bn_axis)(y)
        if identity.shape != y.shape:
            identity = conv(
                self.features, 1, self.stride, dtype=self.dtype, name="down_conv"
            )(x)
            identity = batch_norm(
                train, self.dtype, name="down_bn", axis_name=self.bn_axis
            )(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # width of the 3x3; output is 4x this
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = conv(self.features, 1, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(train, self.dtype, name="bn1", axis_name=self.bn_axis)(y)
        y = nn.relu(y)
        # stride on the 3x3 (torchvision v1.5 placement)
        y = conv(
            self.features, 3, self.stride, self.dilation, dtype=self.dtype, name="conv2"
        )(y)
        y = batch_norm(train, self.dtype, name="bn2", axis_name=self.bn_axis)(y)
        y = nn.relu(y)
        y = conv(self.features * 4, 1, dtype=self.dtype, name="conv3")(y)
        y = batch_norm(train, self.dtype, name="bn3", axis_name=self.bn_axis)(y)
        if identity.shape != y.shape:
            identity = conv(
                self.features * 4, 1, self.stride, dtype=self.dtype, name="down_conv"
            )(x)
            identity = batch_norm(
                train, self.dtype, name="down_bn", axis_name=self.bn_axis
            )(identity)
        return nn.relu(y + identity)


class ResNetBackbone(nn.Module):
    """Returns (C1, C2, C3, C4).

    ``output_stride`` controls C4's stride via dilated stages (the
    DeepLab trick; torchvision ``replace_stride_with_dilation``
    semantics, so converted ImageNet weights remain valid):
      * 32 (default — matches the reference, which uses the plain
        torchvision backbone, resnet.py:34-54)
      * 16: layer4 dilated ×2
      * 8:  layer3 ×2, layer4 ×4
    Channel widths: 256/512/1024/2048 (bottleneck) or 64/128/256/512.
    """

    depth: int = 101
    output_stride: int = 32
    stem: str = "conv7"  # "conv7" (parity) | "s2d" (TPU fast stem, same math)
    dtype: Any = jnp.float32
    bn_axis: Any = None  # mesh axis name for sync-BN (ddp mode), or None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.depth not in STAGE_BLOCKS:
            raise ValueError(f"depth must be one of {sorted(STAGE_BLOCKS)}")
        if self.output_stride not in (8, 16, 32):
            raise ValueError("output_stride must be 8, 16 or 32")
        if self.stem not in ("conv7", "s2d"):
            raise ValueError("stem must be conv7 or s2d")
        block_cls = Bottleneck if self.depth in BOTTLENECK_DEPTHS else BasicBlock
        blocks = STAGE_BLOCKS[self.depth]
        # stages that trade stride for dilation
        dilate_stage = {8: (2, 3), 16: (3,), 32: ()}[self.output_stride]

        x = x.astype(self.dtype)
        x = StemConv(mode=self.stem, dtype=self.dtype, name="stem_conv")(x)
        x = batch_norm(train, self.dtype, name="stem_bn", axis_name=self.bn_axis)(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )  # stride 4

        feats = []
        widths = (64, 128, 256, 512)
        dilation = 1
        for stage, (width, n_blocks) in enumerate(zip(widths, blocks)):
            stride = 1 if stage == 0 else 2
            prev_dilation = dilation
            if stage in dilate_stage:
                dilation *= stride
                stride = 1
            for b in range(n_blocks):
                x = block_cls(
                    width,
                    stride=stride if b == 0 else 1,
                    # torchvision: the stage's first block keeps the
                    # pre-doubling dilation, the rest use the doubled one
                    dilation=prev_dilation if b == 0 else dilation,
                    dtype=self.dtype,
                    bn_axis=self.bn_axis,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            feats.append(x)
        return tuple(feats)

    @staticmethod
    def stage_channels(depth: int) -> Tuple[int, int, int, int]:
        if depth in BOTTLENECK_DEPTHS:
            return (256, 512, 1024, 2048)
        return (64, 128, 256, 512)
