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
import jax.numpy as jnp

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


def batch_norm(train: bool, dtype=jnp.float32, name=None):
    # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax decay 0.9)
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = conv(
            self.features, 3, self.stride, self.dilation, dtype=self.dtype, name="conv1"
        )(x)
        y = batch_norm(train, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, 3, dilation=self.dilation, dtype=self.dtype,
                 name="conv2")(y)
        y = batch_norm(train, self.dtype, name="bn2")(y)
        if identity.shape != y.shape:
            identity = conv(
                self.features, 1, self.stride, dtype=self.dtype, name="down_conv"
            )(x)
            identity = batch_norm(train, self.dtype, name="down_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # width of the 3x3; output is 4x this
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = conv(self.features, 1, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(train, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        # stride on the 3x3 (torchvision v1.5 placement)
        y = conv(
            self.features, 3, self.stride, self.dilation, dtype=self.dtype, name="conv2"
        )(y)
        y = batch_norm(train, self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, 1, dtype=self.dtype, name="conv3")(y)
        y = batch_norm(train, self.dtype, name="bn3")(y)
        if identity.shape != y.shape:
            identity = conv(
                self.features * 4, 1, self.stride, dtype=self.dtype, name="down_conv"
            )(x)
            identity = batch_norm(train, self.dtype, name="down_bn")(identity)
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.depth not in STAGE_BLOCKS:
            raise ValueError(f"depth must be one of {sorted(STAGE_BLOCKS)}")
        if self.output_stride not in (8, 16, 32):
            raise ValueError("output_stride must be 8, 16 or 32")
        block_cls = Bottleneck if self.depth in BOTTLENECK_DEPTHS else BasicBlock
        blocks = STAGE_BLOCKS[self.depth]
        # stages that trade stride for dilation
        dilate_stage = {8: (2, 3), 16: (3,), 32: ()}[self.output_stride]

        x = x.astype(self.dtype)
        x = conv(64, 7, stride=2, dtype=self.dtype, name="stem_conv")(x)
        x = batch_norm(train, self.dtype, name="stem_bn")(x)
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
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            feats.append(x)
        return tuple(feats)

    @staticmethod
    def stage_channels(depth: int) -> Tuple[int, int, int, int]:
        if depth in BOTTLENECK_DEPTHS:
            return (256, 512, 1024, 2048)
        return (64, 128, 256, 512)
