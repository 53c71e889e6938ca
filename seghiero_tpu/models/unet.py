"""UNet backbone (NHWC, TPU-native) — the second README-named swap
target done as a registry family.

The reference documents replacing its ResNet with "``UNet`` or
``HRNet``" as an edit-the-code exercise (README.md:319-328). Select it
with:

    model:
      backbone: unet
      backbone_options: {base_width: 32, max_width: 512}

Architecture per "U-Net: Convolutional Networks for Biomedical Image
Segmentation" (Ronneberger et al., arXiv:1505.04597), modernized the
usual way (BatchNorm after each conv, SAME padding so skip connections
concat without cropping): an encoder of double-conv blocks with 2x2
max-pool downsamples to stride 32, then a decoder of 2x2 up-convs +
skip-concat + double-conv back up to stride 4.

Mapping onto the registry's (C1, C2, C3, C4) stride-4/8/16/32 contract:
C4 is the stride-32 bottleneck and C3/C2/C1 are the DECODER outputs at
strides 16/8/4 — so unlike a plain encoder classifier-backbone, the
high-resolution features the decode head consumes have already seen the
whole context through the decoder path (that is UNet's entire point).

Widths double per level from ``base_width`` and are capped at
``max_width`` (keeps the stride-16/32 levels from exploding; cap 512 by
default). All convs are dense NHWC MXU work; ``bn_axis`` gives sync-BN
under ddp exactly like the ResNet blocks. No pretrained import exists —
there is no canonical published UNet checkpoint layout; use
``--resume`` or a registry builder for custom weights.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from seghiero_tpu.models.resnet import batch_norm, conv


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) x 2 — the UNet unit block."""

    features: int
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        for i in (1, 2):
            x = conv(self.features, 3, dtype=self.dtype, name=f"conv{i}")(x)
            x = batch_norm(
                train, self.dtype, name=f"bn{i}", axis_name=self.bn_axis
            )(x)
            x = nn.relu(x)
        return x


class UNetBackbone(nn.Module):
    """Returns (C1, C2, C3, C4) at strides 4/8/16/32: C4 = bottleneck,
    C3..C1 = decoder outputs (context-aware high-res features)."""

    base_width: int = 32
    max_width: int = 512
    dtype: Any = jnp.float32
    bn_axis: Any = None
    output_stride: int = 32  # accepted for interface uniformity; the
    # decoder already returns full-context stride-4 features

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.base_width < 1 or self.max_width < self.base_width:
            raise ValueError(
                "need 1 <= base_width <= max_width, got "
                f"{self.base_width}/{self.max_width}"
            )
        widths = [
            min(self.base_width * 2 ** i, self.max_width) for i in range(6)
        ]

        x = x.astype(self.dtype)
        skips = []
        # encoder: levels at stride 1, 2, 4, 8, 16; bottleneck at 32
        for level, w in enumerate(widths):
            if level > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = DoubleConv(
                w, dtype=self.dtype, bn_axis=self.bn_axis, name=f"enc{level}"
            )(x, train)
            if level < 5:
                skips.append(x)

        feats = {32: x}  # bottleneck = C4
        # decoder back up to stride 4 (levels 4, 3, 2 — strides 16, 8, 4)
        for level in (4, 3, 2):
            w = widths[level]
            # 2x2 up-conv (transposed conv, stride 2)
            x = nn.ConvTranspose(
                w,
                (2, 2),
                strides=(2, 2),
                use_bias=False,
                dtype=self.dtype,
                name=f"up{level}_conv",
            )(x)
            x = batch_norm(
                train, self.dtype, name=f"up{level}_bn", axis_name=self.bn_axis
            )(x)
            x = nn.relu(x)
            x = jnp.concatenate([skips[level], x], axis=-1)
            x = DoubleConv(
                w, dtype=self.dtype, bn_axis=self.bn_axis, name=f"dec{level}"
            )(x, train)
            feats[2 ** level] = x  # encoder level L sits at stride 2^L

        return (feats[4], feats[8], feats[16], feats[32])

    @staticmethod
    def stage_channels(
        base_width: int = 32, max_width: int = 512
    ) -> Tuple[int, int, int, int]:
        w = [min(base_width * 2 ** i, max_width) for i in range(6)]
        return (w[2], w[3], w[4], w[5])
