"""ConvNeXt backbone family (NHWC, TPU-native) — a second backbone for
the plug-in registry.

The reference ships only a torchvision-ResNet wrapper
(models/backbone/resnet.py:6-75) and documents swapping in other
backbones as an edit-the-code exercise (README.md:319-328). This module
is that swap done as a first-class family: select it with

    model:
      backbone: convnext
      backbone_options: {variant: tiny, drop_path_rate: 0.1}

Architecture per "A ConvNet for the 2020s" (Liu et al., arXiv:2201.03545):
patchify 4×4/s4 stem, four stages of (7×7 depthwise → LayerNorm →
pointwise 4× MLP with GELU → layer-scale → residual) blocks with 2×2/s2
LayerNorm-downsample between stages, stochastic depth linearly scaled
over block index. For dense prediction each stage output gets its own
LayerNorm (the upstream segmentation convention), and ``output_stride``
8/16 trades the late downsamples for depthwise dilation exactly like the
ResNet's DeepLab mode (models/resnet.py).

TPU notes: channels-last LayerNorm and the 4× MLP are native MXU work
(the MLPs are where the FLOPs are — large dense contractions); the 7×7
depthwise is a VPU op XLA fuses with the surrounding elementwise chain.
No BatchNorm anywhere, so ddp/sync-BN questions vanish (``bn_axis`` is
accepted and ignored for interface uniformity).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

VARIANTS = {
    #            depths          dims
    "atto":  ((2, 2, 6, 2),  (40, 80, 160, 320)),    # convnextv2-atto scale
    "tiny":  ((3, 3, 9, 3),  (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base":  ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


def layer_norm(dtype, name=None):
    # ConvNeXt uses eps 1e-6 (upstream models/convnext.py), channels-last
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=name)


class DropPath(nn.Module):
    """Per-sample stochastic depth (Huang et al. 2016): with probability
    ``rate`` the residual branch is dropped for a sample; survivors are
    scaled by 1/keep. Identity when not training or rate == 0."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.rate <= 0.0:
            return x
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, mask_shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class ConvNeXtBlock(nn.Module):
    dim: int
    dilation: int = 1
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        pad = 3 * self.dilation
        y = nn.Conv(
            self.dim,
            (7, 7),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        y = layer_norm(self.dtype, name="norm")(y)
        # the 1×1 convs are Dense over the channel axis — straight MXU
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default is exact
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
            )
            y = y * gamma.astype(y.dtype)
        y = DropPath(self.drop_path, name="drop_path")(y, train)
        return shortcut + y


class ConvNeXtBackbone(nn.Module):
    """Returns (C1, C2, C3, C4) at strides 4/8/16/32 (or dilated
    equivalents for ``output_stride`` 16/8), each LayerNorm'd."""

    variant: str = "tiny"
    output_stride: int = 32
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32
    bn_axis: Any = None  # no BN in ConvNeXt; accepted for uniformity

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.variant not in VARIANTS:
            raise ValueError(
                f"convnext variant must be one of {sorted(VARIANTS)}, "
                f"got {self.variant!r}"
            )
        if self.output_stride not in (8, 16, 32):
            raise ValueError("output_stride must be 8, 16 or 32")
        depths, dims = VARIANTS[self.variant]
        dilate_stage = {8: (2, 3), 16: (3,), 32: ()}[self.output_stride]
        total = sum(depths)
        # linear stochastic-depth schedule over the whole net (upstream)
        dp_rates = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]

        x = x.astype(self.dtype)
        # patchify stem: 4×4/s4 conv + LN (upstream downsample_layers[0])
        x = nn.Conv(
            dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem_conv"
        )(x)
        x = layer_norm(self.dtype, name="stem_norm")(x)

        feats = []
        block_i = 0
        dilation = 1
        for stage, (depth, dim) in enumerate(zip(depths, dims)):
            if stage > 0:
                x = layer_norm(self.dtype, name=f"down{stage}_norm")(x)
                if stage in dilate_stage:
                    # DeepLab-style: keep resolution, dilate the stage
                    dilation *= 2
                    x = nn.Conv(
                        dim, (2, 2), strides=(1, 1), padding=[(0, 1), (0, 1)],
                        dtype=self.dtype, name=f"down{stage}_conv",
                    )(x)
                else:
                    x = nn.Conv(
                        dim, (2, 2), strides=(2, 2),
                        dtype=self.dtype, name=f"down{stage}_conv",
                    )(x)
            for b in range(depth):
                x = ConvNeXtBlock(
                    dim,
                    dilation=dilation,
                    drop_path=dp_rates[block_i],
                    layer_scale_init=self.layer_scale_init,
                    dtype=self.dtype,
                    name=f"stage{stage}_{b}",
                )(x, train)
                block_i += 1
            # per-stage output norm (upstream dense-prediction convention)
            feats.append(layer_norm(self.dtype, name=f"out_norm{stage}")(x))
        return tuple(feats)

    @staticmethod
    def stage_channels(variant: str) -> Tuple[int, int, int, int]:
        return VARIANTS[variant][1]
