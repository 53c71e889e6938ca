"""MiT (Mix Transformer) backbone family — SegFormer's encoder, the
transformer entry in the plug-in backbone registry.

The reference documents backbone swapping as an edit-the-code exercise
(README.md:319-328); ResNet/ConvNeXt/HRNet/UNet cover the conv families,
and this module adds the transformer one:

    model:
      backbone: mit
      backbone_options: {variant: b0, drop_path_rate: 0.1}

Architecture per "SegFormer: Simple and Efficient Design for Semantic
Segmentation with Transformers" (Xie et al., arXiv:2105.15203), encoder
only: four stages of overlapped patch embedding (7×7/s4 then 3×3/s2
convs, LayerNorm) followed by transformer blocks with

  * efficient self-attention — keys/values are spatially reduced by an
    ``sr_ratio``-strided conv (8/4/2/1 per stage) before the attention
    matmuls, so cost is O(N²/sr²);
  * Mix-FFN — Dense → 3×3 depthwise conv (the positional-encoding-free
    location mixer) → exact GELU → Dense;

with per-sample stochastic depth on both residual branches and a final
LayerNorm per stage. Stage outputs are exactly the registry's
(C1, C2, C3, C4) contract at strides 4/8/16/32.

``output_stride`` is accepted and ignored (interface uniformity): MiT
has no dilation mode — SegFormer recovers resolution in its all-MLP
decode head (``model.head: segformer_mlp``) instead.

TPU notes: attention and the FFNs are large batched dense contractions —
straight MXU work, the best-mapping architecture class on this hardware.
Softmax and LayerNorm statistics are computed in f32 regardless of the
compute dtype (bf16-safe); shapes are static per config so the whole
stack jits into one fused program. The sr-conv keeps the attention
matrices at ≤(H·W/16)² elements for 512² inputs — no flash-attention
kernel is needed at segmentation sequence lengths (N ≤ 16k, the
materialized attention matrix stays comfortably in HBM and XLA tiles
the two matmuls onto the MXU back-to-back).

Parameter layout mirrors the official NVlabs state_dict 1:1 modulo
name flattening (patch_embed{i}/block{i}.{j}/norm{i});
``models/torch_convert.import_mit_backbone`` loads both the official
checkpoints (fused ``attn.kv``) and HuggingFace ``SegformerModel``
weights (split ``attention.self.{query,key,value}``).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from seghiero_tpu.models.convnext import DropPath

# depths per stage, embed dims per stage (arXiv:2105.15203 Table 7 /
# official mix_transformer.py). heads (1,2,5,8), sr (8,4,2,1),
# mlp_ratio 4 are shared by every variant.
VARIANTS = {
    "b0": ((2, 2, 2, 2), (32, 64, 160, 256)),
    "b1": ((2, 2, 2, 2), (64, 128, 320, 512)),
    "b2": ((3, 4, 6, 3), (64, 128, 320, 512)),
    "b3": ((3, 4, 18, 3), (64, 128, 320, 512)),
    "b4": ((3, 8, 27, 3), (64, 128, 320, 512)),
    "b5": ((3, 6, 40, 3), (64, 128, 320, 512)),
}

NUM_HEADS = (1, 2, 5, 8)
SR_RATIOS = (8, 4, 2, 1)
MLP_RATIO = 4
PATCH = ((7, 4), (3, 2), (3, 2), (3, 2))  # (kernel, stride) per stage


def layer_norm(dtype, name=None):
    # official uses partial(nn.LayerNorm, eps=1e-6); HF layer_norm_eps=1e-6
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=name)


class EfficientAttention(nn.Module):
    """Spatial-reduction multi-head self-attention (arXiv:2105.15203 §3.1).

    Input/output are spatial NHWC maps; q is computed at full resolution,
    k/v from an ``sr``-strided conv reduction (LayerNorm'd), so the score
    matrix is [B, h, N, N/sr²]."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        n = h * w
        hd = self.dim // self.num_heads

        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x.reshape(b, n, c))
        if self.sr_ratio > 1:
            r = nn.Conv(
                self.dim,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                dtype=self.dtype,
                name="sr",
            )(x)
            r = layer_norm(self.dtype, name="sr_norm")(r)
            r = r.reshape(b, -1, c)
        else:
            r = x.reshape(b, n, c)
        m = r.shape[1]
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(r)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(r)

        q = q.reshape(b, n, self.num_heads, hd)
        k = k.reshape(b, m, self.num_heads, hd)
        v = v.reshape(b, m, self.num_heads, hd)
        # scores in f32: bf16 softmax loses ulps exactly where attention
        # saturates; the two einsums are native-MXU either way
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
        attn = nn.softmax(scores * (hd ** -0.5), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, self.dim)
        y = nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)
        return y.reshape(b, h, w, self.dim)


class MixFFN(nn.Module):
    """Dense → 3×3 depthwise conv → exact GELU → Dense (§3.1 Mix-FFN)."""

    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = nn.Conv(
            self.hidden,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            feature_group_count=self.hidden,
            dtype=self.dtype,
            name="dwconv",
        )(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default is exact
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = layer_norm(self.dtype, name="norm1")(x)
        y = EfficientAttention(
            self.dim, self.num_heads, self.sr_ratio, dtype=self.dtype,
            name="attn",
        )(y)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, train)
        y = layer_norm(self.dtype, name="norm2")(x)
        y = MixFFN(
            self.dim, MLP_RATIO * self.dim, dtype=self.dtype, name="mlp"
        )(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class MiTBackbone(nn.Module):
    """Returns (C1, C2, C3, C4) at strides 4/8/16/32 with the variant's
    embed dims, each stage LayerNorm'd (official norm1..norm4)."""

    variant: str = "b0"
    drop_path_rate: float = 0.0
    output_stride: int = 32  # accepted for interface uniformity (see
    # module docstring); MiT has no dilation mode
    dtype: Any = jnp.float32
    bn_axis: Any = None  # no BatchNorm in MiT; accepted for uniformity

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.variant not in VARIANTS:
            raise ValueError(
                f"mit variant must be one of {sorted(VARIANTS)}, "
                f"got {self.variant!r}"
            )
        depths, dims = VARIANTS[self.variant]
        total = sum(depths)
        dp = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]

        x = x.astype(self.dtype)
        feats = []
        block_i = 0
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            kern, stride = PATCH[s]
            pad = kern // 2
            x = nn.Conv(
                dim,
                (kern, kern),
                strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)],
                dtype=self.dtype,
                name=f"patch_embed{s + 1}_proj",
            )(x)
            x = layer_norm(self.dtype, name=f"patch_embed{s + 1}_norm")(x)
            for b in range(depth):
                x = MiTBlock(
                    dim,
                    NUM_HEADS[s],
                    SR_RATIOS[s],
                    drop_path=dp[block_i],
                    dtype=self.dtype,
                    name=f"stage{s + 1}_{b}",
                )(x, train)
                block_i += 1
            x = layer_norm(self.dtype, name=f"norm{s + 1}")(x)
            feats.append(x)
        return tuple(feats)

    @staticmethod
    def stage_channels(variant: str) -> Tuple[int, int, int, int]:
        return VARIANTS[variant][1]
