"""Plain ViT backbone family (ViT-T/S/B/L) with a ViTDet-style simple
feature pyramid — the isotropic-transformer entry in the plug-in
backbone registry.

The reference documents backbone swapping as an edit-the-code exercise
(README.md:319-328); ResNet/ConvNeXt/HRNet/UNet cover the conv families
and MiT/Swin the hierarchical transformers.  This module adds the plain
(isotropic, single-scale) Vision Transformer — the architecture behind
the strongest public segmentation encoders today (DINOv2, MAE, CLIP):

    model:
      backbone: vit
      backbone_options: {variant: base, patch: 16, drop_path_rate: 0.1}

Architecture per "An Image is Worth 16x16 Words" (Dosovitskiy et al.,
arXiv:2010.11929): non-overlapping ``patch``-strided conv embedding, a
CLS token (plus optional DINOv2-style register tokens,
arXiv:2309.16588), learned position embeddings **bicubically
interpolated** from the pretraining grid to the input grid (the
standard dense-prediction adaptation, matching timm/DINOv2/HF
``F.interpolate(mode="bicubic")``), then ``depth`` pre-norm
transformer blocks (MHSA with a fused qkv projection, exact-GELU MLP,
optional per-branch LayerScale for DINOv2 checkpoints, per-sample
stochastic depth) and a final LayerNorm.

The registry's (C1, C2, C3, C4) multi-scale contract is met with the
**simple feature pyramid** of ViTDet ("Exploring Plain Vision
Transformer Backbones for Object Detection", Li et al.,
arXiv:2203.16527 §3): the last stride-16 feature map alone is rescaled
to strides 4/8/16/32 via 2×2 stride-2 deconvolutions (LN+GELU between
the two stride-4 deconvs) and 2×2 max-pooling — no intermediate-layer
taps.  Pyramid parameters are freshly initialized on pretrained import
(they do not exist in ViT checkpoints); ``import_vit_backbone`` returns
only encoder weights and the trainer merges them over the init tree.

``output_stride`` is accepted and ignored (interface uniformity): a
plain ViT is natively stride-16; resolution is recovered by the pyramid
and the decode head.

TPU notes: a plain ViT is the best-mapping architecture class on this
hardware — every FLOP is a large dense batched matmul on the MXU, there
are no strided/dilated convs to lane-pad, and the isotropic shape means
XLA emits one fused layer program repeated ``depth`` times.  Attention
is materialized (no flash kernel): at segmentation resolutions the
token count is H·W/256 (1025 tokens at 512², 4097 at 1024²) and the
score matrix stays comfortably within HBM bandwidth limits; softmax
statistics are computed in f32 regardless of compute dtype (bf16-safe).

Parameter layout mirrors timm's ``vision_transformer.py`` state_dict
modulo name flattening (patch_embed/cls_token/pos_embed/block{i}/norm);
``models/torch_convert.import_vit_backbone`` loads timm ViT/DeiT/MAE,
HuggingFace ``ViTModel``, and HuggingFace ``Dinov2Model`` (LayerScale +
register-token) checkpoints.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.models.convnext import DropPath

# (embed dim, depth, heads) — arXiv:2010.11929 Table 1 + the
# community-standard Tiny/Small additions (timm). mlp_ratio 4 shared.
VARIANTS = {
    "tiny": (192, 12, 3),
    "small": (384, 12, 6),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
}

MLP_RATIO = 4


def _cubic_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """``[n_out, n_in]`` torch-bicubic interpolation matrix
    (``F.interpolate(mode="bicubic", align_corners=False)``: cubic
    convolution with A=-0.75, half-pixel centers, clamped borders).
    Built in numpy at trace time — static shapes — so the resize itself
    is one small matmul per axis on device."""
    A = -0.75
    scale = n_in / n_out
    W = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        center = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(center))
        t = center - i0
        # 4-tap cubic-convolution weights at offsets -1..2
        w = (
            ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A,
            ((A + 2) * t - (A + 3)) * t * t + 1,
            ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1,
            ((A * (2 - t) - 5 * A) * (2 - t) + 8 * A) * (2 - t) - 4 * A,
        )
        for k, wk in enumerate(w):
            W[i, min(max(i0 - 1 + k, 0), n_in - 1)] += wk
    return W


def interpolate_pos_embed(
    pos: jnp.ndarray, grid: Tuple[int, int], new_grid: Tuple[int, int]
) -> jnp.ndarray:
    """Resize the patch part of a ``[1, 1+G·G, D]`` position table to a
    new grid, keeping the CLS slot — exact torch
    ``F.interpolate(mode="bicubic", align_corners=False)`` semantics
    (cubic convolution, A=-0.75), the interpolation timm / DINOv2 / HF
    all use, so a 224-pretrained table transfers at 512+ with step-0
    fidelity. (``jax.image.resize``'s "bicubic" is the Keys a=-0.5
    kernel — measurably different, ~0.2 max abs on unit-normal tables.)"""
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    gh, gw = grid
    nh, nw = new_grid
    if (gh, gw) == (nh, nw):
        return pos
    d = pos.shape[-1]
    wh = jnp.asarray(_cubic_resize_matrix(gh, nh))
    ww = jnp.asarray(_cubic_resize_matrix(gw, nw))
    patch_pos = patch_pos.reshape(gh, gw, d).astype(jnp.float32)
    # separable: rows then columns, each one small dense matmul
    patch_pos = jnp.einsum("Hh,hwd->Hwd", wh, patch_pos)
    patch_pos = jnp.einsum("Ww,hwd->hWd", ww, patch_pos)
    patch_pos = patch_pos.reshape(1, nh * nw, d).astype(pos.dtype)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


class Attention(nn.Module):
    """Full multi-head self-attention with a fused qkv projection
    (timm layout: q,k,v concatenated along the output axis)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, hd)
        k = k.reshape(b, n, self.num_heads, hd)
        v = v.reshape(b, n, self.num_heads, hd)
        # scores in f32: bf16 softmax loses ulps exactly where attention
        # saturates; both einsums are native MXU contractions either way
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
        attn = nn.softmax(scores * (hd ** -0.5), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    drop_path: float = 0.0
    layer_scale_init: float = 0.0  # 0 → off; DINOv2 ships ~1e-5..1.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        def scaled(y, name):
            if self.layer_scale_init == 0.0:
                return y
            gamma = self.param(
                name,
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
            )
            return y * gamma.astype(y.dtype)

        y = nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, name="norm1"
        )(x)
        y = Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(y)
        x = x + DropPath(self.drop_path, name="drop_path1")(
            scaled(y, "ls1_gamma"), train
        )
        y = nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, name="norm2"
        )(x)
        y = nn.Dense(MLP_RATIO * self.dim, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default is exact
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(
            scaled(y, "ls2_gamma"), train
        )


class ViTBackbone(nn.Module):
    """Returns (C1, C2, C3, C4) at strides 4/8/16/32 with channel widths
    (D/4, D/2, D, D) via the ViTDet simple feature pyramid."""

    variant: str = "base"
    patch: int = 16
    pos_grid: int = 0  # pretraining grid side; 0 → 224 // patch
    drop_path_rate: float = 0.0
    layer_scale_init: float = 0.0
    n_register: int = 0  # DINOv2-with-registers (arXiv:2309.16588)
    norm_eps: float = 1e-6
    output_stride: int = 32  # accepted for interface uniformity (see
    # module docstring); a plain ViT is natively stride-16
    dtype: Any = jnp.float32
    bn_axis: Any = None  # no BatchNorm in ViT; accepted for uniformity

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.variant not in VARIANTS:
            raise ValueError(
                f"vit variant must be one of {sorted(VARIANTS)}, "
                f"got {self.variant!r}"
            )
        dim, depth, heads = VARIANTS[self.variant]
        if x.shape[1] % self.patch or x.shape[2] % self.patch:
            raise ValueError(
                f"vit patch={self.patch} requires input H/W divisible by "
                f"it, got {x.shape[1]}x{x.shape[2]}"
            )
        grid0 = self.pos_grid or 224 // self.patch

        x = x.astype(self.dtype)
        x = nn.Conv(
            dim,
            (self.patch, self.patch),
            strides=(self.patch, self.patch),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        b, h, w, _ = x.shape
        tok = x.reshape(b, h * w, dim)

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + grid0 * grid0, dim),
        )
        pos = interpolate_pos_embed(pos, (grid0, grid0), (h, w))
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, dim)
        )
        tok = tok + pos[:, 1:].astype(self.dtype)
        cls = jnp.broadcast_to(
            (cls + pos[:, :1]).astype(self.dtype), (b, 1, dim)
        )
        extras = [cls]
        if self.n_register:
            reg = self.param(
                "reg_tokens",
                nn.initializers.normal(0.02),
                (1, self.n_register, dim),
            )
            extras.append(
                jnp.broadcast_to(
                    reg.astype(self.dtype), (b, self.n_register, dim)
                )
            )
        tok = jnp.concatenate(extras + [tok], axis=1)

        dp = [
            self.drop_path_rate * i / max(depth - 1, 1) for i in range(depth)
        ]
        for i in range(depth):
            tok = ViTBlock(
                dim,
                heads,
                drop_path=dp[i],
                layer_scale_init=self.layer_scale_init,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name=f"block{i}",
            )(tok, train)
        tok = nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, name="norm"
        )(tok)

        feat = tok[:, 1 + self.n_register:, :].reshape(b, h, w, dim)

        # ViTDet simple feature pyramid (arXiv:2203.16527 §3). Pyramid
        # params are NOT in ViT checkpoints — names carry an "fpn"
        # prefix so pretrained import can merge encoder weights over
        # the init tree without touching them.
        c1 = nn.ConvTranspose(
            dim // 2, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="fpn1_deconv1",
        )(feat)
        c1 = nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, name="fpn1_norm"
        )(c1)
        c1 = nn.gelu(c1, approximate=False)
        c1 = nn.ConvTranspose(
            dim // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="fpn1_deconv2",
        )(c1)
        c2 = nn.ConvTranspose(
            dim // 2, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="fpn2_deconv",
        )(feat)
        c4 = nn.max_pool(feat, (2, 2), strides=(2, 2))
        return (c1, c2, feat, c4)

    @staticmethod
    def stage_channels(variant: str) -> Tuple[int, int, int, int]:
        d = VARIANTS[variant][0]
        return (d // 4, d // 2, d, d)
