"""Swin Transformer backbone family (NHWC, TPU-native) — the
windowed-attention entry in the plug-in backbone registry.

    model:
      backbone: swin
      backbone_options: {variant: tiny, window: 7, drop_path_rate: 0.2}

Architecture per "Swin Transformer: Hierarchical Vision Transformer
using Shifted Windows" (Liu et al., arXiv:2103.14030): 4×4 patch embed,
four stages of blocks alternating window attention (W-MSA) and
shifted-window attention (SW-MSA, cyclic roll by window/2 with a static
region mask), each block LN→attn→residual, LN→4× GELU MLP→residual with
stochastic depth; 2×2 patch merging (concat → LN → Linear 4C→2C)
between stages. Stage outputs (taken BEFORE merging, each with its own
LayerNorm — the dense-prediction convention) are the registry's
(C1, C2, C3, C4) at strides 4/8/16/32.

TPU notes: window partition/reverse are pure reshape/transposes (no
gather); the shift is ``jnp.roll`` (ICI-free on one device, a cheap
collective-permute pattern under spatial sharding); the attention mask
and relative-position index are trace-time numpy constants (shapes are
static), so every step is one fused program of batched [nW·B, w², C]
MXU contractions. Inputs whose H/4 or W/4 are not window multiples are
zero-padded per window pass and sliced back, matching the published
implementations.

Parameter layout mirrors HuggingFace ``SwinModel``/``SwinBackbone``
naming semantics (split q/k/v); ``models/torch_convert.import_swin_backbone``
loads those checkpoints AND the official microsoft/Swin-Transformer
layout (fused ``attn.qkv``). ``output_stride`` is accepted and ignored
(no dilation mode exists; resolution recovery is the head's job).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.models.convnext import DropPath

VARIANTS = {
    #         embed_dim  depths        heads
    "tiny":  (96,  (2, 2, 6, 2),  (3, 6, 12, 24)),
    "small": (96,  (2, 2, 18, 2), (3, 6, 12, 24)),
    "base":  (128, (2, 2, 18, 2), (4, 8, 16, 32)),
    "large": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
}

MLP_RATIO = 4


def layer_norm(dtype, name=None):
    # official/HF use nn.LayerNorm default eps 1e-5
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] → [B·nH·nW, w·w, C] (H, W multiples of w)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def window_reverse(win: jnp.ndarray, w: int, b: int, h: int, wd: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition`."""
    c = win.shape[-1]
    x = win.reshape(b, h // w, wd // w, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wd, c)


def relative_position_index(w: int) -> np.ndarray:
    """Static [w², w²] index into the (2w−1)² bias table
    (arXiv:2103.14030 §3.2, the published coordinate trick)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)  # [2, w²]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(hp: int, wp: int, w: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask [nW, w², w²]: 0 within a contiguous region,
    −100 across regions (the published slice construction)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // w, w, wp // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)  # [nW, w²]
    diff = win[:, None, :] != win[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Multi-head attention inside w×w windows with a learned relative
    position bias; operates on [nWin·B, w², C]."""

    dim: int
    num_heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask) -> jnp.ndarray:
        nwb, n, c = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(x)
        q = q.reshape(nwb, n, self.num_heads, hd)
        k = k.reshape(nwb, n, self.num_heads, hd)
        v = v.reshape(nwb, n, self.num_heads, hd)

        table = self.param(
            "rel_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = relative_position_index(self.window)  # static numpy
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None]  # [1, h, n, n]

        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
        scores = scores * (hd ** -0.5) + bias.astype(jnp.float32)
        if mask is not None:  # [nW, n, n] static; tile over batch
            nw = mask.shape[0]
            scores = scores.reshape(-1, nw, self.num_heads, n, n)
            scores = scores + jnp.asarray(mask)[None, :, None]
            scores = scores.reshape(nwb, self.num_heads, n, n)
        attn = nn.softmax(scores, axis=-1).astype(self.dtype)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(nwb, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int  # 0 = W-MSA, window//2 = SW-MSA
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        b, h, wd, c = x.shape
        # always-partition semantics (HF SwinBackbone / mmseg): maps
        # smaller than the window are zero-padded up to it and shifted
        # blocks keep shifting — the classification-model trick of
        # shrinking the window is NOT applied (it would also invalidate
        # the window-sized relative-position bias table)
        w, shift = self.window, self.shift
        y = layer_norm(self.dtype, name="norm1")(x)

        # pad to window multiples (published maybe_pad), shift, partition
        ph, pw = (-h) % w, (-wd) % w
        hp, wp = h + ph, wd + pw
        if ph or pw:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = shift_attn_mask(hp, wp, w, shift)
        else:
            mask = None
        y = WindowAttention(
            self.dim, self.num_heads, w, dtype=self.dtype, name="attn"
        )(window_partition(y, w), mask)
        y = window_reverse(y, w, b, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if ph or pw:
            y = y[:, :h, :wd]
        x = x + DropPath(self.drop_path, name="drop_path1")(y, train)

        y = layer_norm(self.dtype, name="norm2")(x)
        y = nn.Dense(MLP_RATIO * self.dim, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class PatchMerging(nn.Module):
    """2×2 concat (order (0,0),(1,0),(0,1),(1,1) — the published one) →
    LN → Linear 4C→2C. Odd H/W are zero-padded first."""

    dim: int  # input C
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        y = layer_norm(self.dtype, name="norm")(y)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(y)


class SwinBackbone(nn.Module):
    """Returns (C1, C2, C3, C4) at strides 4/8/16/32 with channels
    (C, 2C, 4C, 8C), each stage output LayerNorm'd (out_norm{i} — the
    dense-prediction convention; identity-initialized when importing
    classification checkpoints that lack them)."""

    variant: str = "tiny"
    window: int = 7
    drop_path_rate: float = 0.0
    output_stride: int = 32  # accepted for interface uniformity
    dtype: Any = jnp.float32
    bn_axis: Any = None  # no BatchNorm in Swin; accepted for uniformity

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.variant not in VARIANTS:
            raise ValueError(
                f"swin variant must be one of {sorted(VARIANTS)}, "
                f"got {self.variant!r}"
            )
        dim0, depths, heads = VARIANTS[self.variant]
        total = sum(depths)
        dp = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]

        x = x.astype(self.dtype)
        x = nn.Conv(
            dim0, (4, 4), strides=(4, 4), dtype=self.dtype, name="patch_proj"
        )(x)
        x = layer_norm(self.dtype, name="patch_norm")(x)

        feats = []
        block_i = 0
        for s, (depth, nh) in enumerate(zip(depths, heads)):
            dim = dim0 * (2 ** s)
            if s > 0:
                x = PatchMerging(dim // 2, dtype=self.dtype, name=f"merge{s}")(x)
            for b in range(depth):
                x = SwinBlock(
                    dim,
                    nh,
                    self.window,
                    shift=0 if b % 2 == 0 else self.window // 2,
                    drop_path=dp[block_i],
                    dtype=self.dtype,
                    name=f"stage{s}_{b}",
                )(x, train)
                block_i += 1
            feats.append(layer_norm(self.dtype, name=f"out_norm{s}")(x))
        return tuple(feats)

    @staticmethod
    def stage_channels(variant: str) -> Tuple[int, int, int, int]:
        d = VARIANTS[variant][0]
        return (d, 2 * d, 4 * d, 8 * d)
