"""Backbone / decode-head registries — the extension mechanism.

The reference documents "Custom Backbones / Heads" as an edit-the-code
workflow (README.md:319-328: "replace ``ResNetBackbone`` in train.py
(lines 115-118)").  Here the same contract is a first-class plug-in
point: register a builder under a name, select it from YAML
(``model.backbone`` / ``model.head``), and every entry point (train,
infer, export, bench) picks it up — no framework edits.

Contract (same as the reference's, README.md:320-328):

* **Backbone** — callable Flax module mapping ``images [B, H, W, 3]`` →
  a sequence of four feature maps ``(C1, C2, C3, C4)`` at strides
  4 / 8 / 16 / 32 (or dilated equivalents).  Channel widths are free:
  the heads infer them from the inputs.
* **Head** — callable Flax module mapping the four feature maps →
  ``(logits [B, H/4, W/4, total_classes], embedding [B, h, w, D])``
  where the embedding is L2-normalized per pixel (the triplet loss
  assumes unit vectors).  A head with no embedding should return a
  dummy unit-norm tensor and the config should disable the triplet
  term.

Builders receive the assembled :class:`HieroSegmenter` module (so they
can read every ``model.*`` config field, including the free-form
``model.backbone_options`` / ``model.head_options`` mappings) and must
return the module instance **named** ``"backbone"`` / ``"head"`` so the
parameter tree keeps the reference-checkpoint-compatible top-level
layout (see models/segmenter.py docstring).

Example — a custom backbone in user code::

    from seghiero_tpu.models import register_backbone

    @register_backbone("my_net")
    def _build(seg):
        return MyNet(width=seg.backbone_options.get("width", 64),
                     dtype=seg.dtype, name="backbone")

then in YAML::

    model:
      backbone: my_net
      backbone_options: {width: 96}
"""

from __future__ import annotations

from typing import Callable, Dict

_BACKBONES: Dict[str, Callable] = {}
_HEADS: Dict[str, Callable] = {}


def register_backbone(name: str) -> Callable:
    """Decorator: register ``fn(seg: HieroSegmenter) -> nn.Module``."""

    def deco(fn: Callable) -> Callable:
        _BACKBONES[name] = fn
        return fn

    return deco


def register_head(name: str) -> Callable:
    """Decorator: register ``fn(seg: HieroSegmenter) -> nn.Module``."""

    def deco(fn: Callable) -> Callable:
        _HEADS[name] = fn
        return fn

    return deco


def backbone_builder(name: str) -> Callable:
    try:
        return _BACKBONES[name]
    except KeyError:
        raise ValueError(
            f"unknown model.backbone {name!r}; registered: "
            f"{sorted(_BACKBONES)}. Register custom backbones with "
            "seghiero_tpu.models.register_backbone."
        ) from None


def head_builder(name: str) -> Callable:
    try:
        return _HEADS[name]
    except KeyError:
        raise ValueError(
            f"unknown model.head {name!r}; registered: {sorted(_HEADS)}. "
            "Register custom heads with seghiero_tpu.models.register_head."
        ) from None


def list_backbones() -> list:
    return sorted(_BACKBONES)


def list_heads() -> list:
    return sorted(_HEADS)
