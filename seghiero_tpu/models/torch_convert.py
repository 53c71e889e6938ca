"""PyTorch → Flax weight conversion.

Two jobs:
  1. ``import_torchvision_backbone``: convert a torchvision ResNet
     ``state_dict`` (the pretrained weights the reference loads at
     resnet.py:34-39) into our NHWC Flax backbone variables.
  2. ``import_reference_checkpoint``: convert a full reference training
     checkpoint (the dict torch.save'd at train.py:421-428 with keys
     ``backbone_state_dict`` / ``aspp_head_state_dict`` /
     ``aux_head_state_dict``) into our ``HieroSegmenter`` variables — a
     drop-in migration path for existing SegHiero users.

Layout rules:
  * conv weight  [O, I, kh, kw]  → [kh, kw, I, O]
  * depthwise    [C, 1, kh, kw]  → [kh, kw, 1, C] (feature_group_count=C)
  * BatchNorm weight/bias → scale/bias (params); running_mean/var →
    mean/var (batch_stats)

torch is imported lazily — conversion is an offline tool, the training
path never needs it.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def convert_depthwise(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # [C,1,k,k] -> [k,k,1,C]


def _bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _put(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_torchvision_backbone(sd: Dict, depth: int) -> Tuple[Dict, Dict]:
    """torchvision ResNet state_dict → (params, batch_stats) for
    ``ResNetBackbone``. Accepts both torchvision naming (``conv1``,
    ``bn1``) and the reference wrapper's (``stem_conv``, ``stem_bn``,
    resnet.py:45-48); classifier keys (``fc.*``) are ignored, mirroring
    the reference stripping avgpool/fc (resnet.py:41-44)."""
    from seghiero_tpu.models.resnet import BOTTLENECK_DEPTHS, STAGE_BLOCKS

    # normalize reference-wrapper names to torchvision names
    sd = {
        k.replace("stem_conv", "conv1").replace("stem_bn", "bn1").replace(
            "stem_pool", "maxpool"
        ): v
        for k, v in sd.items()
    }

    params: Dict = {}
    stats: Dict = {}
    _put(params, ("stem_conv", "kernel"), convert_conv(sd["conv1.weight"]))
    p, s = _bn(sd, "bn1")
    _put(params, ("stem_bn",), p)
    _put(stats, ("stem_bn",), s)

    n_convs = 3 if depth in BOTTLENECK_DEPTHS else 2
    for stage, n_blocks in enumerate(STAGE_BLOCKS[depth], start=1):
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            for ci in range(1, n_convs + 1):
                _put(
                    params,
                    (dst, f"conv{ci}", "kernel"),
                    convert_conv(sd[f"{src}.conv{ci}.weight"]),
                )
                p, s = _bn(sd, f"{src}.bn{ci}")
                _put(params, (dst, f"bn{ci}"), p)
                _put(stats, (dst, f"bn{ci}"), s)
            if f"{src}.downsample.0.weight" in sd:
                _put(
                    params,
                    (dst, "down_conv", "kernel"),
                    convert_conv(sd[f"{src}.downsample.0.weight"]),
                )
                p, s = _bn(sd, f"{src}.downsample.1")
                _put(params, (dst, "down_bn"), p)
                _put(stats, (dst, "down_bn"), s)
    return params, stats


def _convert_sepconv(sd: Dict, src: str) -> Tuple[Dict, Dict]:
    """Reference DepthwiseSeparableConv (sep_aspp_contrast_head.py:33-62)
    → our module subtree."""
    params: Dict = {}
    stats: Dict = {}
    params["depthwise"] = {"kernel": convert_depthwise(sd[f"{src}.depthwise.weight"])}
    p, s = _bn(sd, f"{src}.bn_dw")
    params["bn_dw"], stats["bn_dw"] = p, s
    params["pointwise"] = {"kernel": convert_conv(sd[f"{src}.pointwise.weight"])}
    p, s = _bn(sd, f"{src}.bn_pw")
    params["bn_pw"], stats["bn_pw"] = p, s
    return params, stats


def import_reference_head(sd: Dict, proj_type: str = "convmlp") -> Tuple[Dict, Dict]:
    """Reference DepthwiseSeparableASPPContrastHead state_dict → our
    ``SepASPPContrastHead`` variables. The unused ``step`` buffer
    (sep_aspp_contrast_head.py:169) is ignored."""
    params: Dict = {}
    stats: Dict = {}

    # projection head (:6-30): convmlp = Sequential[conv, bn, relu, conv]
    if proj_type == "convmlp":
        ph_p: Dict = {"fc1": {"kernel": convert_conv(sd["proj_head.proj.0.weight"])}}
        p, s = _bn(sd, "proj_head.proj.1")
        ph_p["bn"] = p
        ph_p["fc2"] = {"kernel": convert_conv(sd["proj_head.proj.3.weight"])}
        params["proj_head"] = ph_p
        stats["proj_head"] = {"bn": s}
    else:
        params["proj_head"] = {
            "proj": {"kernel": convert_conv(sd["proj_head.proj.weight"])}
        }

    # ASPP (:65-132): branches.0 = 1x1 Sequential[conv,bn,relu];
    # branches.i>=1 = Sequential[DepthwiseSeparableConv]
    aspp_p: Dict = {}
    aspp_s: Dict = {}
    aspp_p["branch0_conv"] = {"kernel": convert_conv(sd["aspp.branches.0.0.weight"])}
    p, s = _bn(sd, "aspp.branches.0.1")
    aspp_p["branch0_bn"], aspp_s["branch0_bn"] = p, s
    i = 1
    while f"aspp.branches.{i}.0.depthwise.weight" in sd:
        p, s = _convert_sepconv(sd, f"aspp.branches.{i}.0")
        aspp_p[f"branch{i}"], aspp_s[f"branch{i}"] = p, s
        i += 1
    aspp_p["image_pool_conv"] = {
        "kernel": convert_conv(sd["aspp.image_pool_conv.0.weight"])
    }
    p, s = _bn(sd, "aspp.image_pool_conv.1")
    aspp_p["image_pool_bn"], aspp_s["image_pool_bn"] = p, s
    params["aspp"], stats["aspp"] = aspp_p, aspp_s

    # post-ASPP bottleneck (:180-184)
    params["bottleneck_conv"] = {"kernel": convert_conv(sd["bottleneck.0.weight"])}
    p, s = _bn(sd, "bottleneck.1")
    params["bottleneck_bn"], stats["bottleneck_bn"] = p, s

    # C1 skip (:187-195)
    if "c1_bottleneck.0.weight" in sd:
        params["c1_conv"] = {"kernel": convert_conv(sd["c1_bottleneck.0.weight"])}
        p, s = _bn(sd, "c1_bottleneck.1")
        params["c1_bn"], stats["c1_bn"] = p, s

    # sep bottlenecks (:199-204)
    for j in range(2):
        p, s = _convert_sepconv(sd, f"sep_bottleneck.{j}")
        params[f"sep_bottleneck{j}"], stats[f"sep_bottleneck{j}"] = p, s

    # classifier (:207) — the only conv with a bias
    params["cls_seg"] = {
        "kernel": convert_conv(sd["cls_seg.weight"]),
        "bias": _np(sd["cls_seg.bias"]),
    }
    return params, stats


def import_reference_aux_head(sd: Dict) -> Tuple[Dict, Dict]:
    """Aux Sequential[conv, bn, relu] (train.py:168-173) → our AuxHead."""
    params = {"conv": {"kernel": convert_conv(sd["0.weight"])}}
    p, s = _bn(sd, "1")
    params["bn"] = p
    return params, {"bn": s}


def import_reference_checkpoint(ckpt: Dict, depth: int, proj_type: str = "convmlp"):
    """Full reference training checkpoint (train.py:421-428) → variables
    dict for ``HieroSegmenter`` ({'params': ..., 'batch_stats': ...})."""
    params: Dict = {}
    stats: Dict = {}
    p, s = import_torchvision_backbone(ckpt["backbone_state_dict"], depth)
    params["backbone"], stats["backbone"] = p, s
    p, s = import_reference_head(ckpt["aspp_head_state_dict"], proj_type)
    params["head"], stats["head"] = p, s
    if "aux_head_state_dict" in ckpt:
        p, s = import_reference_aux_head(ckpt["aux_head_state_dict"])
        params["aux_head"], stats["aux_head"] = p, s
    return {"params": params, "batch_stats": stats}


def load_torch_file(path: str) -> Dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
