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


def _ln(sd: Dict, prefix: str) -> Dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]).reshape(-1),
        "bias": _np(sd[f"{prefix}.bias"]).reshape(-1),
    }


def import_convnext_backbone(sd: Dict, variant: str) -> Dict:
    """torch ConvNeXt state_dict → params for ``ConvNeXtBackbone``
    (LayerNorm-only: no batch_stats). Accepts BOTH published layouts:

      * facebookresearch/ConvNeXt: ``downsample_layers.{i}.{0,1}`` +
        ``stages.{i}.{j}.{dwconv,norm,pwconv1,pwconv2,gamma}``; the
        dense-prediction checkpoints' per-stage ``norm{i}`` out-norms
        are used when present, affine-identity (scale 1 / bias 0 — the
        features still get standardized; fine-tuning trains the affine)
        otherwise. Classification checkpoints' single final ``norm`` is
        ignored, like the classifier ``head``.
      * torchvision: ``features.{0,2,4,6}`` downsample /
        ``features.{1,3,5,7}.{j}.block.{0,2,3,5}`` + ``layer_scale``;
        ``classifier.*`` ignored.
    """
    from seghiero_tpu.models.convnext import VARIANTS

    depths, dims = VARIANTS[variant]
    fb = any(k.startswith("downsample_layers.") for k in sd)
    tv = any(k.startswith("features.") for k in sd)
    if not fb and not tv:
        raise ValueError(
            "unrecognized ConvNeXt state_dict layout: expected "
            "'downsample_layers.*/stages.*' (facebook) or 'features.*' "
            f"(torchvision) keys; got e.g. {sorted(sd)[:3]}"
        )

    def block_src(stage, j):
        if fb:
            p = f"stages.{stage}.{j}"
            return {
                "dw": f"{p}.dwconv",
                "norm": f"{p}.norm",
                "pw1": f"{p}.pwconv1",
                "pw2": f"{p}.pwconv2",
                "gamma": f"{p}.gamma",
            }
        p = f"features.{2 * stage + 1}.{j}.block"
        return {
            "dw": f"{p}.0",
            "norm": f"{p}.2",
            "pw1": f"{p}.3",
            "pw2": f"{p}.5",
            "gamma": f"features.{2 * stage + 1}.{j}.layer_scale",
        }

    def down_src(stage):  # stage >= 1 → (norm_prefix, conv_prefix)
        if fb:
            return f"downsample_layers.{stage}.0", f"downsample_layers.{stage}.1"
        return f"features.{2 * stage}.0", f"features.{2 * stage}.1"

    stem_conv, stem_norm = (
        ("downsample_layers.0.0", "downsample_layers.0.1")
        if fb
        else ("features.0.0", "features.0.1")
    )
    params: Dict = {
        "stem_conv": {
            "kernel": convert_conv(sd[f"{stem_conv}.weight"]),
            "bias": _np(sd[f"{stem_conv}.bias"]),
        },
        "stem_norm": _ln(sd, stem_norm),
    }
    for stage, (depth, dim) in enumerate(zip(depths, dims)):
        if stage > 0:
            norm_p, conv_p = down_src(stage)
            params[f"down{stage}_norm"] = _ln(sd, norm_p)
            params[f"down{stage}_conv"] = {
                "kernel": convert_conv(sd[f"{conv_p}.weight"]),
                "bias": _np(sd[f"{conv_p}.bias"]),
            }
        for j in range(depth):
            src = block_src(stage, j)
            if f"{src['dw']}.weight" not in sd:
                raise ValueError(
                    f"state_dict is missing stage {stage} block {j} "
                    f"({src['dw']}.weight) — wrong variant {variant!r}?"
                )
            blk = {
                "dwconv": {
                    "kernel": convert_depthwise(sd[f"{src['dw']}.weight"]),
                    "bias": _np(sd[f"{src['dw']}.bias"]),
                },
                "norm": _ln(sd, src["norm"]),
                "pwconv1": {
                    "kernel": _np(sd[f"{src['pw1']}.weight"]).T,
                    "bias": _np(sd[f"{src['pw1']}.bias"]),
                },
                "pwconv2": {
                    "kernel": _np(sd[f"{src['pw2']}.weight"]).T,
                    "bias": _np(sd[f"{src['pw2']}.bias"]),
                },
            }
            if src["gamma"] in sd:
                blk["gamma"] = _np(sd[src["gamma"]]).reshape(-1)
            else:
                # checkpoint trained without layer scale (e.g. ConvNeXt
                # V2): gamma*y degenerates to y, i.e. gamma = 1
                blk["gamma"] = np.ones((dim,), np.float32)
            params[f"stage{stage}_{j}"] = blk
        # dense-prediction out-norms; identity when the checkpoint is a
        # classification one (out_norm then just passes features through
        # an affine identity — fine-tuning trains it)
        if f"norm{stage}.weight" in sd:
            params[f"out_norm{stage}"] = _ln(sd, f"norm{stage}")
        else:
            params[f"out_norm{stage}"] = {
                "scale": np.ones((dim,), np.float32),
                "bias": np.zeros((dim,), np.float32),
            }
    return params


def import_hrnet_backbone(sd: Dict, variant: str) -> Tuple[Dict, Dict]:
    """Official HRNet state_dict (HRNet-Image-Classification /
    HRNet-Semantic-Segmentation backbone keys: ``conv1``/``bn1``,
    ``layer1.{i}``, ``transition{t}.{b}``,
    ``stage{s}.{m}.branches.{b}.{i}`` and
    ``stage{s}.{m}.fuse_layers.{i}.{j}``) → (params, batch_stats) for
    :class:`~seghiero_tpu.models.hrnet.HRNetBackbone`. Classifier /
    segmentation-head keys (``incre_modules``, ``last_layer``, ...) are
    ignored."""
    from seghiero_tpu.models.hrnet import VARIANTS

    if variant not in VARIANTS:
        raise ValueError(f"unknown hrnet variant {variant!r}")
    if "conv1.weight" not in sd:
        raise ValueError(
            "unrecognized HRNet state_dict layout: expected official "
            f"'conv1.weight' etc.; got e.g. {sorted(sd)[:3]}"
        )
    spec = VARIANTS[variant]
    params: Dict = {}
    stats: Dict = {}

    def put_conv(dst: str, src_key: str):
        _put(params, (dst, "kernel"), convert_conv(sd[src_key]))

    def put_bn(dst: str, src_prefix: str):
        p, s = _bn(sd, src_prefix)
        _put(params, (dst,), p)
        _put(stats, (dst,), s)

    for ci in (1, 2):
        put_conv(f"conv{ci}", f"conv{ci}.weight")
        put_bn(f"bn{ci}", f"bn{ci}")
    for i in range(spec["stage1_blocks"]):
        dst = f"layer1_{i}"
        for ci in (1, 2, 3):
            _put(
                params,
                (dst, f"conv{ci}", "kernel"),
                convert_conv(sd[f"layer1.{i}.conv{ci}.weight"]),
            )
            p, s = _bn(sd, f"layer1.{i}.bn{ci}")
            _put(params, (dst, f"bn{ci}"), p)
            _put(stats, (dst, f"bn{ci}"), s)
        if f"layer1.{i}.downsample.0.weight" in sd:
            _put(
                params,
                (dst, "down_conv", "kernel"),
                convert_conv(sd[f"layer1.{i}.downsample.0.weight"]),
            )
            p, s = _bn(sd, f"layer1.{i}.downsample.1")
            _put(params, (dst, "down_bn"), p)
            _put(stats, (dst, "down_bn"), s)

    # transition1 splits into two branches (branch 0 plain conv, branch 1
    # a Sequential-of-Sequential with one strided conv); transitions 2/3
    # only add the new lowest branch
    put_conv("transition1_0_conv", "transition1.0.0.weight")
    put_bn("transition1_0_bn", "transition1.0.1")
    put_conv("transition1_1_conv", "transition1.1.0.0.weight")
    put_bn("transition1_1_bn", "transition1.1.0.1")
    for t in (2, 3):
        put_conv(f"transition{t}_{t}_conv", f"transition{t}.{t}.0.0.weight")
        put_bn(f"transition{t}_{t}_bn", f"transition{t}.{t}.0.1")

    for stage, n_modules in zip((2, 3, 4), spec["modules"]):
        for m in range(n_modules):
            src_mod = f"stage{stage}.{m}"
            dst_mod = f"stage{stage}_m{m}"
            for b in range(stage):
                for i in range(spec["blocks"]):
                    src = f"{src_mod}.branches.{b}.{i}"
                    dst = f"branch{b}_{i}"
                    for ci in (1, 2):
                        _put(
                            params,
                            (dst_mod, dst, f"conv{ci}", "kernel"),
                            convert_conv(sd[f"{src}.conv{ci}.weight"]),
                        )
                        p, s = _bn(sd, f"{src}.bn{ci}")
                        _put(params, (dst_mod, dst, f"bn{ci}"), p)
                        _put(stats, (dst_mod, dst, f"bn{ci}"), s)
            for i in range(stage):
                for j in range(stage):
                    src = f"{src_mod}.fuse_layers.{i}.{j}"
                    if j > i:
                        _put(
                            params,
                            (dst_mod, f"fuse{i}_{j}_conv", "kernel"),
                            convert_conv(sd[f"{src}.0.weight"]),
                        )
                        p, s = _bn(sd, f"{src}.1")
                        _put(params, (dst_mod, f"fuse{i}_{j}_bn"), p)
                        _put(stats, (dst_mod, f"fuse{i}_{j}_bn"), s)
                    elif j < i:
                        for k in range(i - j):
                            _put(
                                params,
                                (dst_mod, f"fuse{i}_{j}_{k}_conv", "kernel"),
                                convert_conv(sd[f"{src}.{k}.0.weight"]),
                            )
                            p, s = _bn(sd, f"{src}.{k}.1")
                            _put(params, (dst_mod, f"fuse{i}_{j}_{k}_bn"), p)
                            _put(stats, (dst_mod, f"fuse{i}_{j}_{k}_bn"), s)
    return params, stats


def _dense(sd: Dict, prefix: str) -> Dict:
    # torch Linear [out, in] → Flax Dense kernel [in, out]
    d = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        d["bias"] = _np(sd[f"{prefix}.bias"])
    return d


def _conv_b(sd: Dict, prefix: str) -> Dict:
    d = {"kernel": convert_conv(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        d["bias"] = _np(sd[f"{prefix}.bias"])
    return d


def import_mit_backbone(sd: Dict, variant: str) -> Dict:
    """MiT (SegFormer encoder) state_dict → params for
    :class:`~seghiero_tpu.models.mit.MiTBackbone` (LayerNorm-only: no
    batch_stats). Accepts BOTH published layouts:

      * official NVlabs/SegFormer ``mit_b*.pth``:
        ``patch_embed{s}.{proj,norm}``, ``block{s}.{j}.{norm1,norm2}``,
        ``.attn.{q,kv,sr,norm,proj}`` (fused kv, split here),
        ``.mlp.{fc1,dwconv.dwconv,fc2}``, per-stage ``norm{s}``;
        classifier ``head.*`` ignored.
      * HuggingFace ``SegformerModel`` / ``SegformerFor*``:
        ``[segformer.]encoder.patch_embeddings.{i}.{proj,layer_norm}``,
        ``...block.{i}.{j}.layer_norm_{1,2}``,
        ``...attention.self.{query,key,value,sr,layer_norm}`` +
        ``attention.output.dense``, ``...mlp.{dense1,dwconv.dwconv,
        dense2}``, ``...layer_norm.{i}``; ``decode_head.*`` ignored.
    """
    from seghiero_tpu.models.mit import SR_RATIOS, VARIANTS

    if variant not in VARIANTS:
        raise ValueError(f"unknown mit variant {variant!r}")
    depths, dims = VARIANTS[variant]

    hf = any(".patch_embeddings." in k for k in sd)
    if hf:
        # normalize HF naming to the official one (kv kept split as k/v)
        out = {}
        for k, v in sd.items():
            k = k.replace("segformer.", "", 1)
            if not k.startswith("encoder."):
                continue
            k = k[len("encoder."):]
            for i in range(4):
                k = k.replace(f"patch_embeddings.{i}.", f"patch_embed{i + 1}.")
                k = k.replace(f"block.{i}.", f"block{i + 1}.")
            if k.startswith("layer_norm."):
                k = "norm" + str(int(k.split(".")[1]) + 1) + "." + k.split(".", 2)[2]
            k = (
                k.replace(".layer_norm.", ".norm.")
                .replace("layer_norm_1", "norm1")
                .replace("layer_norm_2", "norm2")
                .replace("attention.self.query", "attn.q")
                .replace("attention.self.key", "attn.k")
                .replace("attention.self.value", "attn.v")
                .replace("attention.self.sr", "attn.sr")
                .replace("attention.self.norm", "attn.norm")
                .replace("attention.output.dense", "attn.proj")
                .replace("mlp.dense1", "mlp.fc1")
                .replace("mlp.dense2", "mlp.fc2")
            )
            out[k] = v
        sd = out
    elif "patch_embed1.proj.weight" not in sd:
        raise ValueError(
            "unrecognized MiT state_dict layout: expected official "
            "'patch_embed1.proj.weight' or HF '...patch_embeddings.0...' "
            f"keys; got e.g. {sorted(sd)[:3]}"
        )

    params: Dict = {}
    for s in range(1, 5):
        params[f"patch_embed{s}_proj"] = _conv_b(sd, f"patch_embed{s}.proj")
        params[f"patch_embed{s}_norm"] = _ln(sd, f"patch_embed{s}.norm")
        params[f"norm{s}"] = _ln(sd, f"norm{s}")
        for j in range(depths[s - 1]):
            src = f"block{s}.{j}"
            if f"{src}.norm1.weight" not in sd:
                raise ValueError(
                    f"state_dict is missing stage {s} block {j} "
                    f"({src}.norm1.weight) — wrong variant {variant!r}?"
                )
            attn: Dict = {
                "q": _dense(sd, f"{src}.attn.q"),
                "proj": _dense(sd, f"{src}.attn.proj"),
            }
            if f"{src}.attn.kv.weight" in sd:  # official fused kv
                w = _np(sd[f"{src}.attn.kv.weight"])  # [2*dim, dim]
                dim = w.shape[1]
                attn["k"] = {"kernel": w[:dim].T}
                attn["v"] = {"kernel": w[dim:].T}
                if f"{src}.attn.kv.bias" in sd:
                    b = _np(sd[f"{src}.attn.kv.bias"])
                    attn["k"]["bias"] = b[:dim]
                    attn["v"]["bias"] = b[dim:]
            else:
                attn["k"] = _dense(sd, f"{src}.attn.k")
                attn["v"] = _dense(sd, f"{src}.attn.v")
            if SR_RATIOS[s - 1] > 1:
                attn["sr"] = _conv_b(sd, f"{src}.attn.sr")
                attn["sr_norm"] = _ln(sd, f"{src}.attn.norm")
            params[f"stage{s}_{j}"] = {
                "norm1": _ln(sd, f"{src}.norm1"),
                "norm2": _ln(sd, f"{src}.norm2"),
                "attn": attn,
                "mlp": {
                    "fc1": _dense(sd, f"{src}.mlp.fc1"),
                    "dwconv": {
                        "kernel": convert_depthwise(
                            sd[f"{src}.mlp.dwconv.dwconv.weight"]
                        ),
                        "bias": _np(sd[f"{src}.mlp.dwconv.dwconv.bias"]),
                    },
                    "fc2": _dense(sd, f"{src}.mlp.fc2"),
                },
            }
    return params


def import_swin_backbone(sd: Dict, variant: str) -> Dict:
    """Swin Transformer state_dict → params for
    :class:`~seghiero_tpu.models.swin.SwinBackbone` (LayerNorm-only).
    Accepts BOTH published layouts:

      * official microsoft/Swin-Transformer (and mmseg backbone ckpts):
        ``patch_embed.{proj,norm}``, ``layers.{s}.blocks.{j}.{norm1,
        norm2}``, ``.attn.{qkv,proj,relative_position_bias_table}``
        (fused qkv, split here), ``.mlp.{fc1,fc2}``,
        ``layers.{s}.downsample.{norm,reduction}``; classifier ``head.*``
        / final ``norm.*`` ignored.
      * HuggingFace ``SwinModel``/``SwinBackbone``/``SwinFor*``:
        ``[swin.]embeddings.*``, ``[swin.]encoder.layers.*`` with split
        ``attention.self.{query,key,value}``; ``SwinBackbone``'s
        ``hidden_states_norms.stage{i}`` become the per-stage out-norms.

    Per-stage out-norms absent from classification checkpoints are
    affine-identity (fine-tuning trains them), the same convention as
    the ConvNeXt importer.
    """
    from seghiero_tpu.models.swin import VARIANTS

    if variant not in VARIANTS:
        raise ValueError(f"unknown swin variant {variant!r}")
    dim0, depths, _ = VARIANTS[variant]

    hf = any("patch_embeddings.projection" in k for k in sd)
    if hf:
        out = {}
        for k, v in sd.items():
            k = k.replace("swin.", "", 1) if k.startswith("swin.") else k
            k = k.replace(
                "embeddings.patch_embeddings.projection", "patch_embed.proj"
            ).replace("embeddings.norm", "patch_embed.norm")
            if k.startswith("encoder.layers."):
                k = k[len("encoder."):]
            if k.startswith("hidden_states_norms.stage"):
                i = int(k.split(".")[1][len("stage"):]) - 1
                out[f"out_norm{i}." + k.split(".", 2)[2]] = v
                continue
            k = (
                k.replace("layernorm_before", "norm1")
                .replace("layernorm_after", "norm2")
                .replace("attention.self.query", "attn.q")
                .replace("attention.self.key", "attn.k")
                .replace("attention.self.value", "attn.v")
                .replace(
                    "attention.self.relative_position_bias_table",
                    "attn.relative_position_bias_table",
                )
                .replace("attention.output.dense", "attn.proj")
                .replace("intermediate.dense", "mlp.fc1")
                .replace("output.dense", "mlp.fc2")
            )
            out[k] = v
        sd = out
    elif "patch_embed.proj.weight" not in sd:
        raise ValueError(
            "unrecognized Swin state_dict layout: expected official "
            "'patch_embed.proj.weight' or HF '...patch_embeddings."
            f"projection...' keys; got e.g. {sorted(sd)[:3]}"
        )

    params: Dict = {
        "patch_proj": _conv_b(sd, "patch_embed.proj"),
        "patch_norm": _ln(sd, "patch_embed.norm"),
    }
    for s, depth in enumerate(depths):
        dim = dim0 * (2 ** s)
        if s > 0:
            src = f"layers.{s - 1}.downsample"
            params[f"merge{s}"] = {
                "norm": _ln(sd, f"{src}.norm"),
                "reduction": {"kernel": _np(sd[f"{src}.reduction.weight"]).T},
            }
        for j in range(depth):
            src = f"layers.{s}.blocks.{j}"
            if f"{src}.norm1.weight" not in sd:
                raise ValueError(
                    f"state_dict is missing stage {s} block {j} "
                    f"({src}.norm1.weight) — wrong variant {variant!r}?"
                )
            if f"{src}.attn.qkv.weight" in sd:  # official fused qkv
                w = _np(sd[f"{src}.attn.qkv.weight"])  # [3*dim, dim]
                attn = {
                    "q": {"kernel": w[:dim].T},
                    "k": {"kernel": w[dim : 2 * dim].T},
                    "v": {"kernel": w[2 * dim :].T},
                }
                if f"{src}.attn.qkv.bias" in sd:
                    b = _np(sd[f"{src}.attn.qkv.bias"])
                    attn["q"]["bias"] = b[:dim]
                    attn["k"]["bias"] = b[dim : 2 * dim]
                    attn["v"]["bias"] = b[2 * dim :]
            else:
                attn = {
                    "q": _dense(sd, f"{src}.attn.q"),
                    "k": _dense(sd, f"{src}.attn.k"),
                    "v": _dense(sd, f"{src}.attn.v"),
                }
            attn["proj"] = _dense(sd, f"{src}.attn.proj")
            attn["rel_bias_table"] = _np(
                sd[f"{src}.attn.relative_position_bias_table"]
            )
            params[f"stage{s}_{j}"] = {
                "norm1": _ln(sd, f"{src}.norm1"),
                "norm2": _ln(sd, f"{src}.norm2"),
                "attn": attn,
                "fc1": _dense(sd, f"{src}.mlp.fc1"),
                "fc2": _dense(sd, f"{src}.mlp.fc2"),
            }
        # per-stage out-norms: SwinBackbone/mmseg ckpts have them
        # (normalized to out_norm{s} above / norm{s} in mmseg layout)
        for cand in (f"out_norm{s}", f"norm{s}"):
            if f"{cand}.weight" in sd:
                params[f"out_norm{s}"] = _ln(sd, cand)
                break
        else:
            params[f"out_norm{s}"] = {
                "scale": np.ones((dim,), np.float32),
                "bias": np.zeros((dim,), np.float32),
            }
    return params


def import_vit_backbone(sd: Dict, variant: str, pos_grid: int = 0) -> Dict:
    """Plain ViT state_dict → encoder params for
    :class:`~seghiero_tpu.models.vit.ViTBackbone` (LayerNorm-only: no
    batch_stats). Returns ONLY encoder weights — the ViTDet pyramid
    (``fpn*``) does not exist in ViT checkpoints, so the caller merges
    the result over the freshly-initialized tree. Accepts THREE
    published layouts:

      * timm ``vision_transformer.py`` (also DeiT / MAE encoders):
        ``patch_embed.proj``, ``cls_token``, ``pos_embed``,
        ``blocks.{i}.{norm1,norm2}``, ``.attn.{qkv,proj}`` (fused qkv),
        ``.mlp.{fc1,fc2}``, optional ``.ls{1,2}.gamma``, final ``norm``;
        classifier ``head.*`` ignored.
      * HuggingFace ``ViTModel``: ``[vit.]embeddings.{cls_token,
        position_embeddings,patch_embeddings.projection}``,
        ``encoder.layer.{i}.attention.attention.{query,key,value}`` +
        ``attention.output.dense``, ``intermediate.dense`` /
        ``output.dense``, ``layernorm_{before,after}``, final
        ``layernorm``.
      * HuggingFace ``Dinov2Model``: as ViTModel plus
        ``layer_scale{1,2}.lambda1`` (→ ``ls{1,2}_gamma``),
        ``mlp.fc{1,2}``, and optional ``embeddings.register_tokens``.
    """
    from seghiero_tpu.models.vit import VARIANTS

    if variant not in VARIANTS:
        raise ValueError(f"unknown vit variant {variant!r}")
    dim, depth, _ = VARIANTS[variant]

    hf = any("embeddings.patch_embeddings" in k for k in sd)
    if hf:
        # normalize both HF layouts (ViTModel / Dinov2Model) to timm's
        out = {}
        for k, v in sd.items():
            for pref in ("vit.", "dinov2."):
                if k.startswith(pref):
                    k = k[len(pref):]
            if k.startswith("embeddings."):
                k = (
                    k.replace("embeddings.patch_embeddings.projection",
                              "patch_embed.proj")
                    .replace("embeddings.position_embeddings", "pos_embed")
                    .replace("embeddings.cls_token", "cls_token")
                    .replace("embeddings.register_tokens", "reg_tokens")
                )
            elif k.startswith("encoder.layer."):
                k = k.replace("encoder.layer.", "blocks.", 1)
                k = (
                    k.replace(".attention.attention.query", ".attn.q")
                    .replace(".attention.attention.key", ".attn.k")
                    .replace(".attention.attention.value", ".attn.v")
                    .replace(".attention.output.dense", ".attn.proj")
                    .replace(".intermediate.dense", ".mlp.fc1")
                    .replace(".output.dense", ".mlp.fc2")
                    .replace(".layernorm_before", ".norm1")
                    .replace(".layernorm_after", ".norm2")
                    .replace(".layer_scale1.lambda1", ".ls1.gamma")
                    .replace(".layer_scale2.lambda1", ".ls2.gamma")
                )
            elif k == "layernorm.weight":
                k = "norm.weight"
            elif k == "layernorm.bias":
                k = "norm.bias"
            else:
                continue  # pooler / classifier heads
            out[k] = v
        sd = out
    elif "patch_embed.proj.weight" not in sd:
        raise ValueError(
            "unrecognized ViT state_dict layout: expected timm "
            "'patch_embed.proj.weight' or HF "
            "'...embeddings.patch_embeddings...' keys; "
            f"got e.g. {sorted(sd)[:3]}"
        )

    params: Dict = {
        "patch_embed": _conv_b(sd, "patch_embed.proj"),
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "norm": _ln(sd, "norm"),
    }
    if params["pos_embed"].shape[-1] != dim:
        raise ValueError(
            f"state_dict embed dim {params['pos_embed'].shape[-1]} does "
            f"not match vit variant {variant!r} (dim {dim})"
        )
    if pos_grid:
        # catch a pos_grid/checkpoint mismatch HERE with the knob named,
        # not later as an opaque flax ScopeParamShapeError at first apply
        # (e.g. DINOv2's 518//14=37 grid vs the 224//16=14 default)
        want = 1 + pos_grid * pos_grid
        got = params["pos_embed"].shape[1]
        if got != want:
            import math

            side = math.isqrt(got - 1)
            hint = (
                f"; the checkpoint looks like a {side}x{side} grid — set "
                f"backbone_options.pos_grid: {side}"
                if side * side == got - 1
                else ""
            )
            raise ValueError(
                f"checkpoint pos_embed has {got} tokens but "
                f"backbone_options.pos_grid={pos_grid} expects {want} "
                f"(1 + {pos_grid}²){hint}"
            )
    if "reg_tokens" in sd:
        params["reg_tokens"] = _np(sd["reg_tokens"])
    for i in range(depth):
        src = f"blocks.{i}"
        if f"{src}.norm1.weight" not in sd:
            raise ValueError(
                f"state_dict is missing block {i} ({src}.norm1.weight) — "
                f"wrong variant {variant!r}?"
            )
        if f"{src}.attn.qkv.weight" in sd:  # timm fused qkv
            attn = {
                "qkv": _dense(sd, f"{src}.attn.qkv"),
                "proj": _dense(sd, f"{src}.attn.proj"),
            }
        else:  # HF split q/k/v → fuse along the output axis (q,k,v)
            w = np.concatenate(
                [_np(sd[f"{src}.attn.{n}.weight"]).T for n in ("q", "k", "v")],
                axis=1,
            )
            attn = {"qkv": {"kernel": w}, "proj": _dense(sd, f"{src}.attn.proj")}
            if f"{src}.attn.q.bias" in sd:
                attn["qkv"]["bias"] = np.concatenate(
                    [_np(sd[f"{src}.attn.{n}.bias"]) for n in ("q", "k", "v")]
                )
        blk: Dict = {
            "norm1": _ln(sd, f"{src}.norm1"),
            "norm2": _ln(sd, f"{src}.norm2"),
            "attn": attn,
            "mlp_fc1": _dense(sd, f"{src}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{src}.mlp.fc2"),
        }
        if f"{src}.ls1.gamma" in sd:
            blk["ls1_gamma"] = _np(sd[f"{src}.ls1.gamma"]).reshape(dim)
            blk["ls2_gamma"] = _np(sd[f"{src}.ls2.gamma"]).reshape(dim)
        params[f"block{i}"] = blk
    return params


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


# ---------------------------------------------------------------------------
# Reverse direction: our variables → reference-named torch state dicts
# (lets a user switch BACK to the reference, or run its infer.py on a
# model trained here).
# ---------------------------------------------------------------------------


def _t(a):
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))


def _conv_back(kernel) -> "object":
    return _t(np.asarray(kernel).transpose(3, 2, 0, 1))


def _bn_back(sd: Dict, prefix: str, params: Dict, stats: Dict):
    sd[f"{prefix}.weight"] = _t(params["scale"])
    sd[f"{prefix}.bias"] = _t(params["bias"])
    sd[f"{prefix}.running_mean"] = _t(stats["mean"])
    sd[f"{prefix}.running_var"] = _t(stats["var"])
    import torch

    sd[f"{prefix}.num_batches_tracked"] = torch.zeros((), dtype=torch.long)


def export_reference_backbone(params: Dict, stats: Dict, depth: int) -> Dict:
    """Our backbone variables → the reference wrapper's state_dict naming
    (stem_conv/stem_bn/layerN..., resnet.py:45-54)."""
    from seghiero_tpu.models.resnet import BOTTLENECK_DEPTHS, STAGE_BLOCKS

    sd: Dict = {"stem_conv.weight": _conv_back(params["stem_conv"]["kernel"])}
    _bn_back(sd, "stem_bn", params["stem_bn"], stats["stem_bn"])
    n_convs = 3 if depth in BOTTLENECK_DEPTHS else 2
    for stage, n_blocks in enumerate(STAGE_BLOCKS[depth], start=1):
        for b in range(n_blocks):
            src = f"layer{stage}_{b}"
            dst = f"layer{stage}.{b}"
            for ci in range(1, n_convs + 1):
                sd[f"{dst}.conv{ci}.weight"] = _conv_back(
                    params[src][f"conv{ci}"]["kernel"]
                )
                _bn_back(sd, f"{dst}.bn{ci}", params[src][f"bn{ci}"], stats[src][f"bn{ci}"])
            if "down_conv" in params[src]:
                sd[f"{dst}.downsample.0.weight"] = _conv_back(
                    params[src]["down_conv"]["kernel"]
                )
                _bn_back(
                    sd, f"{dst}.downsample.1", params[src]["down_bn"], stats[src]["down_bn"]
                )
    return sd


def _export_sepconv(sd: Dict, dst: str, params: Dict, stats: Dict):
    kernel = np.asarray(params["depthwise"]["kernel"])  # [k,k,1,C]
    sd[f"{dst}.depthwise.weight"] = _t(kernel.transpose(3, 2, 0, 1))
    _bn_back(sd, f"{dst}.bn_dw", params["bn_dw"], stats["bn_dw"])
    sd[f"{dst}.pointwise.weight"] = _conv_back(params["pointwise"]["kernel"])
    _bn_back(sd, f"{dst}.bn_pw", params["bn_pw"], stats["bn_pw"])


def export_reference_head(params: Dict, stats: Dict, proj_type: str = "convmlp") -> Dict:
    """Our head variables → reference DepthwiseSeparableASPPContrastHead
    state_dict (incl. a zero ``step`` buffer, which it registers)."""
    import torch

    sd: Dict = {"step": torch.zeros(1, dtype=torch.long)}
    if proj_type == "convmlp":
        sd["proj_head.proj.0.weight"] = _conv_back(params["proj_head"]["fc1"]["kernel"])
        _bn_back(sd, "proj_head.proj.1", params["proj_head"]["bn"], stats["proj_head"]["bn"])
        sd["proj_head.proj.3.weight"] = _conv_back(params["proj_head"]["fc2"]["kernel"])
    else:
        sd["proj_head.proj.weight"] = _conv_back(params["proj_head"]["proj"]["kernel"])

    sd["aspp.branches.0.0.weight"] = _conv_back(params["aspp"]["branch0_conv"]["kernel"])
    _bn_back(sd, "aspp.branches.0.1", params["aspp"]["branch0_bn"], stats["aspp"]["branch0_bn"])
    i = 1
    while f"branch{i}" in params["aspp"]:
        _export_sepconv(
            sd, f"aspp.branches.{i}.0", params["aspp"][f"branch{i}"], stats["aspp"][f"branch{i}"]
        )
        i += 1
    sd["aspp.image_pool_conv.0.weight"] = _conv_back(
        params["aspp"]["image_pool_conv"]["kernel"]
    )
    _bn_back(
        sd, "aspp.image_pool_conv.1", params["aspp"]["image_pool_bn"], stats["aspp"]["image_pool_bn"]
    )
    sd["bottleneck.0.weight"] = _conv_back(params["bottleneck_conv"]["kernel"])
    _bn_back(sd, "bottleneck.1", params["bottleneck_bn"], stats["bottleneck_bn"])
    if "c1_conv" in params:
        sd["c1_bottleneck.0.weight"] = _conv_back(params["c1_conv"]["kernel"])
        _bn_back(sd, "c1_bottleneck.1", params["c1_bn"], stats["c1_bn"])
    for j in range(2):
        _export_sepconv(
            sd, f"sep_bottleneck.{j}", params[f"sep_bottleneck{j}"], stats[f"sep_bottleneck{j}"]
        )
    sd["cls_seg.weight"] = _conv_back(params["cls_seg"]["kernel"])
    sd["cls_seg.bias"] = _t(params["cls_seg"]["bias"])
    return sd


def export_reference_aux_head(params: Dict, stats: Dict) -> Dict:
    sd: Dict = {"0.weight": _conv_back(params["conv"]["kernel"])}
    _bn_back(sd, "1", params["bn"], stats["bn"])
    return sd


def export_reference_checkpoint(
    variables: Dict, depth: int, proj_type: str = "convmlp", epoch: int = 0, config=None
) -> Dict:
    """Full reverse of ``import_reference_checkpoint``: a dict with the
    reference's checkpoint keys (train.py:421-428) loadable by its
    infer.py (backbone + aspp_head)."""
    params, stats = variables["params"], variables["batch_stats"]
    out = {
        "epoch": epoch,
        "backbone_state_dict": export_reference_backbone(
            params["backbone"], stats["backbone"], depth
        ),
        "aspp_head_state_dict": export_reference_head(
            params["head"], stats["head"], proj_type
        ),
        "config": config or {},
    }
    if "aux_head" in params:
        out["aux_head_state_dict"] = export_reference_aux_head(
            params["aux_head"], stats["aux_head"]
        )
    return out
