"""Validated configuration.

Accepts the reference's YAML schema *verbatim* (example-config.yaml:1-51 of
/root/reference) — sections ``dataset``, ``classes``, ``model``,
``training``, ``transform``, ``output`` — and raises explicit errors for
the known sharp edges instead of silently misbehaving. GPU-specific keys
(``training.device``, ``training.gpus``; consumed at train.py:109-115 of
the reference) are accepted and ignored with a note: device placement on
TPU is the JAX runtime's job.

Extensions beyond the reference schema (all optional, all with defaults
matching reference behavior) live under their reference sections so a
reference config runs unchanged:

``model``:
  - ``depth``            backbone depth (default 101, mirroring the
                         hardcoded ``depth=101`` at train.py:155; the
                         reference README claims 18–152, README.md:95,
                         while its code accepts only 50/101 — we support
                         18/34/50/101/152)
  - ``pretrained``       bool / path to a torchvision ``.pth`` to convert
  - ``aspp_channels``, ``dilations``, ``proj_dim``, ``proj_type``,
    ``c1_channels``      head hyperparameters (defaults = train.py:157-166)
  - ``dtype``            compute dtype: "bfloat16" (default) or "float32"

``training``:
  - ``rmi_radius`` / ``rmi_pool_way`` / ``rmi_pool_size`` /
    ``rmi_pool_stride``  (reference train.py:226-229)
  - ``fine_weight``      global loss weight (train.py:199,230)
  - ``triplet_schedule_unit``  "step" (default, fixed semantics) or
                         "epoch" (bug-parity with train.py:287 which feeds
                         the *epoch* index into iteration-scale thresholds)
  - ``seed``, ``log_every``, ``eval_every``
  - ``mesh``             e.g. ``{data: -1, model: 1}``; -1 = all devices
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Sequence, Tuple  # noqa: F401

import yaml

from seghiero_tpu.hierarchy import Hierarchy

_KNOWN_SECTIONS = {"dataset", "classes", "model", "training", "transform", "output"}


def _as_tuple2(v, name) -> Optional[Tuple[int, int]]:
    if v is None:
        return None
    if not (isinstance(v, (list, tuple)) and len(v) == 2):
        raise ValueError(f"{name} must be a [H, W] pair, got {v!r}")
    return (int(v[0]), int(v[1]))


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    root: str = ""
    train_image_subdir: str = ""
    train_mask_subdir: str = ""
    val_image_subdir: str = ""
    val_mask_subdir: str = ""
    # extension: "synthetic" generates an in-memory shapes dataset (no disk)
    kind: str = "files"
    synthetic_size: int = 64
    # extension: "raw" decodes each (image, mask) pair ONCE at the config
    # resize and memory-maps the raw arrays (data/cache.py); later epochs
    # read at memcpy speed instead of re-running PNG decode (~13 ms/image
    # at 512² — the host-side train bottleneck on small-core hosts).
    # Augmentation still runs per epoch on the cached arrays.
    cache: str = "none"  # "none" | "raw"
    # where the raw cache lives; default ~/.cache/seghiero_tpu/<fingerprint>
    cache_dir: Optional[str] = None

    @classmethod
    def from_dict(cls, d: dict) -> "DatasetConfig":
        cache = str(d.get("cache", "none"))
        if cache not in ("none", "raw"):
            raise ValueError(f"dataset.cache must be none|raw, got {cache!r}")
        cache_dir = d.get("cache_dir")
        if d.get("kind", "files") == "synthetic":
            return cls(kind="synthetic", synthetic_size=int(d.get("synthetic_size", 64)))

        def sub(split, key):
            # lstrip mirrors dataloader.py:100-101 so absolute-looking
            # subdirs still join under root
            return str(d.get(split, {}).get(key, "")).lstrip("/\\")

        return cls(
            root=str(d.get("root", "")),
            train_image_subdir=sub("train", "image_subdir"),
            train_mask_subdir=sub("train", "mask_subdir"),
            val_image_subdir=sub("val", "image_subdir"),
            val_mask_subdir=sub("val", "mask_subdir"),
            cache=cache,
            cache_dir=str(cache_dir) if cache_dir else None,
        )

    def image_dir(self, split: str) -> str:
        sub = self.train_image_subdir if split == "train" else self.val_image_subdir
        return os.path.join(self.root, sub)

    def mask_dir(self, split: str) -> str:
        sub = self.train_mask_subdir if split == "train" else self.val_mask_subdir
        return os.path.join(self.root, sub)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # informational in the reference (README.md:238-243); we parse it to a
    # depth when it looks like "resnet-101" and `depth` is not given.
    pretrained_model: str = "resnet-101"
    depth: int = 101
    pretrained: Any = False  # False | True | path to torchvision .pth
    # decode-head family: "sep_aspp_contrast" (reference default),
    # "aspp" (plain DeepLabV3, the reference's dead aspp_head.py made
    # live), "segformer_mlp" (all-MLP, pairs with backbone "mit") or
    # "upernet" (PSP+FPN, pairs with "swin"/"convnext") — see
    # models/decode_heads.py
    head: str = "sep_aspp_contrast"
    # backbone family: "resnet" (reference parity), "convnext"
    # (models/convnext.py; variant via backbone_options), or any name
    # registered via seghiero_tpu.models.register_backbone
    # (README.md:319-328 "Custom Backbones / Heads" made a first-class
    # plug-in point — see models/registry.py)
    backbone: str = "resnet"
    # free-form option mappings handed to custom registry builders
    backbone_options: Any = None
    head_options: Any = None
    # backbone output stride: 32 (reference parity) | 16 | 8 (dilated
    # stages, the DeepLab configuration — better mIoU, more compute)
    output_stride: int = 32
    # stem evaluation: "conv7" (plain 7×7/s2) | "s2d" (exact space-to-depth
    # rewrite; same parameter tree, so checkpoints work in either mode).
    # Measured on v5e at 512²/b8 bf16: conv7 fwd+weight-grad 2.6 ms vs s2d
    # 3.9 ms — XLA already handles the first-layer case well (no input
    # grad), so conv7 is the default; s2d wins 5.5× only when the stem's
    # INPUT gradient is needed (45.3 vs 8.3 ms — e.g. adversarial /
    # saliency / distillation-through-input setups).
    stem: str = "conv7"
    in_channels: int = 2048
    c1_in_channels: int = 256
    c1_channels: int = 48
    aspp_channels: int = 512
    dilations: Tuple[int, ...] = (1, 12, 24, 36)
    proj_dim: int = 256
    proj_type: str = "convmlp"
    dtype: str = "bfloat16"
    # gradient checkpointing (rematerialization): recompute the
    # backbone's internal activations during backward instead of
    # storing them — activation memory for the backbone drops to its
    # four output feature maps at the cost of one extra backbone
    # forward per step. The standard HBM-for-FLOPs trade for large
    # inputs / deep backbones; exact same math (tested).
    remat: bool = False
    # depthwise-conv lowering for the head's separable convs: "xla"
    # (default — measured faster end-to-end in BOTH training and
    # serving; XLA fuses the depthwise into its conv pipeline) or
    # "pallas" (the VPU kernel, kept as the measured experiment
    # switch — see ops/pallas/depthwise.py for the numbers).
    # Non-3×3/strided/dilated cases always fall back to XLA.
    depthwise_backend: str = "xla"
    # inference "hierarchy decode" (upsample + per-level argmax,
    # infer.py:298-312): "xla" (default — measured faster END-TO-END in
    # both bf16 and f32; XLA fuses/overlaps the decode with the model
    # forward) or "pallas" (the fused 4×-upsample+argmax kernel, which
    # wins only in isolation at f32 — measurements in
    # ops/pallas/upsample_argmax.py). Non-4× outputs always take XLA.
    argmax_backend: str = "xla"

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        d = dict(d or {})
        depth = d.get("depth")
        name = str(d.get("pretrained_model", "resnet-101"))
        if depth is None:
            tail = name.rsplit("-", 1)[-1].replace("resnet", "")
            depth = int(tail) if tail.isdigit() else 101
        depth = int(depth)
        backbone = str(d.get("backbone", "resnet"))
        if backbone == "resnet" and depth not in (18, 34, 50, 101, 152):
            raise ValueError(f"model.depth must be one of 18/34/50/101/152, got {depth}")
        c4 = 512 if depth in (18, 34) else 2048
        c1 = 64 if depth in (18, 34) else 256
        # head names beyond the built-ins are resolved against the
        # registry at model-build time (custom heads register themselves
        # in user code, which may run after config parse)
        head = str(d.get("head", "sep_aspp_contrast"))
        output_stride = int(d.get("output_stride", 32))
        if output_stride not in (8, 16, 32):
            raise ValueError(f"model.output_stride must be 8|16|32, got {output_stride}")
        stem = str(d.get("stem", "conv7"))
        if stem not in ("conv7", "s2d"):
            raise ValueError(f"model.stem must be conv7|s2d, got {stem}")
        dw_backend = str(d.get("depthwise_backend", "xla"))
        if dw_backend not in ("xla", "pallas"):
            raise ValueError(
                f"model.depthwise_backend must be xla|pallas, got {dw_backend}"
            )
        am_backend = str(d.get("argmax_backend", "xla"))
        if am_backend not in ("xla", "pallas"):
            raise ValueError(
                f"model.argmax_backend must be xla|pallas, got {am_backend}"
            )
        return cls(
            pretrained_model=name,
            depth=depth,
            pretrained=d.get("pretrained", False),
            head=head,
            backbone=backbone,
            backbone_options=dict(d.get("backbone_options") or {}),
            head_options=dict(d.get("head_options") or {}),
            output_stride=output_stride,
            stem=stem,
            in_channels=int(d.get("in_channels", c4)),
            c1_in_channels=int(d.get("c1_in_channels", c1)),
            c1_channels=int(d.get("c1_channels", 48)),
            aspp_channels=int(d.get("aspp_channels", 512)),
            dilations=tuple(d.get("dilations", (1, 12, 24, 36))),
            proj_dim=int(d.get("proj_dim", 256)),
            proj_type=str(d.get("proj_type", "convmlp")),
            dtype=str(d.get("dtype", "bfloat16")),
            remat=bool(d.get("remat", False)),
            depthwise_backend=dw_backend,
            argmax_backend=am_backend,
        )


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    epochs: int = 1
    batch_size: int = 8
    lr: float = 1e-3
    fine_weight: float = 1.0
    num_workers: int = 4
    # input loader backend: "thread" (in-process thread pool + prefetch)
    # or "grain" (grain.DataLoader — deterministic multi-process workers,
    # record sharding across hosts; see data/pipeline.py GrainBatchLoader)
    loader: str = "thread"
    momentum: float = 0.9
    weight_decay: float = 1e-4
    # optimizer family: "sgd" (reference parity: momentum .9, wd 1e-4,
    # torch update order — train.py:239-246) | "adamw" (extension)
    optimizer: str = "sgd"
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    # average gradients over N micro-batches per optimizer update
    # (optax.MultiSteps; large effective batch without the memory)
    grad_accum_steps: int = 1
    # clip the global gradient norm before the update (extension; this
    # loss family has measured grad-abs-sum spikes of ~1e6 from random
    # init — see tests/test_superstep.py — and clipping is the standard
    # guard). None/0 = off (reference parity: no clipping).
    grad_clip_norm: Optional[float] = None
    # restrict weight decay to kernel weights (extension; the standard
    # transformer recipe): norm scales/biases, LayerScale gammas, and
    # position/CLS tokens stop decaying toward zero. false = reference
    # parity (torch SGD decays EVERY parameter, train.py:239-246).
    # Recommended true for the vit/swin/mit/convnext backbones.
    wd_skip_norm_bias: bool = False
    # fine-tuning: multiply the backbone's learning rate (extension).
    # 1.0 = reference parity (one joint rate, train.py:239-246);
    # 0 = freeze the backbone (no update / wd / momentum advance);
    # 0.1 is the usual setting for pretrained transformer backbones.
    backbone_lr_scale: float = 1.0
    # stop after N epochs without val-loss improvement (extension;
    # 0/None = off, reference parity: always run every epoch). The best
    # checkpoint is saved either way.
    early_stop_patience: Optional[int] = None
    aux_weight: float = 0.4  # train.py:315
    rmi_radius: int = 3
    rmi_pool_way: int = 0
    rmi_pool_size: int = 3
    rmi_pool_stride: int = 3
    # RMI Gram accumulation: "auto" streams over row chunks when the
    # neighborhood tensor would exceed ~1.5 GB (losses/rmi.py:
    # rmi_logdet_streaming_cmajor); "on"/"off" force it
    rmi_streaming: str = "auto"
    # RMI covariance backend: "auto" uses the Pallas one-pass Gram
    # kernels (ops/pallas/rmi_gram.py) on TPU for radius-3 f32,
    # "pallas"/"xla" force a backend
    rmi_backend: str = "auto"
    # "parity" (default): f32 Gram operands, HIGHEST-precision MXU
    # passes — the reference arithmetic class. "fast": bf16 z operands
    # with f32 accumulators in the Pallas kernels (native single-pass
    # MXU) — faster 3-level steps at relaxed parity tolerances
    rmi_precision: str = "parity"
    # storage precision of the full-resolution upsampled logits the
    # hierarchy-BCE/CE terms read (fast C-major losses only): "fast"
    # (default — DESIGN.md decision 23) stores them bf16; the loss math
    # still runs in f32 (every consumer upcasts inside its fused read),
    # but the materialized tensor and the bilinear upsample halve, which
    # dominates many-class steps (+40% at 150 classes, +6% headline).
    # "parity" keeps f32 storage — the oracle-exact mode the parity
    # tests pin. Configs that disable fast_losses (or select the f32
    # Pallas fused kernel) fall back to parity automatically.
    hiera_precision: str = "fast"
    triplet_schedule_unit: str = "step"
    # 3-level group-triplet override (losses/tree_triplet.py:
    # tree_triplet_loss_groups): explicit upper/lower fine-class id lists
    # replacing the hierarchy-derived split_upper_lower() default (first
    # super bucket's fine ids minus background vs the rest — with >2
    # super buckets everything outside bucket 0 lands in `lower`). The
    # reference hardcodes these by dataset (rmi_hiera_triplet_loss.py:
    # 263-270); set both or neither. Validated against the hierarchy
    # (in-range, disjoint) in SegHieroConfig.from_dict.
    triplet_upper_ids: Optional[Sequence[int]] = None
    triplet_lower_ids: Optional[Sequence[int]] = None
    # triplet pixel-selection backend: "auto" picks mask vs sorted by
    # class count (losses/tree_triplet.py SORTED_SELECTION_MIN_CLASSES);
    # both select identical pixels — force one for benchmarking
    triplet_selection: str = "auto"
    # OHEM hard-pixel mining on the per-level CE terms (losses/ohem.py,
    # mmseg OHEMPixelSampler semantics rebuilt TPU-static): keep pixels
    # with true-class prob < ohem_thresh, floored at ohem_min_kept
    # hardest pixels PER IMAGE. None = off (reference parity).
    ohem_thresh: Optional[float] = None
    ohem_min_kept: int = 100_000
    # hierarchy term: "bce" (reference live path, ×5 scale) or "focal"
    # (the reference's dead focal variant made live — hiera_loss.py:
    # 72-115, γ below, no ×5 scale; genuine 3-level form on 3-level
    # configs, 2-level adaptation otherwise)
    hiera_variant: str = "bce"
    focal_gamma: float = 2.0
    seed: int = 0
    log_every: int = 50
    mesh: Dict[str, int] = dataclasses.field(default_factory=lambda: {"data": -1})
    # "pjit": global-batch semantics (sync-BN, global triplet gate).
    # "ddp":  per-replica semantics matching the reference's DDP spec —
    #         local BN batches, triplet gate = every replica has
    #         triplets (pmin collective), grads pmean'd.
    parallel_mode: str = "pjit"
    # "replicated" (default): params/opt-state replicated on every
    # device, grads all-reduced — plain data parallelism.
    # "fsdp": params, optimizer state and EMA sharded over the `data`
    # axis (ZeRO/FSDP semantics; parallel/mesh.py:fsdp_state_sharding) —
    # XLA all-gathers each weight just-in-time and reduce-scatters its
    # gradient, cutting per-device state memory ~data×. pjit mode only.
    param_sharding: str = "replicated"
    # Megatron-style tensor parallelism over the `model` mesh axis
    # (parallel/tensor.py): attention q/k/v column-parallel, output
    # projection + FFN second matmul row-parallel. Meaningful for the
    # transformer backbones (mit/swin); unmatched leaves (conv
    # backbones, heads, norms) stay on their base sharding. pjit only.
    tensor_shards: int = 1
    # ddp mode only: compute BatchNorm statistics across replicas
    # (sync-BN, a psum over the data axis riding ICI) instead of the
    # reference's per-device BN. No effect in pjit mode, which already
    # has global-batch BN semantics.
    sync_bn: bool = False
    # extension: {"type": "poly"|"cosine"|"constant", "power": 0.9,
    # "warmup_steps": 0, "end_lr": 0.0}; reference lr is constant
    lr_schedule: Optional[Dict[str, Any]] = None
    # donate the train state's buffers to the step (saves one params+opt
    # HBM copy per step; verified safe on CPU and TPU)
    donate_state: bool = True
    # per-program XLA compiler option overrides for the jitted train/eval
    # steps, e.g. {"xla_tpu_scoped_vmem_limit_kib": "65536"}. This is THE
    # way to tune TPU compiler knobs on remote-dispatch runtimes: the
    # options travel with the PJRT compile call to the server-side XLA,
    # whereas XLA_FLAGS is parsed by the LOCAL jaxlib, which fatally
    # rejects unknown (tpu-only) flags. Swept on-chip by
    # tools/xla_sweep.py; measured results in docs/DESIGN.md. None = XLA
    # defaults (every measured combo so far is recorded there).
    compiler_options: Optional[Dict[str, Any]] = None
    # fold K optimizer steps into ONE jitted dispatch (a lax.scan over K
    # stacked batches, train/trainer.py). Amortizes the per-dispatch host
    # round-trip — the dominant cost for small fast steps on remote-
    # dispatch runtimes — at the price of K× batch memory held on device
    # and K× coarser logging granularity. 1 = per-step dispatch.
    steps_per_dispatch: int = 1
    # exponential moving average of the parameters, updated after every
    # optimizer step (ema ← d·ema + (1−d)·params). 0 = off (reference
    # parity). When on, validation / best-checkpoint selection and
    # inference use the averaged weights — the standard deployment
    # weights for segmentation models. Typical: 0.999–0.9999.
    ema_decay: float = 0.0
    # shard the image HEIGHT across M devices during training (the CNN
    # analogue of sequence parallelism, riding the mesh's `model` axis —
    # parallel/spatial.py). XLA's SPMD partitioner inserts the conv/pool
    # halo exchanges; activations per device shrink ~M×, enabling
    # resolutions one chip cannot hold. pjit mode only; 3-level configs
    # fall back to the XLA RMI backend (the Pallas Gram kernel's nested
    # shard_map assumes batch-only sharding).
    spatial_shards: int = 1
    # TPU fast path: compute the full-resolution loss algebra in C-major
    # layout (losses/fast.py) — ~1.75× faster train step at 512px on v5e;
    # numerically equivalent (tested) to the NHWC parity implementations
    fast_losses: bool = True
    # extension: additional per-level loss terms added to the total —
    # list of {type: "dice"|"lovasz", level: "fine"|"coarse"|"super",
    # weight: float} (losses/extra.py). The reference's loss menu is
    # fixed; these are the standard segmentation extras. () = off.
    extra_losses: Sequence[Dict[str, Any]] = ()
    # NaN guard (aux subsystem, SURVEY §5): aborts with the failing
    # primitive's traceback on the first non-finite value. Debug only —
    # disables async dispatch
    debug_nans: bool = False
    # use the Pallas fused upsample+BCE+CE kernel for the 2-level loss.
    # Default OFF: bit-exact but measured slower than the XLA C-major
    # path (see ops/pallas/hiera2_fused.py docstring)
    pallas_fused_loss: bool = False
    # accepted-and-ignored reference keys, kept for round-tripping
    device: Optional[str] = None
    gpus: Optional[Sequence[int]] = None

    @classmethod
    def from_dict(cls, d: dict) -> "TrainingConfig":
        d = dict(d or {})
        if "learning_rate" in d:  # common alias for the reference's `lr`
            d.setdefault("lr", d.pop("learning_rate"))
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        # reference uses coarse_weight/super_weight in example config but
        # never reads them (example-config.yaml:40-41); accept silently.
        hiera_precision_explicit = "hiera_precision" in kwargs
        out = cls(**kwargs)
        if (
            not hiera_precision_explicit
            and out.hiera_precision == "fast"
            and (not out.fast_losses or out.pallas_fused_loss)
        ):
            # the 'fast' default only applies to the fast C-major losses;
            # configs that opt out of those (fast_losses: false, or the
            # f32 Pallas fused kernel) keep parity automatically — the
            # errors below fire only on an EXPLICIT hiera_precision: fast
            out = dataclasses.replace(out, hiera_precision="parity")
        if out.rmi_pool_size != out.rmi_pool_stride:
            # mirrors rmi_hiera_triplet_loss.py:260
            raise ValueError("rmi_pool_size must equal rmi_pool_stride")
        if out.triplet_schedule_unit not in ("step", "epoch"):
            raise ValueError("triplet_schedule_unit must be 'step' or 'epoch'")
        if out.triplet_selection not in ("auto", "mask", "sorted"):
            raise ValueError(
                "triplet_selection must be 'auto', 'mask' or 'sorted'"
            )
        if (out.triplet_upper_ids is None) != (out.triplet_lower_ids is None):
            raise ValueError(
                "triplet_upper_ids and triplet_lower_ids must be set "
                "together (both or neither)"
            )
        if out.triplet_upper_ids is not None:
            out = dataclasses.replace(
                out,
                triplet_upper_ids=tuple(int(i) for i in out.triplet_upper_ids),
                triplet_lower_ids=tuple(int(i) for i in out.triplet_lower_ids),
            )
        if out.ohem_thresh is not None and not (0.0 < out.ohem_thresh <= 1.0):
            raise ValueError("ohem_thresh must be in (0, 1]")
        if out.ohem_min_kept < 0:
            raise ValueError("ohem_min_kept must be >= 0")
        if out.parallel_mode not in ("pjit", "ddp"):
            raise ValueError("parallel_mode must be 'pjit' or 'ddp'")
        if out.param_sharding not in ("replicated", "fsdp"):
            raise ValueError("param_sharding must be 'replicated' or 'fsdp'")
        if out.param_sharding == "fsdp" and out.parallel_mode != "pjit":
            raise ValueError(
                "param_sharding: fsdp requires parallel_mode: pjit (the ddp "
                "shard_map replicates the state per replica by construction)"
            )
        if out.rmi_streaming not in ("auto", "on", "off"):
            raise ValueError("rmi_streaming must be 'auto', 'on' or 'off'")
        if out.rmi_backend not in ("auto", "pallas", "xla"):
            raise ValueError("rmi_backend must be 'auto', 'pallas' or 'xla'")
        if out.rmi_precision not in ("parity", "fast"):
            raise ValueError("rmi_precision must be 'parity' or 'fast'")
        if out.hiera_precision not in ("parity", "fast"):
            raise ValueError("hiera_precision must be 'parity' or 'fast'")
        if out.hiera_precision == "fast" and not out.fast_losses:
            raise ValueError(
                "hiera_precision: fast requires fast_losses: true "
                "(the NHWC parity losses always run at parity precision)"
            )
        if out.hiera_precision == "fast" and out.pallas_fused_loss:
            raise ValueError(
                "hiera_precision: fast and pallas_fused_loss are mutually "
                "exclusive (the fused kernel is an f32 parity kernel)"
            )
        if out.loader not in ("thread", "grain"):
            raise ValueError("loader must be 'thread' or 'grain'")
        if out.hiera_variant not in ("bce", "focal"):
            raise ValueError("hiera_variant must be 'bce' or 'focal'")
        if out.optimizer not in ("sgd", "adamw"):
            raise ValueError("optimizer must be 'sgd' or 'adamw'")
        if out.grad_accum_steps < 1:
            raise ValueError("grad_accum_steps must be >= 1")
        if out.backbone_lr_scale < 0:
            raise ValueError("backbone_lr_scale must be >= 0")
        if out.steps_per_dispatch < 1:
            raise ValueError("steps_per_dispatch must be >= 1")
        if out.spatial_shards < 1:
            raise ValueError("spatial_shards must be >= 1")
        if not (0.0 <= out.ema_decay < 1.0):
            raise ValueError("ema_decay must be in [0, 1)")
        if out.tensor_shards < 1:
            raise ValueError("tensor_shards must be >= 1")
        if out.compiler_options is not None and (
            not isinstance(out.compiler_options, dict)
            or not all(isinstance(k, str) for k in out.compiler_options)
        ):
            raise ValueError(
                "compiler_options must be a mapping of XLA option name "
                "-> value, e.g. {xla_tpu_scoped_vmem_limit_kib: '65536'}"
            )
        if out.tensor_shards > 1 and out.parallel_mode != "pjit":
            raise ValueError(
                "tensor_shards > 1 requires parallel_mode: pjit (weight "
                "sharding is a partitioner feature)"
            )
        if out.tensor_shards > 1 and out.spatial_shards > 1:
            raise ValueError(
                "tensor_shards and spatial_shards both ride the `model` "
                "mesh axis — enable at most one"
            )
        if out.spatial_shards > 1 and out.parallel_mode != "pjit":
            raise ValueError(
                "spatial_shards > 1 requires parallel_mode: pjit (the ddp "
                "shard_map maps replicas over whole samples; height "
                "sharding is a partitioner feature)"
            )
        norm_extras = []
        for spec in out.extra_losses or ():
            spec = dict(spec)
            if spec.get("type") not in ("dice", "lovasz"):
                raise ValueError(
                    "extra_losses[].type must be 'dice' or 'lovasz', got "
                    f"{spec.get('type')!r}"
                )
            if spec.get("level", "fine") not in ("fine", "coarse", "super"):
                raise ValueError(
                    "extra_losses[].level must be 'fine', 'coarse' or "
                    f"'super', got {spec.get('level')!r}"
                )
            spec.setdefault("level", "fine")
            spec["weight"] = float(spec.get("weight", 1.0))
            if spec["weight"] <= 0:
                raise ValueError("extra_losses[].weight must be > 0")
            norm_extras.append(spec)
        object.__setattr__(out, "extra_losses", tuple(norm_extras))
        return out


@dataclasses.dataclass(frozen=True)
class TransformConfig:
    resize: Optional[Tuple[int, int]] = None  # (H, W); see note below
    hflip_prob: float = 0.5
    normalize_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    normalize_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # "pil" = reference-parity image resize; "native" = C++ transform core
    backend: str = "pil"
    # extensions (train split only; both off by default = reference
    # parity). scale_range: random scale jitter s∈[lo,hi] after the base
    # resize, then random-crop / 255-pad back to `resize` — the standard
    # DeepLab/Cityscapes recipe (e.g. [0.5, 2.0]); output shape stays
    # static. color_jitter: max relative brightness/contrast/saturation
    # perturbation (e.g. 0.3), applied to the image only.
    scale_range: Optional[Tuple[float, float]] = None
    color_jitter: float = 0.0
    # extension: apply the random horizontal flip ON DEVICE inside the
    # jitted train step (image + fine label together, coins from the JAX
    # PRNG folded with the global step) instead of on the host. The flip
    # fuses into the step for free on TPU, removing ~3 ms/image of
    # strided host copies; the augmentation stream differs from the
    # host path (documented divergence) but is statistically identical.
    device_hflip: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "TransformConfig":
        d = dict(d or {})
        # Note: the reference mixes PIL (W,H) and F.interpolate (H,W)
        # conventions (dataloader.py:51-56) — only safe for square sizes.
        # We define resize as (H, W) and apply it consistently.
        backend = str(d.get("backend", "pil"))
        if backend not in ("pil", "native"):
            raise ValueError(f"transform.backend must be pil|native, got {backend}")
        scale_range = d.get("scale_range")
        if scale_range is not None:
            scale_range = tuple(float(x) for x in scale_range)
            if len(scale_range) != 2 or not (0 < scale_range[0] <= scale_range[1]):
                raise ValueError(
                    "transform.scale_range must be [lo, hi] with 0 < lo <= hi"
                )
        color_jitter = float(d.get("color_jitter", 0.0))
        if not (0.0 <= color_jitter < 1.0):
            raise ValueError("transform.color_jitter must be in [0, 1)")
        return cls(
            resize=_as_tuple2(d.get("resize"), "transform.resize"),
            hflip_prob=float(d.get("hflip_prob", 0.5)),
            normalize_mean=tuple(d.get("normalize_mean", (0.485, 0.456, 0.406))),
            normalize_std=tuple(d.get("normalize_std", (0.229, 0.224, 0.225))),
            backend=backend,
            scale_range=scale_range,
            color_jitter=color_jitter,
            device_hflip=bool(d.get("device_hflip", False)),
        )


@dataclasses.dataclass(frozen=True)
class OutputConfig:
    checkpoint_dir: str = "./"
    project_name: str = "seghiero"
    metrics_jsonl: Optional[str] = None  # extension: persist epoch history
    profile_dir: Optional[str] = None  # extension: jax.profiler trace dir
    tensorboard_dir: Optional[str] = None  # extension: TB scalar writer
    # extension: export N val predictions per epoch as colorized PNGs to
    # <checkpoint_dir>/<project>/samples/epoch_NNN/ — visual training
    # progress at a glance. 0 = off.
    sample_images: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "OutputConfig":
        d = dict(d or {})
        out = cls(
            checkpoint_dir=str(d.get("checkpoint_dir", "./")),
            project_name=str(d.get("project_name", "seghiero")),
            metrics_jsonl=d.get("metrics_jsonl"),
            profile_dir=d.get("profile_dir"),
            tensorboard_dir=d.get("tensorboard_dir"),
            sample_images=int(d.get("sample_images", 0)),
        )
        if out.sample_images < 0:
            raise ValueError("output.sample_images must be >= 0")
        return out


@dataclasses.dataclass(frozen=True)
class SegHieroConfig:
    dataset: DatasetConfig
    hierarchy: Hierarchy
    model: ModelConfig
    training: TrainingConfig
    transform: TransformConfig
    output: OutputConfig
    raw: Dict[str, Any] = dataclasses.field(default_factory=dict, repr=False)

    @classmethod
    def from_dict(cls, cfg: dict) -> "SegHieroConfig":
        unknown = set(cfg) - _KNOWN_SECTIONS
        if unknown:
            # the reference silently ignores unknown keys; we warn loudly
            import warnings

            warnings.warn(f"Ignoring unknown config sections: {sorted(unknown)}")
        if "classes" not in cfg:
            raise ValueError("config must have a 'classes' section")
        out = cls(
            dataset=DatasetConfig.from_dict(cfg.get("dataset", {})),
            hierarchy=Hierarchy.from_class_config(cfg["classes"]),
            model=ModelConfig.from_dict(cfg.get("model", {})),
            training=TrainingConfig.from_dict(cfg.get("training", {})),
            transform=TransformConfig.from_dict(cfg.get("transform", {})),
            output=OutputConfig.from_dict(cfg.get("output", {})),
            raw=cfg,
        )
        # cross-section checks that need the hierarchy
        upper = out.training.triplet_upper_ids
        lower = out.training.triplet_lower_ids
        if upper is not None:
            if not out.hierarchy.has_super:
                raise ValueError(
                    "training.triplet_upper_ids/lower_ids configure the "
                    "3-level group triplet (the reference's "
                    "rmi_tree_triplet_loss); 2-level configs use the "
                    "range variant, which derives groups from the "
                    "hierarchy itself"
                )
            n_fine = out.hierarchy.n_fine
            bad = [i for i in (*upper, *lower) if not 0 <= i < n_fine]
            if bad:
                raise ValueError(
                    f"triplet group ids out of range [0, {n_fine}): "
                    f"{sorted(set(bad))}"
                )
            overlap = set(upper) & set(lower)
            if overlap:
                raise ValueError(
                    "triplet_upper_ids and triplet_lower_ids must be "
                    f"disjoint; both contain {sorted(overlap)}"
                )
        return out

    @property
    def fine_names(self) -> Dict[int, str]:
        return {int(k): v for k, v in self.raw["classes"]["fine_names"].items()}

    @property
    def coarse_names(self) -> Dict[int, str]:
        return {int(k): v for k, v in self.raw["classes"]["coarse_names"].items()}

    @property
    def super_names(self) -> Dict[int, str]:
        return {
            int(k): v
            for k, v in self.raw["classes"].get("super_coarse_names", {}).items()
        }


def load_config(path: str) -> SegHieroConfig:
    """Load and validate a SegHiero YAML config file."""
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ValueError(f"{path} is not a YAML mapping (got {type(cfg).__name__})")
    return SegHieroConfig.from_dict(cfg)
