"""End-to-end train-step parity: the trainer's `_forward_losses` scalar
vs the reference's train-step math (train.py:266-315), chained through
REAL model outputs rather than random logits.

Closes the parity-evidence chain: test_models.py covers backbone forward
parity, test_torch_roundtrip.py covers head forward parity via exported
weights, test_losses_parity.py covers every loss vs the imported torch
modules on random inputs. This test joins them: one batch flows through
our full model (backbone → sep-ASPP head → aux head), then both our
composite-loss assembly AND the reference's (imported loss modules +
train.py's interpolate/CE glue, cited per line) consume the SAME
features/weights — the final train-step scalars must match.

The reference backbone class needs torchvision (not installed here), so
the torch side consumes the features produced by our backbone — valid
because backbone forward parity is established independently
(tests/test_models.py torch-padding parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.data.pipeline import normalize_images
from seghiero_tpu.models.resnet import ResNetBackbone
from seghiero_tpu.models.segmenter import build_model
from seghiero_tpu.models.torch_convert import (
    export_reference_aux_head,
    export_reference_head,
)

from reference_oracle import (  # noqa: F401  (imports add /root/reference to path)
    RefHieraTripletLoss,
    RefRMIHieraTripletLoss,
)



def _cfg(classes, fast_losses=True):
    return SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 2},
            "classes": classes,
            "model": {
                "depth": 18,
                "dtype": "float32",
                "aspp_channels": 16,
                "c1_channels": 8,
                "proj_dim": 8,
                "dilations": [1, 2, 3, 4],
            },
            "training": {
                "epochs": 1,
                "batch_size": 2,
                "lr": 0.01,
                "fast_losses": fast_losses,
            },
            "transform": {"resize": [64, 64], "hflip_prob": 0.0},
            "output": {"checkpoint_dir": "/tmp/e2e", "project_name": "e2e"},
        }
    )


def _batch(rng, h, n_classes=None):
    """``n_classes`` restricts the label pool: the reference 3-level
    group-triplet crashes (`list.remove`) on fine ids outside its
    hardcoded upper/lower sets (rmi_tree_triplet_loss.py:31-38), so the
    3-level test draws only ids 0-6 — same restriction both sides."""
    images = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    labels = rng.integers(0, n_classes or h.n_fine, (2, 64, 64)).astype(np.int32)
    labels[:, :5, :5] = 255  # exercise the ignore-index path
    batch = {"image": jnp.asarray(images), "fine": jnp.asarray(labels)}
    return batch, images, labels


def _torch_side(cfg, variables, images_np, labels_np, main_loss_fn, step):
    """The reference train step from features to scalar, with the loss
    modules IMPORTED from /root/reference and the inter-module glue
    mirroring train.py:266-315 line by line (cited inline)."""
    h = cfg.hierarchy
    imgs = normalize_images(
        jnp.asarray(images_np),
        cfg.transform.normalize_mean,
        cfg.transform.normalize_std,
    )
    bb = ResNetBackbone(cfg.model.depth, cfg.model.output_stride, stem=cfg.model.stem)
    feats = bb.apply(
        {
            "params": variables["params"]["backbone"],
            "batch_stats": variables["batch_stats"]["backbone"],
        },
        imgs,
        False,
    )
    c1, c3 = np.asarray(feats[0]), np.asarray(feats[2])
    c4 = np.asarray(feats[3])

    import sys

    if "/root/reference" not in sys.path:  # pragma: no cover
        sys.path.insert(0, "/root/reference")
    from models.head.sep_aspp_contrast_head import (
        DepthwiseSeparableASPPContrastHead as RefHead,
    )

    ref_head = RefHead(
        in_channels=c4.shape[-1],
        c1_in_channels=c1.shape[-1],
        c1_channels=cfg.model.c1_channels,
        aspp_channels=cfg.model.aspp_channels,
        dilations=tuple(cfg.model.dilations),
        num_classes=h.total_classes,
        proj_dim=cfg.model.proj_dim,
        proj_type=cfg.model.proj_type,
    )
    ref_head.load_state_dict(
        export_reference_head(
            jax.device_get(variables["params"]["head"]),
            jax.device_get(variables["batch_stats"]["head"]),
            cfg.model.proj_type,
        ),
        strict=True,
    )
    ref_head.eval()

    # aux head: train.py:168-173 (1×1 conv → BN → ReLU on C3)
    ref_aux = nn.Sequential(
        nn.Conv2d(c3.shape[-1], h.n_fine, kernel_size=1, bias=False),
        nn.BatchNorm2d(h.n_fine),
        nn.ReLU(),
    )
    ref_aux.load_state_dict(
        export_reference_aux_head(
            jax.device_get(variables["params"]["aux_head"]),
            jax.device_get(variables["batch_stats"]["aux_head"]),
        ),
        strict=True,
    )
    ref_aux.eval()

    def nchw(x):
        return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))

    with torch.no_grad():
        main_logits, embedding = ref_head([nchw(c1), None, None, nchw(c4)])
        H, W = labels_np.shape[-2:]
        # train.py:277-284: the two interpolates
        logit_before = F.interpolate(
            main_logits, scale_factor=0.5, mode="bilinear", align_corners=False
        )
        logit_after = F.interpolate(
            main_logits, size=(H, W), mode="bilinear", align_corners=False
        )
        # train.py:287-306: composite loss on (step, emb, fine-slice, full)
        main = main_loss_fn(
            torch.tensor([step]),
            embedding,
            logit_before[:, : h.n_fine],
            logit_after,
            torch.from_numpy(labels_np).long(),
        )
        # train.py:308-315: aux CE at weight 0.4
        aux_logits = F.interpolate(
            ref_aux(nchw(c3)), size=(H, W), mode="bilinear", align_corners=False
        )
        aux = nn.CrossEntropyLoss(ignore_index=255)(
            aux_logits, torch.from_numpy(labels_np).long()
        )
        return float(main + 0.4 * aux)


@pytest.mark.parametrize("fast", [True, False], ids=["fast-losses", "nhwc-parity"])
@pytest.mark.parametrize("step", [0, 40_000])
def test_train_step_scalar_matches_reference_2level(
    rng, classes_2level, fast, step
):
    cfg = _cfg(classes_2level, fast_losses=fast)
    h = cfg.hierarchy
    model = build_model(cfg)
    batch, images_np, labels_np = _batch(rng, h)
    variables = model.init(
        jax.random.key(7), jnp.zeros((1, 64, 64, 3)), train=False
    )

    from seghiero_tpu.train.trainer import _forward_losses, make_composite_loss

    composite = make_composite_loss(cfg)
    loss, *_ = _forward_losses(
        model, composite, cfg, variables, batch, jnp.asarray(step), train=False
    )

    ref_fn = RefHieraTripletLoss(
        num_classes=h.n_fine,
        hiera_map=h.fine_to_coarse.tolist(),
        hiera_index=[list(r) for r in h.coarse_ranges],
    )
    ref = _torch_side(cfg, variables, images_np, labels_np, ref_fn, step)
    np.testing.assert_allclose(float(loss), ref, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("fast", [True, False], ids=["fast-losses", "nhwc-parity"])
def test_train_step_scalar_matches_reference_3level(rng, classes_3level, fast):
    """3-level chain in the f64 oracle mode (``use_float64=True``).

    Why f64 here: a freshly-initialized head emits near-uniform logits,
    and the 4× bilinear upsample makes them SPATIALLY SMOOTH — the RMI
    neighborhood Grams are then near-singular, a regime where the
    reference's fixed-α float64 logdet and our f32 noise-aware jitter
    legitimately diverge (the documented f32 floor,
    losses/rmi.py:_rmi_logdet_core defense #3; measured ~0.28/channel on
    this input). ``use_float64`` restores the reference's exact α/N
    jitter, so the END-TO-END MATH is verified exactly; the f32 fast
    path's equivalence to the f64 core away from the floor is covered by
    tests/test_losses_parity.py and tests/test_saturation_grad.py.

    step=0: the cosine ramp (rmi_hiera_triplet_loss.py:539) makes the
    triplet factor exactly 0, so the DELIBERATE divergence in triplet
    grouping (we derive groups from the YAML hierarchy; the reference
    hardcodes upper/lower ids, sharp edge #5) does not enter the scalar.
    """
    from seghiero_tpu.losses import RMIHieraTripletLoss
    from seghiero_tpu.losses.fast import FastRMIHieraTripletLoss
    from seghiero_tpu.train.trainer import _forward_losses

    cfg = _cfg(classes_3level, fast_losses=fast)
    h = cfg.hierarchy
    model = build_model(cfg)
    batch, images_np, labels_np = _batch(rng, h, n_classes=7)
    variables = model.init(
        jax.random.key(11), jnp.zeros((1, 64, 64, 3)), train=False
    )

    if fast:
        composite = FastRMIHieraTripletLoss(h, use_float64=True)
    else:
        composite = RMIHieraTripletLoss(hierarchy=h, use_float64=True)
    with jax.enable_x64():
        loss, *_ = _forward_losses(
            model, composite, cfg, variables, batch, jnp.asarray(0), train=False
        )

    ref_fn = RefRMIHieraTripletLoss(
        n_fine=h.n_fine,
        n_mid=h.n_coarse,
        n_high=h.n_super,
        fine_to_mid=torch.from_numpy(h.fine_to_coarse.astype(np.int64)),
        # fixed fine→high LUT (the reference's own builder is buggy,
        # train.py:86-99 — see tests/test_losses_parity.py)
        fine_to_high=torch.from_numpy(h.fine_to_super.astype(np.int64)),
    )
    ref = _torch_side(cfg, variables, images_np, labels_np, ref_fn, 0)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-3, atol=1e-4)
