"""Multi-step SGD TRAJECTORY parity vs the torch reference.

The last link of the training chain after test_e2e_parity.py (forward
scalar) and test_grad_parity.py (gradient values): the OPTIMIZER. Both
sides train the head + aux head for several SGD(momentum=0.9,
weight_decay=1e-4) steps (train.py:239-246) from identical converted
weights on identical batches, and must produce (a) matching loss
scalars at every step and (b) matching parameters afterwards —
verifying torch's update order g←g+wd·p; buf←μ·buf+g; p←p−lr·buf
against our optax chain (train/optim.py:68-72), gradient flow through
train-mode BatchNorm (batch statistics, full BN backward), and the
inter-step momentum/weight coupling that no single-step test can see.

The backbone is frozen (its params receive no update on either side)
because the reference backbone class needs torchvision (not installed
here); both sides consume the SAME train-mode features from our
backbone, whose forward parity is established by tests/test_models.py.
Running-stat buffers are excluded from the final comparison: torch
updates running_var with the UNBIASED batch variance at momentum 0.1
(BatchNorm2d docs) while flax uses the biased variance at the
equivalent 0.9 convention — a documented convention divergence that
never enters training-mode forwards.

Every batch PLANTS labels at the four source pixels the 64→2 nearest
downsample samples ((0,0),(0,32),(32,0),(32,32)) so the triplet term is
ACTIVE on every step (asserted via the torch-side proj grads). This
pins the test to the realistic regime and away from a deliberate
divergence: when a batch yields NO triplets, the reference's triplet is
``None``, torch SGD sees ``grad=None`` for the projection head and
SKIPS its update entirely — no weight decay, no momentum advance
(torch SGD's ``if p.grad is None: continue``) — whereas our jitted
step applies the uniform wd+momentum update with exactly-zero grads.
At real embedding resolutions (thousands of pixels) the no-triplet
case effectively never occurs; see docs/DESIGN.md divergence list.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import optax

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.data.pipeline import normalize_images
from seghiero_tpu.models.resnet import ResNetBackbone
from seghiero_tpu.models.segmenter import build_model
from seghiero_tpu.models.torch_convert import (
    export_reference_aux_head,
    export_reference_head,
)
from seghiero_tpu.train.optim import make_optimizer

from reference_oracle import (
    RefHieraTripletLoss,
    RefRMIHieraTripletLoss,
)


N_STEPS = 3
LR, MOMENTUM, WD = 0.01, 0.9, 1e-4


def _cfg(classes, fast_losses):
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
                "lr": LR,
                "momentum": MOMENTUM,
                "weight_decay": WD,
                "fast_losses": fast_losses,
            },
            "transform": {"resize": [64, 64], "hflip_prob": 0.0},
            "output": {"checkpoint_dir": "/tmp/traj", "project_name": "traj"},
        }
    )


def _batches(rng, n, label_pool, plant=(1, 2, 4, 7)):
    """``plant`` is written at the 4 pixels the 64→2 nearest downsample
    reads, guaranteeing live triplets: for 2-level (1,2,4,7), classes
    1/2 share coarse bucket 0-3 (pos pairs) with 4/7 outside (negs);
    for 3-level (1,2,5,6), 1/2 sit in the reference's hardcoded upper
    group and 5/6 in lower (rmi_hiera_triplet_loss.py:269-270)."""
    out = []
    for _ in range(n):
        images = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
        labels = rng.integers(0, label_pool, (2, 64, 64)).astype(np.int32)
        labels[:, 8:13, 8:13] = 255  # exercise ignore-index away from plants
        for lbl, (y, x) in zip(plant, ((0, 0), (0, 32), (32, 0), (32, 32))):
            labels[:, y, x] = lbl
        out.append((images, labels))
    return out


def _train_mode_features(cfg, variables, images_np):
    """Frozen-backbone features, TRAIN-mode BN (batch statistics) — the
    statistics the head sees inside a real train step."""
    imgs = normalize_images(
        jnp.asarray(images_np),
        cfg.transform.normalize_mean,
        cfg.transform.normalize_std,
    )
    bb = ResNetBackbone(cfg.model.depth, cfg.model.output_stride, stem=cfg.model.stem)
    feats, _ = bb.apply(
        {
            "params": variables["params"]["backbone"],
            "batch_stats": variables["batch_stats"]["backbone"],
        },
        imgs,
        True,
        mutable=["batch_stats"],
    )
    return feats


def _torch_modules(cfg, variables, feat_channels):
    import sys

    if "/root/reference" not in sys.path:  # pragma: no cover
        sys.path.insert(0, "/root/reference")
    from models.head.sep_aspp_contrast_head import (
        DepthwiseSeparableASPPContrastHead as RefHead,
    )

    h = cfg.hierarchy
    c1_ch, c3_ch, c4_ch = feat_channels
    ref_head = RefHead(
        in_channels=c4_ch,
        c1_in_channels=c1_ch,
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
    # aux head: train.py:168-173
    ref_aux = nn.Sequential(
        nn.Conv2d(c3_ch, h.n_fine, kernel_size=1, bias=False),
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
    ref_head.train()
    ref_aux.train()
    return ref_head, ref_aux


def _torch_step(ref_head, ref_aux, ref_loss_fn, feats_np, labels_np, step, opt):
    """One reference train step (train.py:266-317), gradients live."""

    def nchw(x):
        return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))

    c1, c3, c4 = feats_np
    n_fine = ref_aux[0].out_channels
    opt.zero_grad()
    main_logits, embedding = ref_head([nchw(c1), None, None, nchw(c4)])
    H, W = labels_np.shape[-2:]
    logit_before = F.interpolate(
        main_logits, scale_factor=0.5, mode="bilinear", align_corners=False
    )
    logit_after = F.interpolate(
        main_logits, size=(H, W), mode="bilinear", align_corners=False
    )
    main = ref_loss_fn(
        torch.tensor([step]),
        embedding,
        logit_before[:, :n_fine],
        logit_after,
        torch.from_numpy(labels_np).long(),
    )
    aux_logits = F.interpolate(
        ref_aux(nchw(c3)), size=(H, W), mode="bilinear", align_corners=False
    )
    aux = nn.CrossEntropyLoss(ignore_index=255)(
        aux_logits, torch.from_numpy(labels_np).long()
    )
    loss = main + 0.4 * aux
    loss.backward()
    opt.step()
    return float(loss)


def _run_trajectory(cfg, composite, batches, sched_steps, ref_loss_fn, seed):
    """Run N_STEPS on both sides; return per-step losses + final states."""
    from seghiero_tpu.train.trainer import _forward_losses

    model = build_model(cfg)
    variables = model.init(
        jax.random.key(seed), jnp.zeros((1, 64, 64, 3)), train=False
    )
    frozen_params = variables["params"]

    # ---- torch side setup (same converted weights) ----
    feats0 = _train_mode_features(cfg, variables, batches[0][0])
    chans = (feats0[0].shape[-1], feats0[2].shape[-1], feats0[3].shape[-1])
    ref_head, ref_aux = _torch_modules(cfg, variables, chans)
    opt = torch.optim.SGD(
        list(ref_head.parameters()) + list(ref_aux.parameters()),
        lr=LR,
        momentum=MOMENTUM,
        weight_decay=WD,
    )

    # ---- our side setup: optimize only head + aux (frozen backbone) ----
    ha_params = {
        "head": variables["params"]["head"],
        "aux_head": variables["params"]["aux_head"],
    }
    bstats = variables["batch_stats"]
    tx = make_optimizer(cfg.training)
    opt_state = tx.init(ha_params)

    def loss_fn(ha, bs, batch, sched_step):
        vars_ = {
            "params": {**frozen_params, "head": ha["head"], "aux_head": ha["aux_head"]},
            "batch_stats": bs,
        }
        loss, *_rest, new_bs = _forward_losses(
            model, composite, cfg, vars_, batch, sched_step, train=True
        )
        return loss, new_bs

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    ours_losses, torch_losses = [], []
    for (images_np, labels_np), sched in zip(batches, sched_steps):
        batch = {"image": jnp.asarray(images_np), "fine": jnp.asarray(labels_np)}
        (loss, new_bs), grads = grad_fn(ha_params, bstats, batch, jnp.asarray(sched))
        updates, opt_state = tx.update(grads, opt_state, ha_params)
        ha_params = optax.apply_updates(ha_params, updates)
        bstats = new_bs
        ours_losses.append(float(loss))

        feats = _train_mode_features(cfg, variables, images_np)
        feats_np = (np.asarray(feats[0]), np.asarray(feats[2]), np.asarray(feats[3]))
        torch_losses.append(
            _torch_step(ref_head, ref_aux, ref_loss_fn, feats_np, labels_np, sched, opt)
        )
        # the planted labels must keep the triplet term live: a None
        # grad here means torch SKIPPED the proj update (see module
        # docstring) and the comparison would silently change meaning
        proj_w = dict(ref_head.named_parameters())["proj_head.proj.0.weight"]
        assert proj_w.grad is not None, "triplet term went dead mid-test"
    return ours_losses, torch_losses, variables, ha_params, bstats, ref_head, ref_aux


def _assert_final_params_match(cfg, init, ha_params, bstats, ref_head, ref_aux):
    """Export our post-training params into reference state_dict layout
    and compare every WEIGHT entry with the torch-trained modules.

    The bound is on the UPDATE VECTORS u = final − init: the
    concatenation of every tensor's update must match torch to ≤10%
    relative L2, and each individual tensor to ≤25% of its own movement
    (floored at 1% of the global update norm, so tensors that barely
    moved cannot fail on pure noise).

    Elementwise allclose is the wrong tool, and the bounds are
    deliberately loose, because this tiny test geometry contains a
    genuinely ILL-CONDITIONED gradient: the ASPP image-pool branch
    pools to 1×1 spatial, so its BatchNorm normalizes exactly 2 values
    (batch 2). When a batch makes those two pooled activations
    near-equal, the normalized output is ±δ/√(δ²+ε) ≈ 0 and the BN
    backward is ~1/√ε-amplified — measured on one batch draw: forward
    losses agree to 4e-5 while the image-pool conv GRADIENT differs 5%
    from step 0 (both frameworks correct; the gradient there is
    chaotic). Typical batches track to <1% global. This test therefore
    checks INTEGRATION (grads reach the right tensors through the
    layout mapping, BN batch-stat plumbing, momentum carry-over) via
    the global bound — a wrong-tensor mapping or dropped term is an
    order-1 divergence — while exact update-rule semantics are verified
    non-chaotically by test_update_rule_matches_torch_exactly."""
    ours_head = export_reference_head(
        jax.device_get(ha_params["head"]),
        jax.device_get(bstats["head"]),
        cfg.model.proj_type,
    )
    theirs_head = ref_head.state_dict()
    ours_aux = export_reference_aux_head(
        jax.device_get(ha_params["aux_head"]), jax.device_get(bstats["aux_head"])
    )
    theirs_aux = ref_aux.state_dict()
    init_head = export_reference_head(
        jax.device_get(init["params"]["head"]),
        jax.device_get(init["batch_stats"]["head"]),
        cfg.model.proj_type,
    )
    init_aux = export_reference_aux_head(
        jax.device_get(init["params"]["aux_head"]),
        jax.device_get(init["batch_stats"]["aux_head"]),
    )
    skip = ("running_mean", "running_var", "num_batches_tracked", "step")
    n_checked = 0
    all_ours, all_torch, per_tensor = [], [], []
    for ours, theirs, at_init in (
        (ours_head, theirs_head, init_head),
        (ours_aux, theirs_aux, init_aux),
    ):
        assert set(ours) == set(theirs)
        for k, v in ours.items():
            if any(s in k for s in skip):
                continue
            u_ours = (v.numpy() - at_init[k].numpy()).ravel()
            u_torch = (theirs[k].detach().numpy() - at_init[k].numpy()).ravel()
            all_ours.append(u_ours)
            all_torch.append(u_torch)
            per_tensor.append((k, u_ours, u_torch))
            n_checked += 1
    assert n_checked > 20  # the whole head, not a token sample
    g_ours = np.concatenate(all_ours)
    g_torch = np.concatenate(all_torch)
    g_norm = float(np.linalg.norm(g_torch))
    g_rel = float(np.linalg.norm(g_ours - g_torch)) / g_norm
    assert g_rel <= 0.10, (
        f"GLOBAL update diverged after {N_STEPS} SGD steps: relL2={g_rel:.4f}"
    )
    for k, u_ours, u_torch in per_tensor:
        nt = float(np.linalg.norm(u_torch))
        # tensors that barely moved relative to the whole update carry
        # only noise; the 1%-of-global floor keeps them from failing on
        # BN-amplified float chaos while still bounding them absolutely
        denom = max(nt, 0.01 * g_norm)
        rel = float(np.linalg.norm(u_ours - u_torch)) / denom
        assert rel <= 0.25, (
            f"update for {k} diverged after {N_STEPS} SGD steps: "
            f"relL2={rel:.4f} ‖u_torch‖={nt:.3e} (global ‖u‖={g_norm:.3e})"
        )


@pytest.mark.parametrize("opt", ["sgd", "adamw"])
def test_update_rule_matches_torch_exactly(opt):
    """The optax chains reproduce torch.optim.{SGD, AdamW} to f32
    round-off (1e-6) over 10 steps on synthetic gradient sequences —
    the EXACT verification of update semantics (wd→momentum ordering,
    decoupled AdamW decay, buffer initialization) that the end-to-end
    trajectory test cannot provide, because there the gradients
    themselves carry cross-framework float noise."""
    from seghiero_tpu.config import TrainingConfig

    rng_l = np.random.default_rng(42)
    shapes = [(4, 3), (7,), (2, 3, 3, 2)]
    params_np = [rng_l.standard_normal(s).astype(np.float32) for s in shapes]
    grads_seq = [
        [rng_l.standard_normal(s).astype(np.float32) for s in shapes]
        for _ in range(10)
    ]

    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params_np]
    if opt == "sgd":
        topt = torch.optim.SGD(tparams, lr=LR, momentum=MOMENTUM, weight_decay=WD)
    else:
        topt = torch.optim.AdamW(
            tparams, lr=LR, betas=(0.9, 0.999), eps=1e-8, weight_decay=WD
        )
    for grads in grads_seq:
        for p, g in zip(tparams, grads):
            p.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = make_optimizer(
        TrainingConfig(lr=LR, momentum=MOMENTUM, weight_decay=WD, optimizer=opt)
    )
    ours = {str(i): jnp.asarray(p) for i, p in enumerate(params_np)}
    state = tx.init(ours)
    for grads in grads_seq:
        gtree = {str(i): jnp.asarray(g) for i, g in enumerate(grads)}
        updates, state = tx.update(gtree, state, ours)
        ours = optax.apply_updates(ours, updates)
    for i, tp in enumerate(tparams):
        np.testing.assert_allclose(
            np.asarray(ours[str(i)]),
            tp.detach().numpy(),
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"{opt} update rule diverged from torch on tensor {i}",
        )


@pytest.mark.parametrize("opt", ["sgd", "adamw"])
def test_wd_skip_norm_bias_masks_non_kernels(opt):
    """``training.wd_skip_norm_bias`` restricts decay to `kernel` leaves:
    with zero gradients, one step shrinks kernels by exactly lr·wd (SGD)
    while norm scales/biases and token tables stay bit-identical."""
    from seghiero_tpu.config import TrainingConfig

    params = {
        "backbone": {
            "conv": {"kernel": jnp.ones((3, 3, 2, 4)), "bias": jnp.ones((4,))},
            "bn": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
            "pos_embed": jnp.ones((1, 5, 4)),
            "block0": {"ls1_gamma": jnp.ones((4,))},
        }
    }
    tx = make_optimizer(
        TrainingConfig(
            lr=0.5,
            momentum=0.0,
            weight_decay=0.1,
            optimizer=opt,
            wd_skip_norm_bias=True,
        )
    )
    state = tx.init(params)
    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zero, state, params)
    new = optax.apply_updates(params, updates)
    bb = new["backbone"]
    # kernel decayed...
    assert float(jnp.max(jnp.abs(bb["conv"]["kernel"] - 1.0))) > 1e-4
    # ...everything else untouched (zero grad + masked wd = no update)
    for leaf in (
        bb["conv"]["bias"],
        bb["bn"]["scale"],
        bb["bn"]["bias"],
        bb["pos_embed"],
        bb["block0"]["ls1_gamma"],
    ):
        np.testing.assert_array_equal(np.asarray(leaf), np.ones_like(leaf))
    if opt == "sgd":
        np.testing.assert_allclose(
            np.asarray(bb["conv"]["kernel"]), 1.0 - 0.5 * 0.1, rtol=1e-6
        )


@pytest.mark.parametrize("fast", [True, False], ids=["fast-losses", "nhwc-parity"])
def test_sgd_trajectory_matches_reference_2level(rng, classes_2level, fast):
    cfg = _cfg(classes_2level, fast_losses=fast)
    h = cfg.hierarchy
    from seghiero_tpu.train.trainer import make_composite_loss

    composite = make_composite_loss(cfg)
    batches = _batches(rng, N_STEPS, h.n_fine)
    sched_steps = [40_000 + i for i in range(N_STEPS)]  # triplet factor ≈0.25
    ref_fn = RefHieraTripletLoss(
        num_classes=h.n_fine,
        hiera_map=h.fine_to_coarse.tolist(),
        hiera_index=[list(r) for r in h.coarse_ranges],
    )
    ours, theirs, init, ha_params, bstats, ref_head, ref_aux = _run_trajectory(
        cfg, composite, batches, sched_steps, ref_fn, seed=7
    )
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
    assert ours[0] != ours[-1]  # params actually moved
    _assert_final_params_match(cfg, init, ha_params, bstats, ref_head, ref_aux)


def test_sgd_trajectory_matches_reference_3level(rng, classes_3level):
    """3-level trajectory in the f64 oracle mode (same rationale as
    test_e2e_parity.py: fresh-init logits are spatially smooth, the f32
    RMI floor legitimately diverges there). sched_steps stay at 0-2 so
    the triplet factor is ~0 (cos ramp, rmi_hiera_triplet_loss.py:539)
    and the hardcoded-group divergence contributes no gradient; labels
    draw from ids 0-6 (reference group-triplet forward crashes outside
    its hardcoded sets)."""
    from seghiero_tpu.losses.fast import FastRMIHieraTripletLoss

    cfg = _cfg(classes_3level, fast_losses=True)
    h = cfg.hierarchy
    composite = FastRMIHieraTripletLoss(h, use_float64=True)
    batches = _batches(rng, N_STEPS, 7, plant=(1, 2, 5, 6))
    ref_fn = RefRMIHieraTripletLoss(
        n_fine=h.n_fine,
        n_mid=h.n_coarse,
        n_high=h.n_super,
        fine_to_mid=torch.from_numpy(h.fine_to_coarse.astype(np.int64)),
        fine_to_high=torch.from_numpy(h.fine_to_super.astype(np.int64)),
    )
    with jax.enable_x64():
        ours, theirs, init, ha_params, bstats, ref_head, ref_aux = _run_trajectory(
            cfg, composite, batches, list(range(N_STEPS)), ref_fn, seed=11
        )
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
    _assert_final_params_match(cfg, init, ha_params, bstats, ref_head, ref_aux)


def test_rmi_fast_precision_trajectory_tracks_parity(rng, classes_3level):
    """rmi_precision: fast (bf16 residual-Gram RMI, +17% measured on the
    3-level step) must TRAIN like parity mode, not just match one loss
    value within tolerance: same init, same batch stream, N SGD steps
    each — the loss trajectories track throughout and both descend."""
    import jax.numpy as jnp

    from seghiero_tpu.train.trainer import Trainer

    def make_trainer(precision):
        cfg = SegHieroConfig.from_dict(
            {
                "dataset": {"kind": "synthetic", "synthetic_size": 4},
                "classes": classes_3level,
                "model": {"depth": 18, "dtype": "float32"},
                "training": {
                    "epochs": 1,
                    "batch_size": 2,
                    "lr": 0.05,
                    "seed": 3,
                    "log_every": 10**9,
                    "rmi_precision": precision,
                },
                "transform": {"resize": [64, 64], "hflip_prob": 0.0},
                "output": {
                    "checkpoint_dir": "/tmp/rmi_traj_ckpt",
                    "project_name": f"t_{precision}",
                },
            }
        )
        return Trainer(cfg, verbose=False)

    tp = make_trainer("parity")
    tf = make_trainer("fast")
    batches = [b for b, _ in zip(iter(tp.train_loader), range(2))] * 5
    sp, sf = tp.state, tf.state
    loss_p, loss_f = [], []
    for b in batches:
        sp, mp = tp._train_step(sp, b, jnp.asarray(0))
        sf, mf = tf._train_step(sf, b, jnp.asarray(0))
        loss_p.append(float(mp["loss"]))
        loss_f.append(float(mf["loss"]))
    loss_p, loss_f = np.asarray(loss_p), np.asarray(loss_f)
    # The convergence claim: after k compounding fast-precision updates the
    # loss evaluated by step k+1 still matches parity mode step-for-step —
    # i.e. precision error does not accumulate into a different trajectory.
    # (Raw descent is NOT asserted: the composite loss alternates between
    # two batches and its triplet terms are signed, so loss[t] vs loss[0]
    # compares different data; tracking parity IS the convergence evidence.)
    np.testing.assert_allclose(loss_f, loss_p, rtol=0.05)
    # Sanity: the optimizer actually moved — this is a real trajectory, not
    # a frozen state making the tracking assertion vacuous.
    assert np.ptp(loss_p) > 1e-2
    assert np.ptp(loss_f) > 1e-2


def test_hiera_fast_precision_trajectory_tracks_parity(rng, classes_2level):
    """hiera_precision: fast (bf16 storage for the upsampled loss-side
    logits, f32 math — DESIGN.md decision 21) must TRAIN like parity
    mode: same init, same batch stream, N SGD steps each — the loss
    trajectories track step-for-step (same evidence pattern as the
    rmi_precision test above)."""
    import jax.numpy as jnp

    from seghiero_tpu.train.trainer import Trainer

    def make_trainer(precision):
        cfg = SegHieroConfig.from_dict(
            {
                "dataset": {"kind": "synthetic", "synthetic_size": 4},
                "classes": classes_2level,
                "model": {"depth": 18, "dtype": "float32"},
                "training": {
                    "epochs": 1,
                    "batch_size": 2,
                    "lr": 0.05,
                    "seed": 3,
                    "log_every": 10**9,
                    "hiera_precision": precision,
                },
                "transform": {"resize": [64, 64], "hflip_prob": 0.0},
                "output": {
                    "checkpoint_dir": "/tmp/hiera_traj_ckpt",
                    "project_name": f"h_{precision}",
                },
            }
        )
        return Trainer(cfg, verbose=False)

    tp = make_trainer("parity")
    tf = make_trainer("fast")
    batches = [b for b, _ in zip(iter(tp.train_loader), range(2))] * 5
    sp, sf = tp.state, tf.state
    loss_p, loss_f = [], []
    for b in batches:
        sp, mp = tp._train_step(sp, b, jnp.asarray(0))
        sf, mf = tf._train_step(sf, b, jnp.asarray(0))
        loss_p.append(float(mp["loss"]))
        loss_f.append(float(mf["loss"]))
    loss_p, loss_f = np.asarray(loss_p), np.asarray(loss_f)
    # bf16 logit rounding compounds through the parameter updates; 10%
    # still cleanly separates tracking from divergence (measured worst
    # step: 6.3% after 10 compounding updates at lr 0.05)
    np.testing.assert_allclose(loss_f, loss_p, rtol=0.10)
    assert np.ptp(loss_p) > 1e-2
    assert np.ptp(loss_f) > 1e-2
