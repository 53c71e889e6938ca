"""Golden-parity tests: our JAX losses vs the PyTorch reference modules,
imported directly from /root/reference (SURVEY.md §4 test plan)."""

import numpy as np
import pytest
import torch

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.losses import (
    HieraTripletLoss,
    RMIHieraTripletLoss,
    hiera_bce_two_level,
    prepare_targets_two_level,
    softmax_cross_entropy,
    tree_triplet_loss_groups,
    tree_triplet_loss_range,
)

from reference_oracle import (
    RefCrossEntropyLoss,
    RefHieraTripletLoss,
    RefRMIHieraTripletLoss,
    RefTreeTripletLossGroups,
    RefTreeTripletLossRange,
    random_labels,
    random_logits,
    random_unit_embedding,
    ref_losses_hiera_two_level,
    ref_prepare_targets_two_level,
    to_torch_nchw,
)

pytestmark = pytest.mark.fast


@pytest.fixture
def hier2(classes_2level):
    return Hierarchy.from_class_config(classes_2level)


@pytest.fixture
def hier3(classes_3level):
    return Hierarchy.from_class_config(classes_3level)


# ---------------------------------------------------------------------------
# Cross entropy
# ---------------------------------------------------------------------------


def test_cross_entropy_mmseg_divide_by_all(rng, hier2):
    logits = random_logits(rng, 2, 8, 9, hier2.n_fine)
    labels = random_labels(rng, 2, 8, 9, hier2.n_fine, p_ignore=0.2)
    ours = float(softmax_cross_entropy(logits, labels, divide_by="all"))
    ref = RefCrossEntropyLoss()(to_torch_nchw(logits), torch.from_numpy(labels).long())
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_cross_entropy_torch_default_divide_by_valid(rng, hier2):
    logits = random_logits(rng, 2, 8, 9, hier2.n_fine)
    labels = random_labels(rng, 2, 8, 9, hier2.n_fine, p_ignore=0.2)
    ours = float(softmax_cross_entropy(logits, labels, divide_by="valid"))
    ref = torch.nn.CrossEntropyLoss(ignore_index=255)(
        to_torch_nchw(logits), torch.from_numpy(labels).long()
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_cross_entropy_class_weight(rng, hier2):
    logits = random_logits(rng, 2, 6, 7, hier2.n_fine)
    labels = random_labels(rng, 2, 6, 7, hier2.n_fine)
    cw = rng.random(hier2.n_fine).astype(np.float32) + 0.5
    ours = float(softmax_cross_entropy(logits, labels, class_weight=cw))
    ref = RefCrossEntropyLoss(class_weight=cw.tolist())(
        to_torch_nchw(logits), torch.from_numpy(labels).long()
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_cross_entropy_all_ignored_is_zero(hier2):
    logits = np.ones((1, 4, 4, hier2.n_fine), np.float32)
    labels = np.full((1, 4, 4), 255, np.int32)
    assert float(softmax_cross_entropy(logits, labels)) == 0.0


# ---------------------------------------------------------------------------
# 2-level targets + hierarchy BCE
# ---------------------------------------------------------------------------


def test_prepare_targets_two_level_matches_reference(rng, hier2):
    labels = random_labels(rng, 2, 10, 11, hier2.n_fine, p_ignore=0.3)
    _, ours_coarse = prepare_targets_two_level(labels, hier2)
    _, ref_coarse, _ = ref_prepare_targets_two_level(
        torch.from_numpy(labels).long(), [list(r) for r in hier2.coarse_ranges]
    )
    np.testing.assert_array_equal(np.asarray(ours_coarse), ref_coarse.numpy())


def test_hiera_bce_two_level_matches_reference(rng, hier2):
    logits = random_logits(rng, 2, 12, 10, hier2.total_classes)
    labels = random_labels(rng, 2, 12, 10, hier2.n_fine, p_ignore=0.15)
    t_fine, t_coarse = prepare_targets_two_level(labels, hier2)
    ours = float(hiera_bce_two_level(logits, t_fine, t_coarse, hier2))
    ref = ref_losses_hiera_two_level(
        to_torch_nchw(logits),
        torch.from_numpy(labels).long(),
        torch.from_numpy(np.asarray(t_coarse)).long(),
        hier2.n_fine,
        [list(r) for r in hier2.coarse_ranges],
    )
    np.testing.assert_allclose(ours, float(ref), rtol=2e-4)


# ---------------------------------------------------------------------------
# Tree-triplet losses
# ---------------------------------------------------------------------------


def _ref_triplet_range(hier2, emb, labels):
    fn = RefTreeTripletLossRange(
        num_classes=hier2.n_fine,
        hiera_map=hier2.fine_to_coarse.tolist(),
        hiera_index=[list(r) for r in hier2.coarse_ranges],
    )
    loss, count = fn(to_torch_nchw(emb), torch.from_numpy(labels).long())
    return (0.0 if loss is None else float(loss)), int(count)


def test_triplet_range_matches_reference(rng, hier2):
    emb = random_unit_embedding(rng, 2, 8, 8, 16)
    labels = random_labels(rng, 2, 32, 32, hier2.n_fine, p_ignore=0.1)
    ours_loss, ours_count = tree_triplet_loss_range(emb, labels, hier2)
    ref_loss, ref_count = _ref_triplet_range(hier2, emb, labels)
    assert int(ours_count) == ref_count
    np.testing.assert_allclose(float(ours_loss), ref_loss, rtol=1e-4, atol=1e-6)


def test_triplet_range_respects_max_triplet_cap(rng, hier2):
    # large uniform regions force min_size == max_triplet
    labels = np.zeros((1, 64, 64), np.int32)
    labels[:, :, 32:] = 4  # different coarse bucket
    labels[:, :5, :5] = 1  # positives for class 0's bucket
    emb = random_unit_embedding(rng, 1, 16, 16, 8)
    ours_loss, ours_count = tree_triplet_loss_range(emb, labels, hier2)
    ref_loss, ref_count = _ref_triplet_range(hier2, emb, labels)
    assert int(ours_count) == ref_count
    np.testing.assert_allclose(float(ours_loss), ref_loss, rtol=1e-4, atol=1e-6)


def test_triplet_range_no_triplets(rng, hier2):
    # single class present -> no positives -> count 0, loss 0
    labels = np.full((1, 16, 16), 7, np.int32)  # singleton bucket
    emb = random_unit_embedding(rng, 1, 4, 4, 8)
    loss, count = tree_triplet_loss_range(emb, labels, hier2)
    assert int(count) == 0 and float(loss) == 0.0


def test_triplet_groups_matches_reference(rng, hier2):
    upper, lower = (1, 2, 3, 4), (5, 6)
    # keep labels within upper ∪ lower ∪ {0, 255}: the reference crashes on
    # unlisted classes (rmi_tree_triplet_loss.py:39)
    pool = np.array([0, 1, 2, 3, 4, 5, 6, 255])
    labels = pool[np.random.default_rng(1).integers(0, len(pool), size=(2, 24, 24))].astype(
        np.int32
    )
    emb = random_unit_embedding(rng, 2, 6, 6, 16)
    ours_loss, ours_count = tree_triplet_loss_groups(
        emb, labels, upper, lower, hier2.n_fine
    )
    fn = RefTreeTripletLossGroups(
        num_classes=hier2.n_fine, upper_ids=list(upper), lower_ids=list(lower)
    )
    ref_loss, ref_count = fn(to_torch_nchw(emb), torch.from_numpy(labels).long())
    assert int(ours_count) == int(ref_count)
    np.testing.assert_allclose(
        float(ours_loss), 0.0 if ref_loss is None else float(ref_loss), rtol=1e-4
    )


# ---------------------------------------------------------------------------
# Full composite losses
# ---------------------------------------------------------------------------


def test_full_2level_loss_matches_reference(rng, hier2):
    B, H, W = 2, 24, 24
    emb = random_unit_embedding(rng, B, 6, 6, 16)
    logits_full = random_logits(rng, B, H, W, hier2.total_classes)
    logits_before = random_logits(rng, B, 12, 12, hier2.n_fine)
    labels = random_labels(rng, B, H, W, hier2.n_fine, p_ignore=0.1)

    ours_fn = HieraTripletLoss(hier2, loss_weight=1.0)
    for step in (0, 40_000, 120_000):
        ours = float(
            ours_fn(
                np.array(step),
                emb,
                logits_before,
                logits_full,
                labels,
            )
        )
        ref_fn = RefHieraTripletLoss(
            num_classes=hier2.n_fine,
            hiera_map=hier2.fine_to_coarse.tolist(),
            hiera_index=[list(r) for r in hier2.coarse_ranges],
        )
        ref = ref_fn(
            torch.tensor([step]),
            to_torch_nchw(emb),
            to_torch_nchw(logits_before),
            to_torch_nchw(logits_full),
            torch.from_numpy(labels).long(),
        )
        np.testing.assert_allclose(ours, float(ref), rtol=2e-4)


def test_full_3level_loss_matches_reference(rng, hier3):
    B, H, W = 2, 16, 16
    upper, lower = (1, 2, 3, 4), (5, 6)
    pool = np.array([0, 1, 2, 3, 4, 5, 6, 255])
    labels = pool[
        np.random.default_rng(2).integers(0, len(pool), size=(B, H, W))
    ].astype(np.int32)
    emb = random_unit_embedding(rng, B, 4, 4, 16)
    logits_full = random_logits(rng, B, H, W, hier3.total_classes)
    logits_before = random_logits(rng, B, 8, 8, hier3.n_fine)

    ours_fn = RMIHieraTripletLoss(hier3, upper_ids=upper, lower_ids=lower)
    ref_fn = RefRMIHieraTripletLoss(
        n_fine=hier3.n_fine,
        n_mid=hier3.n_coarse,
        n_high=hier3.n_super,
        fine_to_mid=torch.from_numpy(hier3.fine_to_coarse.astype(np.int64)),
        # pass the FIXED fine→high LUT so both sides compute the same math
        # (the reference's own builder is buggy, train.py:86-99)
        fine_to_high=torch.from_numpy(hier3.fine_to_super.astype(np.int64)),
    )
    # the reference hardcodes upper/lower for n_fine<=15 to exactly these
    assert ref_fn.upper_ids == list(upper) and ref_fn.lower_ids == list(lower)

    for step in (0, 30_000, 90_000):
        ours = float(
            ours_fn(np.array(step), emb, logits_before, logits_full, labels)
        )
        ref = ref_fn(
            torch.tensor([step]),
            to_torch_nchw(emb),
            to_torch_nchw(logits_before),
            to_torch_nchw(logits_full),
            torch.from_numpy(labels).long(),
        )
        # reference RMI runs in float64; ours defaults to f32 → loose tol
        np.testing.assert_allclose(ours, float(ref), rtol=5e-3)


def test_losses_are_jittable_and_grad_finite(rng, hier3):
    import jax
    import jax.numpy as jnp

    B, H, W = 1, 16, 16
    emb = random_unit_embedding(rng, B, 4, 4, 8)
    logits = random_logits(rng, B, H, W, hier3.total_classes)
    before = random_logits(rng, B, 8, 8, hier3.n_fine)
    labels = random_labels(rng, B, H, W, 7, p_ignore=0.1)  # only listed classes

    fn = RMIHieraTripletLoss(hier3, upper_ids=(1, 2, 3, 4), lower_ids=(5, 6))

    @jax.jit
    def loss_fn(logits, emb):
        return fn(jnp.array(0), emb, before, logits, labels)

    g = jax.grad(lambda lg: loss_fn(lg, emb))(logits)
    assert np.isfinite(float(loss_fn(logits, emb)))
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# 3-level focal (the reference's dead hiera_loss.py made live)
# ---------------------------------------------------------------------------


def _dead_focal_hierarchy(upper, lower):
    """Range-hierarchy equivalent of the dead code's fixed structure:
    mid = {background, upper, lower}, top = {background, foreground}
    (hiera_loss.py:6-25)."""
    n_fine = lower[-1] + 1
    return Hierarchy.from_class_config(
        {
            "coarse_to_fine_map": [
                [0],
                [upper[0], upper[-1]],
                [lower[0], lower[-1]],
            ],
            "coarse_names": {0: "back", 1: "upper", 2: "lower"},
            "fine_names": {i: f"f{i}" for i in range(n_fine)},
            "super_coarse_to_coarse_map": [[0], [1, 2]],
            "super_coarse_names": {0: "back", 1: "fore"},
        }
    )


@pytest.mark.parametrize(
    "upper,lower",
    [
        ([1, 2, 3, 4], [5, 6]),  # Pascal-Person-Part shape (hiera_loss.py:139-140)
        ([1, 2, 3, 4, 5], [6, 7, 8]),  # wider, still the len<=5 branch
    ],
)
def test_hiera_focal_three_level_matches_dead_reference(rng, upper, lower):
    """hiera_focal_three_level vs the dead reference losses_hiera_focal
    (hiera_loss.py:72-115), executed as an oracle namespace. The
    ``len(upper_ids)>5`` branch is untestable generally — it hardcodes a
    Cityscapes-19 channel reordering (hiera_loss.py:55) that only
    type-checks for that exact non-contiguous id layout; range-based
    hierarchies keep fine-channel order by construction."""
    import jax.numpy as jnp

    from reference_oracle import load_dead_hiera_loss_module
    from seghiero_tpu.losses import hiera_focal_three_level
    from seghiero_tpu.losses.hiera import prepare_targets_three_level

    ns = load_dead_hiera_loss_module()
    h = _dead_focal_hierarchy(upper, lower)
    n_fine = h.n_fine
    B, H, W = 2, 17, 23
    logits = random_logits(rng, B, H, W, h.total_classes)
    labels = random_labels(rng, B, H, W, n_fine, p_ignore=0.15)

    t = torch.from_numpy(labels.astype(np.int64))
    targets, t_mid, t_top = ns["prepare_targets"](t.clone(), list(upper), list(lower))
    ref = ns["losses_hiera_focal"](
        to_torch_nchw(logits),
        targets.clone(),
        t_mid,
        t_top,
        n_fine,
        list(upper),
        list(lower),
    )

    t_f, t_m, t_h = prepare_targets_three_level(jnp.asarray(labels), h)
    ours = float(
        hiera_focal_three_level(jnp.asarray(logits), t_f, t_m, t_h, h)
    )
    np.testing.assert_allclose(ours, float(ref), rtol=2e-5, atol=2e-6)


def test_composite_3level_focal_variant_runs_and_differs(rng, hier3):
    """RMIHieraTripletLoss(hiera_variant='focal') swaps only the hiera
    term; it must run, differ from the bce variant, and stay finite."""
    import jax
    import jax.numpy as jnp

    B, H, W = 1, 16, 16
    emb = random_unit_embedding(rng, B, 4, 4, 8)
    logits = random_logits(rng, B, H, W, hier3.total_classes)
    before = random_logits(rng, B, 8, 8, hier3.n_fine)
    labels = random_labels(rng, B, H, W, 7, p_ignore=0.1)

    kw = dict(upper_ids=(1, 2, 3, 4), lower_ids=(5, 6))
    bce = RMIHieraTripletLoss(hier3, **kw)
    focal = RMIHieraTripletLoss(hier3, hiera_variant="focal", **kw)

    @jax.jit
    def loss_fn(lg):
        return focal(jnp.array(0), emb, before, lg, labels)

    v_focal = float(loss_fn(logits))
    v_bce = float(bce(jnp.array(0), emb, before, logits, labels))
    g = jax.grad(loss_fn)(logits)
    assert np.isfinite(v_focal) and v_focal != v_bce
    assert np.all(np.isfinite(np.asarray(g)))
