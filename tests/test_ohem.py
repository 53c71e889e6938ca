"""OHEM hard-pixel mining (losses/ohem.py).

Oracle: a direct NumPy transcription of mmseg's OHEMPixelSampler.sample
(thresh mode) — sort the VALID pixels' true-class probabilities,
threshold at max(sorted[min(batch_kept, n_valid-1)], thresh), keep
strictly-below. The reference repo has no sampler; this is the standard
mmseg training tool its loss wrappers pair with.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seghiero_tpu.losses.ohem import ohem_pixel_weight



def oracle_weight(p_true, valid, thresh, batch_kept):
    """mmseg OHEMPixelSampler.sample, thresh mode, NumPy."""
    p = p_true.reshape(-1)
    v = valid.reshape(-1)
    pv = np.sort(p[v])
    if pv.size > 0:
        min_threshold = pv[min(batch_kept, pv.size - 1)]
    else:
        min_threshold = 0.0
    threshold = max(min_threshold, thresh)
    w = (v & (p < threshold)).astype(np.float32)
    return w.reshape(p_true.shape)


@pytest.mark.parametrize("batch_kept", [0, 7, 40, 199])
@pytest.mark.parametrize("thresh", [0.3, 0.7, 1.0])
def test_matches_mmseg_oracle(thresh, batch_kept):
    rng = np.random.default_rng(0)
    p = rng.random((2, 10, 10)).astype(np.float32)
    valid = rng.random((2, 10, 10)) > 0.2
    ours = np.asarray(ohem_pixel_weight(jnp.asarray(p), jnp.asarray(valid),
                                        thresh, batch_kept))
    ref = oracle_weight(p, valid, thresh, batch_kept)
    if batch_kept < int(valid.sum()):
        np.testing.assert_array_equal(ours, ref)
    else:
        # documented divergence: keep ALL valid pixels (mmseg drops the
        # single easiest one); ours must keep a superset
        assert np.all(ours >= ref)
        np.testing.assert_array_equal(ours, valid.astype(np.float32))


def test_floor_keeps_hardest_pixels():
    # all pixels "easy" (p >= thresh): the floor must still keep the
    # batch_kept hardest (lowest-p) pixels
    p = np.linspace(0.9, 0.99, 64, dtype=np.float32).reshape(1, 8, 8)
    valid = np.ones_like(p, dtype=bool)
    w = np.asarray(ohem_pixel_weight(jnp.asarray(p), jnp.asarray(valid), 0.7, 10))
    assert w.sum() == 10
    assert w.reshape(-1)[:10].sum() == 10  # the 10 smallest p


def test_thresh_dominates_when_many_hard():
    # more than batch_kept pixels below thresh: plain thresholding
    rng = np.random.default_rng(1)
    p = (rng.random((1, 16, 16)) * 0.5).astype(np.float32)  # all < 0.7
    valid = np.ones_like(p, dtype=bool)
    w = np.asarray(ohem_pixel_weight(jnp.asarray(p), jnp.asarray(valid), 0.7, 5))
    np.testing.assert_array_equal(w, np.ones_like(p, np.float32))


def test_ce_paths_agree_with_ohem():
    """NHWC softmax_cross_entropy(ohem=) ≡ C-major _ce_cmajor(ohem=)."""
    from seghiero_tpu.losses.cross_entropy import softmax_cross_entropy
    from seghiero_tpu.losses.fast import _ce_cmajor

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 12, 12, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=(2, 12, 12)).astype(np.int32)
    labels[0, :3] = 255
    ohem = (0.7, 50)
    a = softmax_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), divide_by="all", ohem=ohem
    )
    b = _ce_cmajor(
        jnp.asarray(logits).transpose(0, 3, 1, 2),
        jnp.asarray(labels),
        255,
        ohem=ohem,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_composite_ohem_fast_vs_parity():
    """Full 2-level composite: fast path ≡ NHWC path with OHEM on."""
    from seghiero_tpu.hierarchy import Hierarchy
    from seghiero_tpu.losses.hiera import HieraTripletLoss
    from seghiero_tpu.losses.fast import FastHieraTripletLoss
    from seghiero_tpu.ops.resize import resize_bilinear

    h = Hierarchy.from_class_config(
        {
            "coarse_to_fine_map": [[0, 2], [3, 4]],
            "coarse_names": {0: "a", 1: "b"},
            "fine_names": {i: f"f{i}" for i in range(5)},
        }
    )
    rng = np.random.default_rng(3)
    B, Hh, Ww = 2, 16, 16
    C = h.n_fine + h.n_coarse
    logits_lo = jnp.asarray(rng.normal(size=(B, 4, 4, C)).astype(np.float32))
    emb = rng.normal(size=(B, 4, 4, 8)).astype(np.float32)
    emb = jnp.asarray(emb / np.linalg.norm(emb, axis=-1, keepdims=True))
    label = jnp.asarray(rng.integers(0, 5, size=(B, Hh, Ww)).astype(np.int32))
    step = jnp.asarray(100)
    ohem = (0.7, 30)

    fast = FastHieraTripletLoss(h, ohem=ohem)
    lf_full = resize_bilinear(logits_lo, (Hh, Ww))
    ref = HieraTripletLoss(hierarchy=h, ohem=ohem)
    a = fast(step, emb, logits_lo, logits_lo, label)
    b = ref(step, emb, None, lf_full, label)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4)


def test_trainer_smoke_with_ohem():
    """One jitted train step with training.ohem_thresh set."""
    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 2},
            "classes": {
                "coarse_to_fine_map": [[0, 2], [3, 4]],
                "coarse_names": {0: "a", 1: "b"},
                "fine_names": {i: f"f{i}" for i in range(5)},
            },
            "model": {"depth": 18},
            "training": {
                "epochs": 1,
                "batch_size": 2,
                "lr": 0.01,
                "ohem_thresh": 0.7,
                "ohem_min_kept": 50,
            },
            "transform": {"resize": [32, 32], "hflip_prob": 0.0},
            "output": {"checkpoint_dir": "/tmp/ohem_ckpt", "project_name": "t"},
        }
    )
    tr = Trainer(cfg, verbose=False)
    batch = next(iter(tr.train_loader))
    state, metrics = tr._train_step(tr.state, batch, jnp.asarray(0))
    assert np.isfinite(float(metrics["loss"]))


def test_config_validation():
    from seghiero_tpu.config import TrainingConfig

    with pytest.raises(ValueError, match="ohem_thresh"):
        TrainingConfig.from_dict({"ohem_thresh": 1.5})
    with pytest.raises(ValueError, match="ohem_min_kept"):
        TrainingConfig.from_dict({"ohem_thresh": 0.7, "ohem_min_kept": -1})
