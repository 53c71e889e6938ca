"""Sliding-window inference + combined parallel-mode robustness."""

import dataclasses

import numpy as np
import pytest

from tests.test_train_e2e import tiny_config


@pytest.fixture
def trained(classes_2level, tmp_path):
    from seghiero_tpu.train.trainer import Trainer
    from seghiero_tpu.infer.predictor import Predictor

    cfg = tiny_config(classes_2level, tmp_path, epochs=1, size=4)
    Trainer(cfg, verbose=False).fit()
    return cfg, Predictor.from_checkpoint(cfg)


def test_sliding_equals_direct_when_window_covers(trained, rng):
    cfg, pred = trained
    img = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    direct = pred.predict_array(img)
    sliding = pred.predict_sliding(img, window=(32, 32))
    for lvl in direct:
        np.testing.assert_array_equal(direct[lvl], sliding[lvl])


def test_sliding_overlapping_windows(trained, rng):
    cfg, pred = trained
    img = rng.integers(0, 255, (1, 48, 64, 3), dtype=np.uint8)
    out = pred.predict_sliding(img, window=(32, 32), stride=(16, 16), consistent=True)
    assert out["fine"].shape == (1, 48, 64)
    h = cfg.hierarchy
    np.testing.assert_array_equal(out["coarse"], h.fine_to_coarse[out["fine"]])


def test_sliding_rejects_oversized_window(trained, rng):
    _, pred = trained
    img = rng.integers(0, 255, (1, 16, 16, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="window"):
        pred.predict_sliding(img, window=(32, 32))


def test_ddp_3level_with_fast_losses(classes_3level, tmp_path):
    """DDP shard_map mode × 3-level RMI fast path × 8-device mesh."""
    from seghiero_tpu.train.trainer import Trainer

    cfg = tiny_config(
        classes_3level,
        tmp_path,
        epochs=1,
        batch=8,
        size=8,
        mesh={"data": 8},
        extra_training={"parallel_mode": "ddp"},
    )
    trainer = Trainer(cfg, verbose=False)
    assert trainer.composite.__class__.__name__ == "FastRMIHieraTripletLoss"
    history = trainer.fit()
    assert np.isfinite(history[0]["train_loss"])


def test_tta_single_scale_noflip_equals_direct(trained, rng):
    """scales=(1.0,), flip=False is a 1-view ensemble: softmax-averaging
    is then argmax-equivalent to the direct logits path."""
    cfg, pred = trained
    img = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    direct = pred.predict_array(img)
    tta = pred.predict_tta(img, scales=(1.0,), flip=False)
    for lvl in direct:
        np.testing.assert_array_equal(direct[lvl], tta[lvl])


def test_tta_multiscale_flip_runs_and_is_consistent(trained, rng):
    cfg, pred = trained
    h = cfg.hierarchy
    img = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    tta = pred.predict_tta(
        img, scales=(0.75, 1.0), flip=True, out_hw=(48, 48), consistent=True
    )
    assert tta["fine"].shape == (2, 48, 48)
    assert tta["fine"].max() < h.n_fine and tta["fine"].min() >= 0
    np.testing.assert_array_equal(
        tta["coarse"], np.asarray(h.fine_to_coarse)[tta["fine"]]
    )


def test_tta_flip_equivariance(trained, rng):
    """A flip-ensembled prediction of a mirrored image is the mirror of
    the prediction of the original (the two views swap roles, softmax
    averaging commutes with the mirror)."""
    cfg, pred = trained
    img = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    a = pred.predict_tta(img, scales=(1.0,), flip=True)
    b = pred.predict_tta(img[:, :, ::-1].copy(), scales=(1.0,), flip=True)
    for lvl in a:
        np.testing.assert_array_equal(a[lvl][:, :, ::-1], b[lvl])
