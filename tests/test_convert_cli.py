"""Checkpoint-conversion CLI + consistent decode."""

import numpy as np
import pytest
import yaml


def test_export_then_import_roundtrip(tmp_path, classes_2level):
    """Train a step, export to reference-style .pth, re-import it, and
    check the predictions agree (the full migration loop)."""
    import torch

    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.infer.predictor import Predictor
    from seghiero_tpu.train.trainer import Trainer
    from tools.convert_checkpoint import main as convert_main

    cfg = tiny_config(classes_2level, tmp_path, epochs=1, size=4)
    trainer = Trainer(cfg, verbose=False)
    trainer.fit()

    cfg_yaml = tmp_path / "c.yaml"
    cfg_yaml.write_text(yaml.safe_dump(cfg.raw | {
        "dataset": {"kind": "synthetic", "synthetic_size": 4},
        "output": {"checkpoint_dir": str(tmp_path), "project_name": "t"},
        "model": dict(cfg.raw.get("model", {})),
        "classes": classes_2level,
        "training": dict(cfg.raw.get("training", {})),
        "transform": dict(cfg.raw.get("transform", {})),
    }))

    pth = tmp_path / "exported.pth"
    assert convert_main(["export", "--config", str(cfg_yaml), "--out", str(pth)]) == 0
    ckpt = torch.load(pth, weights_only=False)
    assert {"backbone_state_dict", "aspp_head_state_dict", "aux_head_state_dict"} <= set(
        ckpt
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    p_orbax = Predictor.from_checkpoint(cfg)  # best orbax ckpt
    p_torch = Predictor.from_checkpoint(cfg, str(pth))  # re-imported .pth
    a = p_orbax.predict_array(img)
    b = p_torch.predict_array(img)
    np.testing.assert_array_equal(a["fine"], b["fine"])
    np.testing.assert_array_equal(a["coarse"], b["coarse"])


def test_consistent_decode(tmp_path, classes_2level):
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.infer.predictor import Predictor
    from seghiero_tpu.train.trainer import Trainer

    cfg = tiny_config(classes_2level, tmp_path, epochs=1, size=4)
    trainer = Trainer(cfg, verbose=False)
    trainer.fit()
    pred = Predictor.from_checkpoint(cfg)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    out = pred.predict_array(img, consistent=True)
    h = cfg.hierarchy
    np.testing.assert_array_equal(out["coarse"], h.fine_to_coarse[out["fine"]])
