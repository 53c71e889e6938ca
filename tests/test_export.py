"""Serving-artifact export/reload (seghiero_tpu/infer/export.py).

The artifact must reproduce Predictor.predict_array exactly (same math,
same weights embedded as constants), accept ANY batch size through the
symbolic batch dim, and round-trip through serialize/deserialize in a
process that has no model code — simulated here by calling the
deserialized function directly.
"""

import json
import os

import jax
import numpy as np
import pytest

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.infer.export import (
    export_predictor,
    load_exported,
    serve_masks,
)
from seghiero_tpu.infer.predictor import Predictor
from seghiero_tpu.models.segmenter import build_model


HW = 32


def _cfg(classes, tmp_path):
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
            },
            "training": {"epochs": 1, "batch_size": 2, "lr": 0.01},
            "transform": {"resize": [HW, HW]},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "x"},
        }
    )


def _predictor(cfg):
    import jax.numpy as jnp

    model = build_model(cfg)
    variables = model.init(jax.random.key(3), jnp.zeros((1, HW, HW, 3)), train=False)
    return Predictor(cfg, variables)


@pytest.mark.medium
def test_export_roundtrip_matches_predictor(rng, classes_2level, tmp_path):
    cfg = _cfg(classes_2level, tmp_path)
    pred = _predictor(cfg)
    out_dir = str(tmp_path / "artifact")
    meta = export_predictor(pred, out_dir, platforms=("cpu",))
    assert os.path.exists(os.path.join(out_dir, "model.jaxexp"))
    with open(os.path.join(out_dir, "meta.json")) as f:
        assert json.load(f)["levels"] == {"fine": 9, "coarse": 4}
    assert meta["input"]["shape"] == ["b", HW, HW, 3]

    exported = load_exported(out_dir)
    for batch in (1, 3):  # symbolic batch: one artifact, several sizes
        images = rng.integers(0, 256, (batch, HW, HW, 3)).astype(np.uint8)
        got = serve_masks(exported, images)
        want = pred.predict_array(images)
        assert set(got) == {"fine", "coarse"}
        for lvl in got:
            assert got[lvl].shape == (batch, HW, HW)
            # ≤256-class levels ship as uint8 (4× smaller serving egress)
            assert got[lvl].dtype == np.uint8
            np.testing.assert_array_equal(got[lvl], want[lvl])


def test_export_consistent_decode_3level(rng, classes_3level, tmp_path):
    cfg = _cfg(classes_3level, tmp_path)
    pred = _predictor(cfg)
    out_dir = str(tmp_path / "artifact3")
    export_predictor(pred, out_dir, platforms=("cpu",), consistent=True)
    exported = load_exported(out_dir)
    images = rng.integers(0, 256, (2, HW, HW, 3)).astype(np.uint8)
    got = serve_masks(exported, images)
    want = pred.predict_array(images, consistent=True)
    h = cfg.hierarchy
    for lvl in ("fine", "coarse", "super"):
        np.testing.assert_array_equal(got[lvl], want[lvl])
    # tree consistency is baked into the artifact
    np.testing.assert_array_equal(
        got["coarse"], np.asarray(h.fine_to_coarse)[got["fine"]]
    )
