"""Many-class (ADE20K-scale) robustness.

Round-1 `lut_lookup` / `_expand_channels` unrolled O(n_classes) op
chains — profiled-fast at the ≤31 classes they were built for, but
program-size- and compute-pathological at 150+ fine classes. Both now
switch to a plain gather above ``LUT_UNROLL_MAX`` entries
(losses/hiera.py); these tests pin (a) the two lowerings agree and
(b) a 150-fine-class 3-level config traces, compiles, and completes a
full train step + eval step.
"""

import numpy as np
import pytest

from seghiero_tpu.config import SegHieroConfig


def _classes_150():
    """150 fine → 30 coarse (buckets of 5) → 5 super (groups of 6)."""
    return {
        "coarse_to_fine_map": [[5 * i, 5 * i + 4] for i in range(30)],
        "coarse_names": {i: f"c{i}" for i in range(30)},
        "fine_names": {i: f"f{i}" for i in range(150)},
        "super_coarse_to_coarse_map": [[6 * i, 6 * i + 5] for i in range(5)],
        "super_coarse_names": {i: f"s{i}" for i in range(5)},
    }


def test_lut_lookup_gather_path_matches_unrolled(rng):
    import jax.numpy as jnp

    from seghiero_tpu.losses import hiera

    lut = rng.integers(0, 30, 150).astype(np.int64)
    idx = jnp.asarray(rng.integers(0, 150, (2, 17, 33)).astype(np.int32))
    assert len(lut) > hiera.LUT_UNROLL_MAX  # exercises the gather path
    got = hiera.lut_lookup(lut, idx)
    # force the unrolled path for the oracle
    old = hiera.LUT_UNROLL_MAX
    try:
        hiera.LUT_UNROLL_MAX = 10_000
        want = hiera.lut_lookup(lut, idx)
    finally:
        hiera.LUT_UNROLL_MAX = old
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lut_lookup_monotone_path_matches_gather(rng):
    """The monotone bucket-boundary shortcut (long non-decreasing
    tables, e.g. contiguous 150-class hierarchies) must equal the
    gather exactly — including out-of-range idx, which the gather
    clamps."""
    import jax.numpy as jnp

    from seghiero_tpu.losses import hiera

    lut = np.sort(rng.integers(0, 15, 150)).astype(np.int64)
    assert len(lut) > hiera.LUT_UNROLL_MAX
    idx = jnp.asarray(rng.integers(0, 300, (2, 17, 33)).astype(np.int32))
    got = np.asarray(hiera.lut_lookup(lut, idx))
    want = np.asarray(lut, np.int32)[np.clip(np.asarray(idx), 0, 149)]
    np.testing.assert_array_equal(got, want)


def test_expand_channels_gather_path_matches_concat(rng):
    import jax.numpy as jnp

    from seghiero_tpu.losses import fast, hiera

    x = jnp.asarray(rng.standard_normal((2, 7, 5, 6)).astype(np.float32))
    idx = rng.integers(0, 7, 150).tolist()  # >LUT_UNROLL_MAX output chans
    got = fast._expand_channels(x, idx)
    old = hiera.LUT_UNROLL_MAX
    try:
        hiera.LUT_UNROLL_MAX = 10_000
        want = fast._expand_channels(x, idx)
    finally:
        hiera.LUT_UNROLL_MAX = old
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_150_class_3level_train_and_eval_step(tmp_path):
    """The whole jitted train step (forward + 3-level composite with RMI
    + backward + update) and an eval step must compile and run at
    150 fine classes — the scale the round-1 unrolled chains were never
    exercised at."""
    import jax.numpy as jnp

    from seghiero_tpu.train.trainer import Trainer

    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 2},
            "classes": _classes_150(),
            "model": {
                "depth": 18,
                "dtype": "float32",
                "aspp_channels": 16,
                "c1_channels": 8,
                "proj_dim": 8,
                "dilations": [1, 2, 3, 4],
            },
            "training": {"epochs": 1, "batch_size": 2, "lr": 0.005,
                         "log_every": 1000, "num_workers": 0},
            "transform": {"resize": [32, 32], "hflip_prob": 0.0},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "mc"},
        }
    )
    assert cfg.hierarchy.n_fine == 150 and cfg.hierarchy.total_classes == 185
    trainer = Trainer(cfg, verbose=False)
    batch = next(iter(trainer.train_loader))
    state, m = trainer._train_step(trainer.state, batch, jnp.asarray(0))
    assert np.isfinite(float(m["loss"]))
    out = trainer._eval_step(state, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["levels"]["fine"]["cm"].shape == (150, 150)
