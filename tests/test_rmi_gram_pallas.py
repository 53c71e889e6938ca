"""Equivalence of the Pallas RMI Gram kernels (ops/pallas/rmi_gram.py)
with the materialized XLA core (losses/rmi.py:_rmi_logdet_core), values
and gradients, in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.losses.rmi import _rmi_logdet_core
from seghiero_tpu.ops.pallas.rmi_gram import (
    _pick_tile_rows,
    rmi_logdet_pallas_cmajor,
)


def _core_reference(oh, lg):
    """Materialized-core half-logdets for [B, C, H, W] maps."""
    B, C, H, W = lg.shape
    nh, nw = H - 2, W - 2

    def nbhd(x):
        views = [
            x[:, :, y : y + nh, xx : xx + nw] for y in range(3) for xx in range(3)
        ]
        return jnp.stack(views, axis=2).reshape(B, C, 9, nh * nw)

    pr = jax.nn.sigmoid(lg) + 1e-6
    la = jax.lax.stop_gradient(nbhd(jnp.asarray(oh)))
    return _rmi_logdet_core(la, nbhd(pr), 9, False)


def _pallas(oh, lg):
    pr = jax.nn.sigmoid(lg) + 1e-6
    return rmi_logdet_pallas_cmajor(jnp.asarray(oh), pr, interpret=True)


@pytest.mark.parametrize("H,W", [(18, 20), (34, 26)])
def test_pallas_rmi_matches_core_values_and_grads(rng, H, W):
    B, C = 2, 3
    oh = rng.integers(0, 2, (B, C, H, W)).astype(np.float32)
    lg = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))

    v_ref, g_ref = jax.value_and_grad(lambda x: jnp.sum(_core_reference(oh, x)))(lg)
    v_pal, g_pal = jax.value_and_grad(lambda x: jnp.sum(_pallas(oh, x)))(lg)

    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=5e-3, atol=2e-5
    )


def test_pallas_rmi_fast_precision_close_to_parity(rng):
    """``rmi_precision: fast`` (bf16 z operands, f32 accumulate) must
    track the f32-parity kernel within bf16-level tolerances, values AND
    gradients — the opt-in speed mode for 3-level training."""
    B, C, H, W = 2, 3, 34, 26
    oh = rng.integers(0, 2, (B, C, H, W)).astype(np.float32)
    lg = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))

    def run(precision):
        def f(x):
            pr = jax.nn.sigmoid(x) + 1e-6
            return jnp.sum(
                rmi_logdet_pallas_cmajor(
                    jnp.asarray(oh), pr, interpret=True, precision=precision
                )
            )

        return jax.value_and_grad(f)(lg)

    v32, g32 = run("parity")
    vbf, gbf = run("fast")
    # bf16 mantissa is 8 bits → ~4e-3 relative; logdet compresses error
    np.testing.assert_allclose(float(vbf), float(v32), rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(gbf), np.asarray(g32), rtol=0.1, atol=2e-3
    )


def test_pallas_rmi_unaligned_width_and_multi_tile(rng):
    """W not a 128-multiple (lane pad path) and nh forcing several row
    tiles with a small tile cap."""
    B, C, H, W = 1, 2, 140, 30  # nh=138 → 2 tiles with a masked tail
    th, n_t = _pick_tile_rows(H - 2)
    assert n_t >= 2 and n_t * th > H - 2  # multi-tile + tail masking
    oh = rng.integers(0, 2, (B, C, H, W)).astype(np.float32)
    lg = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
    v_ref = float(jnp.sum(_core_reference(oh, lg)))
    v_pal = float(jnp.sum(_pallas(oh, lg)))
    np.testing.assert_allclose(v_pal, v_ref, rtol=2e-4)


def test_pallas_rmi_fast_capped_tile_wide_maps(rng):
    """The fast-mode TH≤32 cap for Wp ≥ 896 (the r101@769² scoped-VMEM
    guard, rmi_logdet_pallas:419) must leave the math unchanged — same
    masked-tail handling, more tiles."""
    B, C, H, W = 1, 2, 66, 900  # nh=64 → TH would be 64; capped to 32
    oh = rng.integers(0, 2, (B, C, H, W)).astype(np.float32)
    lg = jnp.asarray(
        rng.standard_normal((B, C, H, W)).astype(np.float32)
    )
    v_ref = float(jnp.sum(_core_reference(oh, lg)))
    v_pal = float(
        jnp.sum(
            rmi_logdet_pallas_cmajor(
                jnp.asarray(oh),
                jax.nn.sigmoid(lg) + 1e-6,
                interpret=True,
                precision="fast",
            )
        )
    )
    np.testing.assert_allclose(v_pal, v_ref, rtol=2e-2)


def test_pallas_rmi_under_shard_map(rng):
    """ddp context: the kernel runs per-replica inside shard_map over the
    data axis (local batch shards) — the multi-chip mode where the Pallas
    backend stays enabled (rmi_gram_pallas_available per_replica)."""
    from jax.sharding import PartitionSpec as P

    from seghiero_tpu.parallel.mesh import DATA_AXIS, make_mesh

    mesh = make_mesh({"data": 4})
    B, C, H, W = 4, 2, 18, 20
    oh = rng.integers(0, 2, (B, C, H, W)).astype(np.float32)
    lg = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))

    def per_replica(oh_shard, lg_shard):
        pr = jax.nn.sigmoid(lg_shard) + 1e-6
        return rmi_logdet_pallas_cmajor(oh_shard, pr, interpret=True)

    sharded = jax.jit(
        jax.shard_map(
            per_replica,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            # pallas_call outputs carry no vma metadata; the ddp trainer
            # runs with check_vma=False too (train/trainer.py)
            check_vma=False,
        )
    )(jnp.asarray(oh), lg)
    ref = _core_reference(oh, lg)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(ref), rtol=2e-4, atol=1e-5
    )


def test_fast_3level_pallas_under_pjit_mesh(rng, classes_3level, monkeypatch):
    """Multi-device *pjit* mode: with a mesh whose data axis is >1 the
    Pallas RMI path must stay engaged (nested shard_map over the batch
    dim) instead of falling back to the XLA RMI — the round-1 gap for
    BASELINE config 4. Asserts (a) the kernel is actually traced and
    (b) the loss matches the XLA backend within kernel tolerances."""
    import seghiero_tpu.ops.pallas.rmi_gram as rg
    from seghiero_tpu.hierarchy import Hierarchy
    from seghiero_tpu.losses.fast import FastRMIHieraTripletLoss
    from seghiero_tpu.parallel.mesh import batch_sharding, make_mesh
    from tests.test_fast_losses import _inputs

    h = Hierarchy.from_class_config(classes_3level)
    lo, emb, labels = _inputs(rng, h, H=32, W=32, B=8)
    mesh = make_mesh({"data": 8})
    bsh = batch_sharding(mesh)

    calls = {"n": 0}
    orig_kernel = rg.rmi_logdet_pallas_cmajor

    def counting(*a, **kw):
        calls["n"] += 1
        return orig_kernel(*a, **kw)

    monkeypatch.setattr(rg, "rmi_logdet_pallas_cmajor", counting)
    # fast.py imports the module, not the symbol — patching the module
    # attribute is enough; interpret mode runs the kernel on CPU.
    loss_pal = FastRMIHieraTripletLoss(
        h, rmi_backend="pallas", mesh=mesh, pallas_interpret=True
    )

    def f(emb_, lo_, labels_):
        return loss_pal(jnp.array(0), emb_, lo_, lo_, labels_)

    val_pal = float(
        jax.jit(f, in_shardings=(bsh, bsh, bsh))(
            jax.device_put(emb, bsh), jax.device_put(lo, bsh),
            jax.device_put(labels, bsh),
        )
    )
    assert calls["n"] >= 1, "Pallas kernel was not traced under pjit mesh"

    val_xla = float(
        FastRMIHieraTripletLoss(h, rmi_backend="xla")(
            jnp.array(0), emb, lo, lo, labels
        )
    )
    np.testing.assert_allclose(val_pal, val_xla, rtol=2e-4)


def test_fast_3level_pallas_backend_matches_xla(rng, classes_3level):
    from seghiero_tpu.hierarchy import Hierarchy
    from seghiero_tpu.losses.fast import FastRMIHieraTripletLoss
    from tests.test_fast_losses import _inputs

    h = Hierarchy.from_class_config(classes_3level)
    lo, emb, labels = _inputs(rng, h, H=32, W=32)
    xla = float(
        FastRMIHieraTripletLoss(h, rmi_backend="xla")(
            jnp.array(0), emb, lo, lo, labels
        )
    )

    # route through the kernel in interpreter mode
    import seghiero_tpu.losses.fast as fast_mod

    orig = fast_mod.rmi_lower_bound_cmajor

    def patched(oh, pr, **kw):
        kw["backend"] = "pallas"
        kw["pallas_interpret"] = True
        return orig(oh, pr, **kw)

    fast_mod.rmi_lower_bound_cmajor = patched
    try:
        pal = float(
            FastRMIHieraTripletLoss(h, rmi_backend="pallas")(
                jnp.array(0), emb, lo, lo, labels
            )
        )
    finally:
        fast_mod.rmi_lower_bound_cmajor = orig
    np.testing.assert_allclose(pal, xla, rtol=2e-4)


def test_forced_pallas_validation_errors(rng, classes_3level):
    """rmi_backend: pallas fails LOUDLY on unsupported configurations
    instead of computing wrong statistics or dying inside the
    partitioner (losses/fast.py validation block)."""
    from seghiero_tpu.losses.fast import rmi_lower_bound_cmajor
    from seghiero_tpu.parallel.mesh import make_mesh

    oh = jnp.zeros((6, 4, 16, 16), jnp.float32)
    pr = jnp.zeros((6, 4, 16, 16), jnp.float32)

    with pytest.raises(ValueError, match="rmi_radius == 3"):
        rmi_lower_bound_cmajor(oh, pr, radius=5, backend="pallas")
    with pytest.raises(ValueError, match="f32-only"):
        rmi_lower_bound_cmajor(oh, pr, use_float64=True, backend="pallas")
    with pytest.raises(ValueError, match="TPU backend"):
        rmi_lower_bound_cmajor(oh, pr, backend="pallas")  # CPU, no interpret
    # multi-chip pjit with a batch the data axis cannot split: the
    # shard_map wrapper is unusable and the unsharded custom call would
    # die inside the SPMD partitioner
    mesh = make_mesh({"data": 8})
    with pytest.raises(ValueError, match="divisible by the data-axis"):
        rmi_lower_bound_cmajor(
            oh, pr, backend="pallas", pallas_interpret=True, mesh=mesh
        )
