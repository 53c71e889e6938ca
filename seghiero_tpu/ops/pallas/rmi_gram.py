"""Pallas TPU kernels for the RMI covariance (Gram) accumulation.

Why: the XLA path of the 3-level RMI loss (losses/rmi.py,
rmi_hiera_triplet_loss.py:489-517 of the reference) materializes the
radius²-shifted neighborhood tensor ``[B, C, 9, N]`` (N = H·W) and
reduces it with 9-wide einsums. Profiled on a v5e at 512²/b4 that is
~60 ms of a 106 ms train step: ~30 ms of stack/pad/transpose traffic to
build the tensor and ~30 ms of matmuls whose 9×9 outputs leave the
128×128 MXU ~99 % idle while the [9, N] operands stream from HBM three
separate times.

These kernels compute the same quantities in TWO passes over the maps
with NOTHING materialized:

  * ``_gram18``: z = the 18 shifted views (9 of the one-hot map, 9 of
    the probability map) built tile-by-tile in VMEM; accumulates
    ``G18 = z·zᵀ`` ([BC, 18, 18]) across row tiles. One HBM read of
    each map.
  * ``_residual_gram``: given the regression W (solved from G18 in
    XLA — 9×9, negligible), accumulates ``A = y·yᵀ`` with
    ``y = z_la − Wᵀ·z_pr`` formed per tile. This keeps the
    PSD-by-construction property of losses/rmi.py:_rmi_logdet_core
    (sum of per-tile Gram matrices is a Gram matrix) — the algebraic
    Schur expansion S·G18·Sᵀ would reintroduce the f32 cancellation the
    residual formulation exists to avoid.
  * ``_grad_maps``: the whole backward collapses to ONE pass. With
    S = [I₉ | −Wᵀ] and M = dA + dAᵀ:
        dz_pr (kernel 2) = (−W·M·S)·z18
        dW               = −((M·S·G18)[:, 9:])ᵀ   (no data pass — uses G18)
        dz_pr (kernel 1) = ((dG18 + dG18ᵀ)[9:, :])·z18
    so the two data-dependent terms share one matrix
    ``P = −W·M·S + (dG18 + dG18ᵀ)[9:, :]`` ([BC, 9, 18]) computed in
    XLA, and the kernel streams the maps once more, forming
    ``u = P·z18`` per tile and overlap-adding the 9 shifted u-rows into
    the dpr map. The one-hot map gets no gradient (stop_gradient
    upstream, matching the reference's detached targets at :500).

Numerics: Gram accumulation uses f32 operands with
``precision=HIGHEST`` on the MXU and f32 accumulators — the same
arithmetic class as the XLA path's ``default_matmul_precision
("highest")`` einsums; the N-normalization of _rmi_logdet_core is
applied to the 18×18/9×9 Grams after the kernel (mathematically
identical up to one rounding). Verified value- and gradient-wise against
the materialized core in tests/test_rmi_gram_pallas.py.

Lane alignment: maps are zero-padded to a 128-multiple width outside the
kernel; padded columns are zeroed in z so they contribute nothing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_POS_ALPHA = 1e-3  # rmi_hiera_triplet_loss.py:18


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile_rows(nh: int, sub: int = 8) -> Tuple[int, int]:
    """(TH, n_tiles): TH is a multiple of ``sub`` (Mosaic requires
    sublane-aligned DMA slice shapes/offsets: 8 rows for f32, 16 for
    bf16) minimizing padded-row waste; short tails are masked
    in-kernel."""
    best = (sub, -(-nh // sub))
    best_waste = best[1] * sub - nh
    for th in range(sub, 129, sub):
        n_t = -(-nh // th)
        waste = n_t * th - nh
        if waste < best_waste or (waste == best_waste and th > best[0]):
            best, best_waste = (th, n_t), waste
    return best


def rmi_gram_pallas_available(
    H: int, W: int, radius: int, use_float64: bool, per_replica: bool = False
) -> bool:
    """Kernel preconditions: radius-3, f32, a TPU backend (tests force
    ``interpret=True`` on CPU), and a single-device context.

    ``per_replica=True`` declares the caller runs inside ``shard_map``
    (trainer ddp mode): the kernel then sees local shards and is safe on
    any device count. Under multi-device *pjit* the XLA partitioner
    cannot partition a custom call — it would replicate the global-batch
    maps onto every chip — so the auto backend falls back to the
    partitionable XLA formulation there."""
    if radius != 3 or use_float64 or H < 3 or W < 3:
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
        return per_replica or jax.device_count() == 1
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _build_z(band_la, band_pr, z_ref, valid_rows, TH: int, NW: int, W: int):
    """Fill z_ref [18, TH, W]: rows 0-8 = shifted one-hot views, rows
    9-17 = shifted prob views; columns ≥ NW and rows ≥ valid_rows zeroed
    (lane/tail padding contributes nothing to the Grams).

    Column shifts are lane ROTATES + mask, not offset slices — Mosaic
    cannot concatenate/store vectors with mismatched lane offsets
    ("result/input offset mismatch on non-concat dimension"), while
    rolls keep every operand in the canonical aligned layout.

    ``z_ref.dtype`` may be bf16 (``rmi_precision: fast``): the bands and
    the roll/mask arithmetic stay f32 — keeping every offset row slice
    in the known-good f32 tiling — and only the z store downcasts, so
    the MXU dots downstream run native-bf16 with f32 accumulators."""
    row_i = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
    mask = (col_i < NW) & (row_i < valid_rows)
    zdt = z_ref.dtype
    for dx in range(3):
        # left-rotate by dx == circular roll by W−dx (pltpu.roll requires
        # a non-negative shift)
        la_rot = pltpu.roll(band_la, W - dx, 1) if dx else band_la
        pr_rot = pltpu.roll(band_pr, W - dx, 1) if dx else band_pr
        for dy in range(3):
            k = dy * 3 + dx
            z_ref[k] = jnp.where(mask, la_rot[dy : dy + TH, :], 0.0).astype(zdt)
            z_ref[9 + k] = jnp.where(mask, pr_rot[dy : dy + TH, :], 0.0).astype(zdt)


def _gram_dot(a, b, contract_a, contract_b):
    """Gram-style dot with f32 accumulation. f32 operands pin HIGHEST
    precision (the parity arithmetic class); bf16 operands use the native
    single-pass MXU mode — that IS the point of ``rmi_precision: fast``."""
    prec = jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else None
    return jax.lax.dot_general(
        a,
        b,
        ((contract_a, contract_b), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32,
    )


def _gram18_kernel(
    la_ref, la_halo, pr_ref, pr_halo, g_ref, z_ref, *, TH, NW, W, NH
):
    t = pl.program_id(1)
    band_la = jnp.concatenate([la_ref[0], la_halo[0]], axis=0)
    band_pr = jnp.concatenate([pr_ref[0], pr_halo[0]], axis=0)
    valid = jnp.minimum(TH, NH - t * TH)
    _build_z(band_la, band_pr, z_ref, valid, TH, NW, W)
    z = z_ref[:].reshape(18, TH * W)
    g = _gram_dot(z, z, (1,), (1,))

    @pl.when(t == 0)
    def _():
        g_ref[0] = g

    @pl.when(t > 0)
    def _():
        g_ref[0] = g_ref[0] + g


def _residual_kernel(
    la_ref, la_halo, pr_ref, pr_halo, w_ref, a_ref, z_ref, *, TH, NW, W, NH
):
    t = pl.program_id(1)
    band_la = jnp.concatenate([la_ref[0], la_halo[0]], axis=0)
    band_pr = jnp.concatenate([pr_ref[0], pr_halo[0]], axis=0)
    valid = jnp.minimum(TH, NH - t * TH)
    _build_z(band_la, band_pr, z_ref, valid, TH, NW, W)
    z = z_ref[:].reshape(18, TH * W)
    zdt = z_ref.dtype
    w = w_ref[0].astype(zdt)  # [9, 9]
    # y = z_la − Wᵀ z_pr ;  (Wᵀ z_pr)[i] = Σ_j w[j, i] z_pr[j]
    wz = _gram_dot(w, z[9:18], (0,), (0,))
    y = (z[0:9].astype(jnp.float32) - wz).astype(zdt)
    a = _gram_dot(y, y, (1,), (1,))

    @pl.when(t == 0)
    def _():
        a_ref[0] = a

    @pl.when(t > 0)
    def _():
        a_ref[0] = a_ref[0] + a


def _grad_kernel(
    la_ref, la_halo, pr_ref, pr_halo, p_ref, dpr_ref, z_ref, acc_ref,
    *, TH, NW, W, H, NH
):
    t = pl.program_id(1)
    r0 = t * TH
    band_la = jnp.concatenate([la_ref[0], la_halo[0]], axis=0)
    band_pr = jnp.concatenate([pr_ref[0], pr_halo[0]], axis=0)

    @pl.when(t == 0)
    def _():
        dpr_ref[0] = jnp.zeros((H, W), jnp.float32)

    valid = jnp.minimum(TH, NH - t * TH)
    _build_z(band_la, band_pr, z_ref, valid, TH, NW, W)
    z = z_ref[:].reshape(18, TH * W)
    u = _gram_dot(p_ref[0].astype(z_ref.dtype), z, (1,), (0,)).reshape(9, TH, W)
    # overlap-add the 9 shifted contributions into a [TH+2, W] band.
    # Shifts are rolls + masks (see _build_z layout note).
    acc_ref[:] = jnp.zeros((TH + 8, W), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
    for dy in range(3):
        for dx in range(3):
            k = dy * 3 + dx
            val = pltpu.roll(u[k], dx, 1) if dx else u[k]
            mask = (col >= dx) & (col < dx + NW)
            acc_ref[dy : dy + TH, :] = acc_ref[dy : dy + TH, :] + jnp.where(
                mask, val, 0.0
            )
    dpr_ref[0, pl.ds(r0, TH + 8), :] = dpr_ref[0, pl.ds(r0, TH + 8), :] + acc_ref[:]


# ---------------------------------------------------------------------------
# pallas_call wrappers (operate on [BC, H, Wp] lane-padded f32 maps)
# ---------------------------------------------------------------------------


def _map_specs(TH, W):
    """Each map is passed twice: the (1, TH, W) main block at tile t and
    a (1, 8, W) halo block covering rows [ (t+1)·TH, (t+1)·TH+8 ) — the
    row padding added by the wrapper guarantees the halo exists for the
    last tile. BlockSpec-managed inputs get Pallas' automatic
    double-buffered pipelining (the manual-DMA version serialized
    start→wait per tile and measured ~2× slower)."""
    main = pl.BlockSpec(
        (1, TH, W), lambda bc, t: (bc, t, 0), memory_space=pltpu.VMEM
    )
    halo = pl.BlockSpec(
        (1, 8, W),
        lambda bc, t: (bc, (t + 1) * (TH // 8), 0),
        memory_space=pltpu.VMEM,
    )
    return main, halo


def _gram18(la, pr, TH, NW, NH, interpret, zdt=jnp.float32):
    BC, H, W = la.shape
    n_t = -(-NH // TH)
    main, halo = _map_specs(TH, W)
    return pl.pallas_call(
        functools.partial(_gram18_kernel, TH=TH, NW=NW, W=W, NH=NH),
        out_shape=jax.ShapeDtypeStruct((BC, 18, 18), jnp.float32),
        grid=(BC, n_t),
        in_specs=[main, halo, main, halo],
        out_specs=pl.BlockSpec(
            (1, 18, 18), lambda bc, t: (bc, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((18, TH, W), zdt)],
        interpret=interpret,
    )(la, la, pr, pr)


def _residual_gram(la, pr, w, TH, NW, NH, interpret, zdt=jnp.float32):
    BC, H, W = la.shape
    n_t = -(-NH // TH)
    main, halo = _map_specs(TH, W)
    return pl.pallas_call(
        functools.partial(_residual_kernel, TH=TH, NW=NW, W=W, NH=NH),
        out_shape=jax.ShapeDtypeStruct((BC, 9, 9), jnp.float32),
        grid=(BC, n_t),
        in_specs=[
            main,
            halo,
            main,
            halo,
            pl.BlockSpec((1, 9, 9), lambda bc, t: (bc, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 9, 9), lambda bc, t: (bc, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((18, TH, W), zdt)],
        interpret=interpret,
    )(la, la, pr, pr, w)


def _grad_maps(la, pr, p, TH, NW, NH, interpret, zdt=jnp.float32):
    BC, H, W = la.shape
    n_t = -(-NH // TH)
    main, halo = _map_specs(TH, W)
    return pl.pallas_call(
        functools.partial(_grad_kernel, TH=TH, NW=NW, W=W, H=H, NH=NH),
        out_shape=jax.ShapeDtypeStruct((BC, H, W), jnp.float32),
        grid=(BC, n_t),
        in_specs=[
            main,
            halo,
            main,
            halo,
            pl.BlockSpec((1, 9, 18), lambda bc, t: (bc, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda bc, t: (bc, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((18, TH, W), zdt),
            pltpu.VMEM((TH + 8, W), jnp.float32),
        ],
        interpret=interpret,
    )(la, la, pr, pr, p)


# ---------------------------------------------------------------------------
# XLA glue: solve + logdet on the tiny Grams (shared numerics with
# losses/rmi.py:_rmi_logdet_core — N-normalization, noise-aware jitter)
# ---------------------------------------------------------------------------


def _jitter(m, alpha_n, eps_rel):
    mean_diag = jnp.mean(jnp.diagonal(m, axis1=-2, axis2=-1), -1)
    return jnp.maximum(alpha_n, eps_rel * mean_diag)[..., None, None]


def _solve_w(g18_raw, n):
    """W [BC, 9, 9] from the raw 18×18 Gram (f32, N-normalized inside)."""
    alpha_n = _POS_ALPHA / n
    eps_rel = 32 * np.finfo(np.float32).eps
    pr_cov = g18_raw[:, 9:, 9:] * (1.0 / n)
    la_pr = g18_raw[:, 0:9, 9:] * (1.0 / n)
    diag = jnp.eye(9, dtype=jnp.float32)
    m_pr = pr_cov + diag * _jitter(pr_cov, alpha_n, eps_rel)
    return jnp.linalg.solve(m_pr, jnp.swapaxes(la_pr, -1, -2))


def _finish_logdet(a_raw, n):
    """half-logdet [BC] from the raw residual Gram."""
    alpha_n = _POS_ALPHA / n
    eps_rel = 32 * np.finfo(np.float32).eps
    a = a_raw * (1.0 / n)
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    diag = jnp.eye(9, dtype=jnp.float32)
    chol = jnp.linalg.cholesky(a + diag * _jitter(a, alpha_n, eps_rel))
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1) * np.sqrt(n) + 1e-8), axis=-1
    )
    return 0.5 * logdet


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _half_logdet(oh, pr, cfg):
    half, _ = _half_logdet_fwd(oh, pr, cfg)
    return half


def _half_logdet_fwd(oh, pr, cfg):
    TH, NW, NH, n, interpret, zdt_name = cfg
    zdt = jnp.dtype(zdt_name)
    g18 = _gram18(oh, pr, TH, NW, NH, interpret, zdt)
    w = _solve_w(g18, n)
    a_raw = _residual_gram(oh, pr, w, TH, NW, NH, interpret, zdt)
    half = _finish_logdet(a_raw, n)
    return half, (oh, pr, g18, w, a_raw)


def _half_logdet_bwd(cfg, res, dhalf):
    TH, NW, NH, n, interpret, zdt_name = cfg
    zdt = jnp.dtype(zdt_name)
    oh, pr, g18, w, a_raw = res
    # f2 (logdet) cotangent → dA_raw
    _, f2_vjp = jax.vjp(lambda a: _finish_logdet(a, n), a_raw)
    (dA,) = f2_vjp(dhalf)
    M = dA + jnp.swapaxes(dA, -1, -2)  # [BC, 9, 9]
    eye9 = jnp.broadcast_to(jnp.eye(9, dtype=jnp.float32), w.shape)
    S = jnp.concatenate([eye9, -jnp.swapaxes(w, -1, -2)], axis=-1)  # [BC, 9, 18]
    MS = jnp.einsum("bij,bjk->bik", M, S)  # [BC, 9, 18]
    # residual kernel: dz_pr = (−W·M·S)·z ; dW = −((M·S·G18)[:, 9:])ᵀ
    Q = -jnp.einsum("bij,bjk->bik", w, MS)
    dS_full = jnp.einsum("bik,bkl->bil", MS, g18)  # M·S·G18 [BC, 9, 18]
    dw = -jnp.swapaxes(dS_full[:, :, 9:], -1, -2)
    # solve cotangent → dG18 ; gram kernel: dz_pr = (dG18+dG18ᵀ)[9:, :]·z
    _, f1_vjp = jax.vjp(lambda g: _solve_w(g, n), g18)
    (dG18,) = f1_vjp(dw)
    R = (dG18 + jnp.swapaxes(dG18, -1, -2))[:, 9:, :]  # [BC, 9, 18]
    dpr = _grad_maps(oh, pr, Q + R, TH, NW, NH, interpret, zdt)
    return jnp.zeros_like(oh), dpr


_half_logdet.defvjp(_half_logdet_fwd, _half_logdet_bwd)


def rmi_logdet_pallas_cmajor(
    oh_map: jax.Array,  # [B, C, H, W] one-hot targets (no grad)
    pr_map: jax.Array,  # [B, C, H, W] masked sigmoid probabilities
    *,
    interpret: bool = False,
    precision: str = "parity",
) -> jax.Array:
    """[B, C] half-logdets — Pallas-accelerated ``_rmi_logdet_core``
    for radius 3, f32. See module docstring; equivalence is asserted in
    tests/test_rmi_gram_pallas.py.

    ``precision="fast"`` (``training.rmi_precision: fast``) stores the
    in-kernel z views in bf16 and runs the Gram/residual/grad dots in
    the MXU's native bf16 single-pass mode with f32 accumulators; the
    18×18/9×9 Grams, the solve, and the logdet stay f32. Opt-in:
    relaxes parity tolerances (see tests) for kernel speed."""
    B, C, H, W = pr_map.shape
    nh, nw = H - 2, W - 2
    n = nh * nw
    # the z scratch is [18, TH, W] in zdt: its sublane dim TH must be
    # 8-aligned for f32 tiles but 16-aligned for bf16 (Mosaic (16,128)
    # tiling) — fast mode therefore picks TH from multiples of 16
    TH, n_t = _pick_tile_rows(nh, sub=16 if precision == "fast" else 8)
    if precision == "fast" and _round_up(W, 128) >= 896 and TH > 32:
        # Mosaic scoped-VMEM headroom at r101@769² shapes: TH=48 went
        # 212 KB over the 16 MB scoped limit once the surrounding
        # program carried bf16 pad/convert fusions (hiera_precision:
        # fast default, round-4 driver capture — the compile fails
        # server-side as remote_compile HTTP 500). A 32-row tile keeps
        # the same masked-tail math with ~1/3 the in-kernel footprint.
        # Deliberately a measured point fix, not a computed bound: the
        # overflow is NOT monotone in TH·W (fast at 512² compiles fine
        # with TH=128·W=512 = 65k while 769² fails at 48·896 = 43k —
        # Mosaic's scoped allocation depends on the surrounding
        # fusions), so any formula here would be fiction. If another
        # shape trips the limit, add its measured cap beside this one.
        TH = 32
        n_t = -(-nh // TH)
    Hp = n_t * TH + 8  # band DMAs read [t·TH, t·TH+TH+8)
    Wp = _round_up(W, 128)
    oh = jax.lax.stop_gradient(oh_map).astype(jnp.float32).reshape(B * C, H, W)
    pr = pr_map.astype(jnp.float32).reshape(B * C, H, W)
    if Wp != W or Hp != H:
        pad = ((0, 0), (0, max(0, Hp - H)), (0, Wp - W))
        oh = jnp.pad(oh, pad)
        pr = jnp.pad(pr, pad)
    zdt_name = "bfloat16" if precision == "fast" else "float32"
    cfg = (TH, nw, nh, n, interpret, zdt_name)
    half = _half_logdet(oh, pr, cfg)
    return half.reshape(B, C)
