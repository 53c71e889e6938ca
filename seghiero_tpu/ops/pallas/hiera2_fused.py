"""Pallas TPU kernel: fused 4× bilinear upsample + 2-level hierarchy BCE
+ per-level CE (forward and custom backward).

Why: the reference evaluates all loss terms on logits bilinearly
upsampled to label resolution (train.py:282-306). Done with XLA ops this
materializes several [B, H, W, C] float32 tensors per step (plus their
backward counterparts) — pure HBM traffic. This kernel reconstructs the
upsampled logits *in registers* from quarter-resolution tiles and reduces
the loss sums on the fly; the backward kernel re-derives per-pixel
gradients and emits them straight onto the low-res logit grid. Nothing
full-resolution ever touches HBM except the int32 labels.

Design (TPU-specific):
  * Half-pixel 4× upsampling decomposes into 16 (phase_y, phase_x)
    classes, each a constant-weight 4-tap blend of a 2×2 low-res
    neighborhood. Labels are phase-split in JAX (one cheap
    reshape-transpose), and the low-res logits are passed as NINE
    shifted views of the edge-padded array — so every kernel access is
    block-local: no halos, no gathers, no strided reads.
  * The pad/shift plumbing stays OUTSIDE the custom_vjp boundary, so
    JAX's autodiff of `jnp.pad(mode="edge")` + slicing folds the
    boundary gradients back for free; the custom VJP only covers the
    pallas calls (forward reduction / backward per-shift gradients).
  * The class axis (C ≈ 13) is a compile-time loop: channels are
    separate [KH, w] blocks so the 128-lane axis is always W.
  * grid = (B, h/KH); the six loss sums accumulate into one (1, 128)
    output block across sequential grid steps.

Semantics match losses/fast.py (and transitively the NHWC parity path /
the torch reference): verified value- and gradient-wise in
tests/test_pallas_fused.py, including saturated logits. On a real v5e the
compiled kernel is BIT-EXACT against the XLA path (grad max err 3e-10).

Status: optional (``training.pallas_fused_loss``), DEFAULT OFF. Measured
at 512²/b8 value+grad: fused 30.5 ms vs XLA C-major 8.5 ms — after the
layout fix in losses/fast.py, XLA's fusion of this pattern beats the
hand-written kernel (the phase-decomposed VPU schedule recomputes the
transcendental chain per tap group and the backward recomputes the whole
forward, while XLA amortizes residuals). Kept as a correct, tested
reference point for kernel work on this loss family; revisit if the loss
mix changes (e.g. much larger C or fused triplet sampling).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seghiero_tpu.hierarchy import Hierarchy

LOG_EPS_BCE = float(np.log(1e-8))  # the 2-level BCE eps (hiera_triplet_loss.py:46)
SCALE = 4  # head logits are at 1/4 label resolution

# phase → (row shift of the low tap, weight_lo, weight_hi); derived from
# src = (dst + 0.5)/4 − 0.5, taps (floor(src), floor(src)+1), shifts are
# indices into the 3 shifted views of the edge-padded array
_PHASE = (
    (0, 0.375, 0.625),
    (0, 0.125, 0.875),
    (1, 0.875, 0.125),
    (1, 0.625, 0.375),
)


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _log_sig_eps(m):  # log(sigmoid(m) + eps), stable (see losses/hiera.py)
    return jnp.logaddexp(-_softplus(-m), LOG_EPS_BCE)


def _log_one_minus_sig_eps(m):
    return jnp.logaddexp(-_softplus(m), LOG_EPS_BCE)


def _lane_vec(scalars):
    """Pack a list of scalars into a (1, 128) vector at lanes 0..len-1."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.zeros((1, 128), jnp.float32)
    for j, s in enumerate(scalars):
        out = out + jnp.where(lane == j, s, 0.0)
    return out


def _phase_l(S, c, ro, co, ay, by, ax, bx):
    """Upsampled logits of one phase from the 9 shifted views (index
    r*3+c). All operands are whole [KH, w] blocks."""
    return ay * (ax * S[ro * 3 + co][0, c] + bx * S[ro * 3 + co + 1][0, c]) + by * (
        ax * S[(ro + 1) * 3 + co][0, c] + bx * S[(ro + 1) * 3 + co + 1][0, c]
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, hier):
    (*s_refs, tf_ref, tc_ref, out_ref) = refs
    nf, nc, f2c, buckets = hier
    C = nf + nc

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    s_f = jnp.zeros((), jnp.float32)
    s_c = jnp.zeros((), jnp.float32)
    nvf = jnp.zeros((), jnp.float32)
    nvc = jnp.zeros((), jnp.float32)
    ce_f = jnp.zeros((), jnp.float32)
    ce_c = jnp.zeros((), jnp.float32)

    for py, (ro, ay, by) in enumerate(_PHASE):
        for px, (co, ax, bx) in enumerate(_PHASE):
            l = [_phase_l(s_refs, c, ro, co, ay, by, ax, bx) for c in range(C)]
            tf = tf_ref[0, py, px]
            tc = tc_ref[0, py, px]
            vf = tf != 255
            vc = tc != 255
            nvf += jnp.sum(vf.astype(jnp.float32))
            nvc += jnp.sum(vc.astype(jnp.float32))

            # fine BCE: pos at the label channel via min(l_f, l_coarse_of_f);
            # neg at every other fine channel
            acc_f = jnp.zeros_like(l[0])
            for f in range(nf):
                m = jnp.minimum(l[f], l[nf + f2c[f]])
                is_lab = tf == f
                acc_f += jnp.where(
                    is_lab, -_log_sig_eps(m), -_log_one_minus_sig_eps(l[f])
                )
            s_f += jnp.sum(jnp.where(vf, acc_f, 0.0))

            # coarse BCE: pos at the raw coarse channel; neg via bucket max
            acc_c = jnp.zeros_like(l[0])
            for ci in range(nc):
                mx = l[nf + ci]
                for f in buckets[ci]:
                    mx = jnp.maximum(mx, l[f])
                is_lab = tc == ci
                acc_c += jnp.where(
                    is_lab, -_log_sig_eps(l[nf + ci]), -_log_one_minus_sig_eps(mx)
                )
            s_c += jnp.sum(jnp.where(vc, acc_c, 0.0))

            # CE per level (stable log-sum-exp, label pick by compare)
            def ce_sum(ls, t, valid):
                mx = ls[0]
                for x in ls[1:]:
                    mx = jnp.maximum(mx, x)
                se = jnp.zeros_like(mx)
                picked = jnp.zeros_like(mx)
                for ci_, x in enumerate(ls):
                    se += jnp.exp(x - mx)
                    picked += jnp.where(t == ci_, x, 0.0)
                return jnp.sum(jnp.where(valid, jnp.log(se) + mx - picked, 0.0))

            ce_f += ce_sum(l[:nf], tf, vf)
            ce_c += ce_sum(l[nf:], tc, vc)

    out_ref[...] = out_ref[...] + _lane_vec([s_f, s_c, nvf, nvc, ce_f, ce_c])


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(*refs, hier):
    (g_ref, *rest) = refs
    s_refs, rest = rest[:9], rest[9:]
    tf_ref, tc_ref = rest[:2]
    d_refs = rest[2:]  # 9 gradient outputs, same blocking as the 9 views
    nf, nc, f2c, buckets = hier
    C = nf + nc

    for d in d_refs:
        d[...] = jnp.zeros_like(d)

    g_sf = g_ref[0, 0]
    g_sc = g_ref[0, 1]
    g_cef = g_ref[0, 4]
    g_cec = g_ref[0, 5]

    for py, (ro, ay, by) in enumerate(_PHASE):
        for px, (co, ax, bx) in enumerate(_PHASE):
            l = [_phase_l(s_refs, c, ro, co, ay, by, ax, bx) for c in range(C)]
            tf = tf_ref[0, py, px]
            tc = tc_ref[0, py, px]
            vf = tf != 255
            vc = tc != 255

            dl = [jnp.zeros_like(l[0]) for _ in range(C)]

            # fine BCE backward
            for f in range(nf):
                cf = nf + f2c[f]
                m = jnp.minimum(l[f], l[cf])
                is_lab = vf & (tf == f)
                u = -_softplus(-m)
                wu = jnp.exp(u - jnp.logaddexp(u, LOG_EPS_BCE))
                gpos = jnp.where(is_lab, -wu * jax.nn.sigmoid(-m), 0.0) * g_sf
                take_f = l[f] <= l[cf]  # lax.min tie convention
                dl[f] += jnp.where(take_f, gpos, 0.0)
                dl[cf] += jnp.where(take_f, 0.0, gpos)
                u2 = -_softplus(l[f])
                wu2 = jnp.exp(u2 - jnp.logaddexp(u2, LOG_EPS_BCE))
                dl[f] += (
                    jnp.where(vf & (tf != f), wu2 * jax.nn.sigmoid(l[f]), 0.0) * g_sf
                )

            # coarse BCE backward (chained-max tie routing mirrors the
            # forward's own-channel-first association)
            for ci in range(nc):
                accs = [l[nf + ci]]
                for f in buckets[ci]:
                    accs.append(jnp.maximum(accs[-1], l[f]))
                mx = accs[-1]
                is_lab = vc & (tc == ci)
                u = -_softplus(-l[nf + ci])
                wu = jnp.exp(u - jnp.logaddexp(u, LOG_EPS_BCE))
                dl[nf + ci] += (
                    jnp.where(is_lab, -wu * jax.nn.sigmoid(-l[nf + ci]), 0.0) * g_sc
                )
                u2 = -_softplus(mx)
                wu2 = jnp.exp(u2 - jnp.logaddexp(u2, LOG_EPS_BCE))
                remaining = (
                    jnp.where(vc & (tc != ci), wu2 * jax.nn.sigmoid(mx), 0.0) * g_sc
                )
                for idx in range(len(buckets[ci]) - 1, -1, -1):
                    f = buckets[ci][idx]
                    take_prev = accs[idx] >= l[f]
                    dl[f] += jnp.where(take_prev, 0.0, remaining)
                    remaining = jnp.where(take_prev, remaining, 0.0)
                dl[nf + ci] += remaining

            # CE backward: softmax − onehot
            def ce_bwd(ls, t, valid, offset, gscale):
                mx = ls[0]
                for x in ls[1:]:
                    mx = jnp.maximum(mx, x)
                exps = [jnp.exp(x - mx) for x in ls]
                se = exps[0]
                for e in exps[1:]:
                    se = se + e
                for ci_, e in enumerate(exps):
                    soft = e / se
                    dl[offset + ci_] += (
                        jnp.where(valid, soft - (t == ci_).astype(jnp.float32), 0.0)
                        * gscale
                    )

            ce_bwd(l[:nf], tf, vf, 0, g_cef)
            ce_bwd(l[nf:], tc, vc, nf, g_cec)

            # distribute through the 4 interpolation taps
            for c in range(C):
                g = dl[c]
                i00 = ro * 3 + co
                d_refs[i00][0, c] += ay * ax * g
                d_refs[i00 + 1][0, c] += ay * bx * g
                d_refs[i00 + 3][0, c] += by * ax * g
                d_refs[i00 + 4][0, c] += by * bx * g


# ---------------------------------------------------------------------------
# Host-side wrappers + custom VJP
# ---------------------------------------------------------------------------


def _phase_split(labels: jax.Array, h: int, w: int) -> jax.Array:
    """[B, 4h, 4w] → [B, 4, 4, h, w] grouped by interpolation phase."""
    B = labels.shape[0]
    return labels.reshape(B, h, 4, w, 4).transpose(0, 2, 4, 1, 3)


def _hier_tuple(hierarchy: Hierarchy):
    return (
        hierarchy.n_fine,
        hierarchy.n_coarse,
        tuple(int(x) for x in hierarchy.fine_to_coarse),
        hierarchy.fine_by_coarse,
    )


def fused_hiera2_available(logits_lo_cmajor, labels) -> bool:
    B, C, h, w = logits_lo_cmajor.shape
    H, W = labels.shape[1:3]
    return H == SCALE * h and W == SCALE * w and h % 8 == 0


def _shift_views(lo_pad):
    """9 shifted [B, C, h, w] views of the ±1 edge-padded logits."""
    B, C, hp, wp = lo_pad.shape
    h, w = hp - 2, wp - 2
    return tuple(
        jax.lax.slice(lo_pad, (0, 0, r, c), (B, C, r + h, c + w))
        for r in range(3)
        for c in range(3)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _core(views, labels_phase, hier, kh, interpret):
    return _core_fwd_impl(views, labels_phase, hier, kh, interpret)


def _core_fwd_impl(views, labels_phase, hier, kh, interpret):
    tf_p, tc_p = labels_phase
    B, C, h, w = views[0].shape
    grid = (B, h // kh)
    view_spec = pl.BlockSpec((1, C, kh, w), lambda b, i: (b, 0, i, 0))
    lab_spec = pl.BlockSpec((1, 4, 4, kh, w), lambda b, i: (b, 0, 0, i, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, hier=hier),
        grid=grid,
        in_specs=[view_spec] * 9 + [lab_spec, lab_spec],
        out_specs=pl.BlockSpec((8, 128), lambda b, i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(*views, tf_p, tc_p)
    return tuple(out[0, i] for i in range(6))


def _core_fwd_rule(views, labels_phase, hier, kh, interpret):
    return _core_fwd_impl(views, labels_phase, hier, kh, interpret), (
        views,
        labels_phase,
    )


def _core_bwd_rule(hier, kh, interpret, residuals, g):
    views, labels_phase = residuals
    tf_p, tc_p = labels_phase
    B, C, h, w = views[0].shape
    grid = (B, h // kh)
    view_spec = pl.BlockSpec((1, C, kh, w), lambda b, i: (b, 0, i, 0))
    lab_spec = pl.BlockSpec((1, 4, 4, kh, w), lambda b, i: (b, 0, 0, i, 0))
    gvec = jnp.broadcast_to(_lane_vec(list(g)), (8, 128))
    d_views = pl.pallas_call(
        functools.partial(_bwd_kernel, hier=hier),
        grid=grid,
        in_specs=[pl.BlockSpec((8, 128), lambda b, i: (0, 0))]
        + [view_spec] * 9
        + [lab_spec, lab_spec],
        out_specs=[view_spec] * 9,
        out_shape=[jax.ShapeDtypeStruct((B, C, h, w), jnp.float32)] * 9,
        interpret=interpret,
    )(gvec, *views, tf_p, tc_p)
    return tuple(d_views), None


_core.defvjp(_core_fwd_rule, _core_bwd_rule)


def fused_hiera2_loss_sums(
    logits_lo_cmajor: jax.Array,  # [B, C, h, w] f32
    t_fine: jax.Array,  # [B, 4h, 4w] int32
    t_coarse: jax.Array,  # [B, 4h, 4w] int32
    hierarchy: Hierarchy,
    kh: int = 32,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """(s_f, s_c, nvf, nvc, ce_f_sum, ce_c_sum): raw sums of the 2-level
    hierarchy-BCE and CE terms over the 4×-upsampled logits. Loss
    assembly (normalizers, ×5, CE denominators) happens in the caller.

    The edge pad and the 9 shifted views live OUTSIDE the custom-VJP
    boundary: JAX autodiff folds their gradients back onto the raw
    logits, including the resize's edge-clamp semantics.
    """
    B, C, h, w = logits_lo_cmajor.shape
    kh = min(kh, h)
    while h % kh:
        kh //= 2
    lo_pad = jnp.pad(
        logits_lo_cmajor.astype(jnp.float32),
        ((0, 0), (0, 0), (1, 1), (1, 1)),
        mode="edge",
    )
    views = _shift_views(lo_pad)
    tf_p = _phase_split(t_fine, h, w)
    tc_p = _phase_split(t_coarse, h, w)
    return _core(views, (tf_p, tc_p), _hier_tuple(hierarchy), kh, interpret)
