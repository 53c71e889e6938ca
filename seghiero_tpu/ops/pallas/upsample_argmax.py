"""Pallas TPU kernel: fused 4× bilinear upsample + per-level channel
argmax for the inference "hierarchy decode".

Why: the reference decodes by upsampling logits to label resolution and
taking an independent argmax per channel slice (infer.py:298-312). Done
with XLA ops at 1024² this materializes the [B, C, H, W] float tensor in
HBM purely to be reduced again — and `jax.image.resize`'s lowering runs
as convolutions at ~20 TF/s (measured, docs/DESIGN.md), ~2.4 ms of the
27 ms config-5 step. This kernel reconstructs the upsampled logits *in
registers* from quarter-resolution tiles (the same 16-phase / 9-shifted-
views machinery as ops/pallas/hiera2_fused.py) and emits only the int32
per-level masks; nothing full-resolution ever touches HBM.

Forward-only — inference has no backward pass, so the recompute cost
that sank the fused *loss* kernel (hiera2_fused.py "Status") does not
apply here.

Tie semantics: first-max-wins, identical to `jnp.argmax`. Values can
differ from the XLA resize path by float rounding (different
multiply-add order), so argmax flips are possible where two channels are
within ~1 ulp after interpolation — measured agreement on random logits
is ≥99.9% of pixels, and exact against a same-order JAX phase-blend
oracle (tests/test_upsample_argmax.py).

Status: optional (``model.argmax_backend``), DEFAULT OFF ("xla").
Measured on v5e at config-5 shapes ([4, 15, 256, 256] → 1024², 30+
chained steps through the relay):

  * isolated decode, f32 logits: fused **3.10 ms** vs XLA 3.80 ms — the
    kernel wins where `jax.image.resize`'s conv lowering is weakest;
  * isolated decode, bf16 logits: fused 2.70 ms vs XLA **1.97 ms** —
    halving the resize bytes fixes the XLA path, while the kernel still
    pays its 9-view materialization + int32 phase-split transposes;
  * END-TO-END config 5 (model fwd + decode): XLA wins in BOTH dtypes
    (bf16 **27.0** vs 29.3 ms; f32 **33.0** vs 35.1 ms) — XLA
    fuses/overlaps the decode with the tail of the forward, and the
    pallas_call boundary (9 materialized views in, phase-split masks
    out) forfeits that overlap.

The remaining levers (in-kernel lane rolls instead of 9 views, uint8
phase outputs, interleaved stores to fold the inverse-phase transpose)
are bounded by ~1.3 ms — revisit only if the decode share of a serving
config grows. Kept as a correct, tested kernel; the masks-only predict
path it motivated (Predictor._predict_masks — never materializing
full-res logits as a jit OUTPUT) stays, and is backend-independent.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from seghiero_tpu.ops.pallas.hiera2_fused import (
    _PHASE,
    _shift_views,
)

SCALE = 4
# compile-time channel loop: 16 phases × C blend expressions; past ~64
# channels the unrolled kernel stops being worth the compile time
MAX_CHANNELS = 64


def _kernel(*refs, slices_: Tuple[Tuple[int, int], ...], C: int):
    s_refs = refs[:9]
    out_refs = refs[9:]

    def phase_l(c, ro, co, ay, by, ax, bx):
        # taps stay in the stored dtype (bf16 halves the 9-view DMA
        # traffic vs an up-front f32 cast — measured on chip, see
        # module docstring); the blend runs in f32
        def tap(i):
            return s_refs[i][0, c].astype(jnp.float32)

        return ay * (ax * tap(ro * 3 + co) + bx * tap(ro * 3 + co + 1)) + by * (
            ax * tap((ro + 1) * 3 + co) + bx * tap((ro + 1) * 3 + co + 1)
        )

    for py, (ro, ay, by) in enumerate(_PHASE):
        for px, (co, ax, bx) in enumerate(_PHASE):
            l = [phase_l(c, ro, co, ay, by, ax, bx) for c in range(C)]
            for li, (lo, hi) in enumerate(slices_):
                best = l[lo]
                idx = jnp.zeros_like(best, dtype=jnp.int32)
                for c in range(lo + 1, hi):
                    take = l[c] > best  # strict: first max wins (jnp.argmax)
                    idx = jnp.where(take, c - lo, idx)
                    best = jnp.maximum(best, l[c])
                out_refs[li][0, py, px] = idx


def fused_argmax_available(shape, out_hw) -> bool:
    """Exact 4× half-pixel upsample with TPU-friendly tiling only (the
    generic path — e.g. infer.py's resize-to-original-size — falls back
    to XLA)."""
    B, C, h, w = shape
    # worst-case (f32, 3 levels) per-row-block footprint at the kh=8
    # floor must fit the VMEM budget used by fused_upsample_argmax
    min_footprint = (9 * C * w * 4 + 3 * 16 * w * 4) * 2 * 8
    return (
        out_hw[0] == SCALE * h
        and out_hw[1] == SCALE * w
        and h % 8 == 0
        and w % 8 == 0
        and C <= MAX_CHANNELS
        and min_footprint <= 12 * 2**20
    )


def fused_upsample_argmax(
    logits_lo_cmajor: jax.Array,  # [B, C, h, w]
    level_slices: Sequence[Tuple[int, int]],
    kh: int = 32,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Per-level ``argmax(resize4x(logits)[:, lo:hi], axis=1)`` as int32
    [B, 4h, 4w] masks, without materializing the upsampled logits."""
    B, C, h, w = logits_lo_cmajor.shape
    if logits_lo_cmajor.dtype not in (jnp.bfloat16, jnp.float32):
        logits_lo_cmajor = logits_lo_cmajor.astype(jnp.float32)
    # bound the per-tile VMEM footprint, not just kh: 9 double-buffered
    # view blocks [C, kh, w] + the int32 phase outputs [16, kh, w] per
    # level must stay well under the ~16 MB scoped limit (kh=64 at
    # config-5 shapes measured over it; a 62-channel hierarchy would
    # blow it at kh=32 too)
    ib = jnp.dtype(logits_lo_cmajor.dtype).itemsize
    budget = 12 * 2**20
    per_row = (9 * C * w * ib + len(level_slices) * 16 * w * 4) * 2
    kh = min(kh, h, 32, max(8, (budget // per_row) // 8 * 8))
    # fit kh to h in 8-row steps, not by halving: a VMEM clamp like 24
    # with h=40 must land on 8 (sublane-aligned, divides any h%8==0),
    # not degrade through 12→6→3 — sub-8 tile heights are unaligned on
    # TPU. The availability gate guarantees h%8==0; direct (test)
    # callers with other h fall back to halving.
    if h % 8 == 0 and kh % 8 == 0:
        while h % kh:
            kh -= 8
    else:
        while h % kh:
            kh //= 2
    lo_pad = jnp.pad(
        logits_lo_cmajor, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge"
    )
    views = _shift_views(lo_pad)
    grid = (B, h // kh)
    view_spec = pl.BlockSpec((1, C, kh, w), lambda b, i: (b, 0, i, 0))
    out_spec = pl.BlockSpec((1, 4, 4, kh, w), lambda b, i: (b, 0, 0, i, 0))
    slices_ = tuple((int(a), int(b_)) for a, b_ in level_slices)
    outs = pl.pallas_call(
        functools.partial(_kernel, slices_=slices_, C=C),
        grid=grid,
        in_specs=[view_spec] * 9,
        out_specs=[out_spec] * len(slices_),
        out_shape=[
            jax.ShapeDtypeStruct((B, 4, 4, h, w), jnp.int32)
            for _ in slices_
        ],
        interpret=interpret,
    )(*views)
    # inverse phase split: [B, py, px, h, w] → [B, 4h, 4w]
    return tuple(
        o.transpose(0, 3, 1, 4, 2).reshape(B, SCALE * h, SCALE * w)
        for o in outs
    )
