"""Pallas TPU kernel for the 3×3 stride-1 depthwise convolution.

Why: the head's depthwise-separable bottlenecks (models/heads.py,
sep_aspp_contrast_head.py:33-62 of the reference) lower to XLA grouped
convolutions with ``feature_group_count = C`` that run at 2–4 TF/s —
4.6 ms of the 37.9 ms headline train step (fwd + input-grad +
weight-grad at 512²/b8), ~10× above the bandwidth floor: a depthwise
conv does 9 MACs per element and is memory-bound, but the MXU path
scatters it across tiny per-channel contractions.

This kernel computes it on the VPU as 9 shifted multiply-adds over
``[8, W, C]`` row blocks (C in lanes, W in sublanes):

  * rows: the grid walks 8-row tiles of an H-padded (8 rows of zeros on
    each side) input; the row halo is simply the NEIGHBORING 8-row
    block, passed as two extra BlockSpec views of the same array —
    uniform block shape, so all offsets are block-aligned and Pallas
    pipelines the loads. The zero padding makes 'same' edge handling
    automatic in H.
  * columns: ``pltpu.roll`` along the sublane (W) axis + first/last
    column masks (Mosaic supports aligned rolls; offset slices would
    break lane/sublane layout).
  * accumulation in f32, output cast back to the input dtype — the same
    numeric contract as XLA's conv (bf16 in, f32 accumulate).

Backward reuses the structure exactly:
  * input-grad = this same kernel applied to the output cotangent with
    the spatially flipped kernel (stride-1 'same' correlation identity);
  * weight-grad = a sibling kernel accumulating the 9 per-tap
    ``Σ x_shifted · dout`` channel reductions into one ``[9, C]`` block
    across the whole grid.

Scope: 3×3, stride 1, dilation 1, NHWC (the hot sep-bottleneck shape).
The dilated ASPP branches (16² maps, negligible) and anything else fall
back to ``lax.conv_general_dilated``. Like ops/pallas/rmi_gram.py, the
custom call cannot be SPMD-partitioned, so multi-device pjit also falls
back (ddp/shard_map contexts pass ``per_replica=True``).

Status: MEASURED AND DEFAULT OFF (round 1 AND round 2 verdicts).

Round 1: TH=8 with full-tile top/bottom halo blocks (3× DMA read
amplification) totalled 6.4 ms/step vs the 4.6 ms of XLA grouped convs
replaced; the custom-call boundary also broke XLA's conv↔BN/ReLU
fusions (+6.7 ms) and the step regressed 37.9 → 47.2 ms.

Round 2 (this version): TH=32 with 8-row halo blocks (1.5× reads, 4×
fewer grid invocations). In a fwd+bwd chain microbenchmark at the hot
[8, 128, 128, 512] bf16 shape WITH the affine+ReLU context included
(so fusion effects are priced in): XLA grouped conv 3.1 ms, this
kernel 4.2 ms (bit-exact outputs). Root cause is structural, not
tuning: on the VPU the 9 taps cost ≈9·N f32 fma+select (~1.5–2× the
HBM floor at VPU throughput) while XLA maps them onto the MXU; the
estimated PERFECT VPU kernel (~2 ms) would save ≤1 ms/step across both
128² instances. A chain kernel subsuming the whole
depthwise→BN→ReLU→pointwise→BN→ReLU sequence cannot do better in
training mode either: the two BatchNorm batch-stat reductions are
cross-tile barriers, forcing the same 3-pass HBM schedule XLA already
emits (each pass of which the profile shows near the bandwidth
roofline). Kept as a correct, tested kernel (opt-in via
``DepthwiseConv(use_pallas=True)``) and as the recorded experiment —
the same verdict as ops/pallas/hiera2_fused.py.

Round 2 (inference follow-up): the row tile is now W-adaptive
(``_row_tile`` — TH=32 was a 29.8 MB scoped-VMEM OOM at the
1024²-serving sep-bottleneck shape [4, 256, 256, 560]; W=256 → TH=16,
W=512 → TH=8, W>512 rejected by the availability gate), so an opt-in at
serving widths now compiles instead of crashing. But the INFERENCE
verdict matches the training one: isolated, the kernel beats the
isolated grouped conv at [4,256,256,560] (4.2 vs 7.2 ms/op) — yet
end-to-end on BASELINE config 5 the step REGRESSES 27.2 → 37.8 ms,
because in-program XLA fuses the depthwise into its conv pipeline
(profiled at only ~3.8 ms total for all head depthwise ops) and the
custom call forfeits that. ``model.depthwise_backend: pallas`` is the
measured experiment switch; the default ``xla`` is faster everywhere
measured.

Equivalence with the XLA grouped conv is asserted in
tests/test_depthwise_pallas.py (values and both gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HB = 8  # halo block height (minimum sublane-aligned DMA)
CB = 128  # channel block (one lane group) — bounds VMEM: f32 compute
# intermediates at full C=560 blew the 16 MB scoped-vmem budget (22 MB);
# depthwise is channel-separable, so the grid also walks 128-lane chunks


def _row_tile(W: int) -> int:
    """Main-block row height, multiple of HB. The f32 compute
    intermediates (band/acc/shifted) scale with TH·W·CB, so wider
    feature maps need shorter row tiles to stay under the ~16 MB
    scoped-VMEM budget: TH=32 at W=128 (the headline train shape;
    round 1 used 8, which cost 3× halo-DMA read amplification and 4×
    the grid invocations), TH=16 at W=256 (the 1024²-inference
    sep-bottleneck shape — TH=32 there was measured OOM at 29.8 MB),
    TH=8 at W=512. Halo reads stay at (TH+2·HB)/TH."""
    if W <= 128:
        return 32
    if W <= 256:
        return 16
    return HB


def depthwise3x3_available(
    kernel_shape, stride, dilation, W: int, per_replica: bool = False
) -> bool:
    if tuple(kernel_shape[:2]) != (3, 3) or tuple(stride) != (1, 1):
        return False
    if tuple(dilation) != (1, 1) or W % 8 != 0 or W < 16 or W > 512:
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
        return per_replica or jax.device_count() == 1
    except Exception:  # pragma: no cover
        return False


def _taps(band, W):
    """Yield (dy, dx, shifted [TH, W, C] f32, per-tap column mask).
    TH is inferred from the band ([TH+2, W, C])."""
    th = band.shape[0] - 2
    col = jax.lax.broadcasted_iota(jnp.int32, (th, W, 1), 1)
    for dy in range(3):
        rows = band[dy : dy + th]  # [TH, W, C]
        for dx in range(3):
            ox = dx - 1
            if ox == 0:
                yield dy, dx, rows, None
            elif ox == 1:  # reads w+1 → roll left; last column invalid
                yield dy, dx, pltpu.roll(rows, W - 1, 1), col < (W - 1)
            else:  # reads w−1 → roll right; first column invalid
                yield dy, dx, pltpu.roll(rows, 1, 1), col >= 1


def _fwd_kernel(top, main, bot, k_ref, out_ref, *, W):
    band = jnp.concatenate(
        [top[0, HB - 1 :], main[0], bot[0, :1]], axis=0
    ).astype(jnp.float32)  # [TH+2, W, C]
    k = k_ref[:].astype(jnp.float32)  # [9, C]
    acc = jnp.zeros(main.shape[1:], jnp.float32)
    for dy, dx, shifted, mask in _taps(band, W):
        term = shifted * k[dy * 3 + dx][None, None, :]
        acc = acc + (jnp.where(mask, term, 0.0) if mask is not None else term)
    out_ref[0] = acc.astype(out_ref.dtype)


def _wgrad_kernel(top, main, bot, g_ref, dk_ref, *, W):
    b = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((b == 0) & (t == 0))
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    band = jnp.concatenate(
        [top[0, HB - 1 :], main[0], bot[0, :1]], axis=0
    ).astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)  # [TH, W, C]
    for dy, dx, shifted, mask in _taps(band, W):
        prod = shifted * g
        if mask is not None:
            prod = jnp.where(mask, prod, 0.0)
        dk_ref[dy * 3 + dx] = dk_ref[dy * 3 + dx] + jnp.sum(prod, axis=(0, 1))


def _pad_rows(x, th):
    """TH rows of zeros on top (one full main block, so main tile t sits
    at block index t+1) and HB at the bottom (the last tile's bottom
    halo block must exist)."""
    return jnp.pad(x, ((0, 0), (th, HB), (0, 0), (0, 0)))


def _specs(W, th):
    """(top-halo, main, bottom-halo) views of the row-padded input.

    Main is a (1, TH, W, CB) block at row-block index t+1 (x tile t =
    xp rows [TH + t·TH, TH + (t+1)·TH)); the halos are 8-row blocks
    hugging the main block's edges — (t+1)·(TH/HB) − 1 ends exactly at
    the main start, (t+2)·(TH/HB) starts at the main end. Only 1 row of
    each 8-row halo is used, so the DMA read amplification is
    (TH + 2·HB)/TH (1.5× at TH=32) instead of round 1's 3× full-tile
    halos. Grid order is (c, b, t) — channels OUTERMOST so the wgrad
    output block for chunk c stays resident across its whole (b, t)
    sweep (Pallas only guarantees output-block accumulation across
    consecutive grid steps)."""
    main = pl.BlockSpec(
        (1, th, W, CB), lambda c, b, t: (b, t + 1, 0, c),
        memory_space=pltpu.VMEM,
    )
    top = pl.BlockSpec(
        (1, HB, W, CB),
        lambda c, b, t: (b, (t + 1) * (th // HB) - 1, 0, c),
        memory_space=pltpu.VMEM,
    )
    bot = pl.BlockSpec(
        (1, HB, W, CB),
        lambda c, b, t: (b, (t + 2) * (th // HB), 0, c),
        memory_space=pltpu.VMEM,
    )
    return top, main, bot


def _dw_raw(x, k9, interpret):
    """x [B, H, W, C] (H % _row_tile(W) == 0 enforced by caller), k9 [9, C]."""
    B, H, W, C = x.shape
    th = _row_tile(W)
    n_t = H // th
    n_c = -(-C // CB)
    xp = _pad_rows(x, th)
    top, main, bot = _specs(W, th)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(n_c, B, n_t),
        in_specs=[
            top,
            main,
            bot,
            pl.BlockSpec((9, CB), lambda c, b, t: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, CB), lambda c, b, t: (b, t, 0, c), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, xp, xp, k9)


def _dw_wgrad(x, g, interpret):
    B, H, W, C = x.shape
    th = _row_tile(W)
    n_t = H // th
    n_c = -(-C // CB)
    xp = _pad_rows(x, th)
    top, main, bot = _specs(W, th)
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, W=W),
        out_shape=jax.ShapeDtypeStruct((9, C), jnp.float32),
        grid=(n_c, B, n_t),
        in_specs=[
            top,
            main,
            bot,
            pl.BlockSpec(
                (1, th, W, CB), lambda c, b, t: (b, t, 0, c),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (9, CB), lambda c, b, t: (0, c), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, xp, xp, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise3x3(x, k9, interpret=False):
    """Depthwise 3×3/s1 'same' conv; x [B, H, W, C], k9 [9, C] (taps in
    row-major (dy, dx) order). H is padded to a multiple of the W-dependent
    row-tile height internally — up to tile−1 wasted rows on odd sizes."""
    out, _ = _dw_fwd(x, k9, interpret)
    return out


def _run_padded(fn, x, *args):
    B, H, W, C = x.shape
    th = _row_tile(W)
    Hp = ((H + th - 1) // th) * th
    if Hp != H:
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
    out = fn(x, *args)
    return out[:, :H] if (Hp != H and out.ndim == 4) else out


def _dw_fwd(x, k9, interpret):
    out = _run_padded(lambda xx: _dw_raw(xx, k9, interpret), x)
    return out, (x, k9)


def _dw_bwd(interpret, res, g):
    x, k9 = res
    # input-grad: correlate the cotangent with the flipped kernel
    k_flip = k9[::-1]  # reversing (dy*3+dx) row-major order flips both axes
    dx = _run_padded(lambda gg: _dw_raw(gg, k_flip, interpret), g)
    B, H, W, C = x.shape
    th = _row_tile(W)
    Hp = ((H + th - 1) // th) * th
    if Hp != H:
        pad = ((0, 0), (0, Hp - H), (0, 0), (0, 0))
        dk = _dw_wgrad(jnp.pad(x, pad), jnp.pad(g, pad), interpret)
    else:
        dk = _dw_wgrad(x, g, interpret)
    return dx, dk.astype(k9.dtype)


depthwise3x3.defvjp(_dw_fwd, _dw_bwd)
