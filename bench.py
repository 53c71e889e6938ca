#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Default (headline) benchmark: train-step throughput, ResNet-50 backbone +
sep-ASPP contrast head + 2-level HieraTripletLoss at 512×512 on one chip
— the primary metric of BASELINE.json. `vs_baseline` divides by the
assumed A100 PyTorch reference of 40 img/s/chip
(docs/BASELINE_ASSUMPTIONS.md).

Other BASELINE.json configs:
  --config 1   r18 2-level 256², batch 2 (CPU-runnable)
  --config 2   r50 2-level 512² (headline, default)
  --config 3   r50 3-level+RMI 512²
  --config 4   r101 3-level 769², data-parallel over all devices
  --config 5   r101 3-level 1024² batched INFERENCE throughput

The timed loop reuses one device-resident synthetic batch: the metric is
train-step compute throughput per chip (input pipeline excluded). Train
points also report ``flops_per_step`` (XLA ``cost_analysis`` of the
program actually run) and the achieved ``tflops_per_sec`` — see
docs/BASELINE_ASSUMPTIONS.md for the assumed chip peak behind any MFU
claim.

Timeout-proofing (round-3 BENCH artifact was rc=124 with zero numbers —
one hung compile zeroed the whole round):

  * the default all-config run is an ORCHESTRATOR supervising ONE
    persistent worker subprocess (``--worker`` mode: point specs in via
    stdin, results out via stdout). One process for all points matters
    on this relay runtime: the TPU grant takes ~4 min to hand over
    between processes, so per-point subprocesses hang on their first
    *execution* (measured: compile succeeds, warmup never returns);
  * per-point watchdog in the parent: no result within the point's cap
    → kill the worker, record the error, wait out the grant-recovery
    window, respawn for the remaining points;
  * the headline config runs FIRST, and an updated partial headline
    JSON line is (re)printed after EVERY completed point — a mid-sweep
    kill leaves a parseable last line carrying all completed points;
    the final enriched JSON prints last and supersedes them;
  * a wall-clock budget (env ``BENCH_BUDGET_S``, default 1100 s) after
    which no new point starts;
  * ``JAX_COMPILATION_CACHE_DIR`` is set (same dir as tests/conftest.py)
    so re-runs skip unchanged compiles;
  * per-point compile/wall seconds go to stderr for diagnosability.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

A100_REF_IMG_S = 40.0  # docs/BASELINE_ASSUMPTIONS.md

_WORKER_MODE = False


def _hb(stage: str):
    """Worker→orchestrator heartbeat (stdout JSON line). Stages: build
    (trainer/dataset construction), compile (XLA lower+compile), exec
    (device execution — the short stall limit applies there, see
    ``_Worker.run``). No-op outside ``--worker`` mode."""
    if _WORKER_MODE:
        print(json.dumps({"hb": stage}), flush=True)

CLASSES_2L = {
    "coarse_to_fine_map": [[0, 3], [4, 6], [7], [8]],
    "coarse_names": {0: "a", 1: "b", 2: "c", 3: "d"},
    "fine_names": {i: f"f{i}" for i in range(9)},
}
CLASSES_3L = dict(
    CLASSES_2L,
    super_coarse_to_coarse_map=[[0, 2], [3]],
    super_coarse_names={0: "x", 1: "y"},
)

BENCH_CONFIGS = {
    1: dict(depth=18, hw=256, batch=2, levels=2, mode="train"),
    2: dict(depth=50, hw=512, batch=8, levels=2, mode="train"),
    3: dict(depth=50, hw=512, batch=4, levels=3, mode="train"),
    4: dict(depth=101, hw=769, batch=2, levels=3, mode="train", all_devices=True),
    5: dict(depth=101, hw=1024, batch=4, levels=3, mode="infer", all_devices=True),
}

# config 1's step (r18 @ 256²/b2, ~4 ms device time) is smaller than
# one dispatch round-trip on remote-relay runtimes — fold steps there.
# Config 5 stays per-call: it is already device-bound (26.3 ms/step
# vs 25.1 ms device profile), and a scan-folded variant MEASURED
# SLOWER (34.9 ms/step) — the carry dependency serializes buffer
# reuse the per-call pipeline gets for free.
SPD_DEFAULT = {1: 10}


def _set_cache_env():
    """Persistent XLA compilation cache (same dir as tests/conftest.py):
    one slow compile per program per machine, ever — the round-3 failure
    mode (a 20-min driver window eaten by recompiles) cannot recur."""
    here = os.path.dirname(os.path.abspath(__file__))
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(here, ".jax_cache")
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def make_classes(n_fine: int, group: int = 5, levels: int = 2) -> dict:
    """A generated N-fine-class hierarchy (ADE20K-scale benching): fine
    classes in contiguous groups of ``group`` per coarse class. Above
    ``losses.hiera.LUT_UNROLL_MAX`` (64) the target-LUT path statically
    switches from the unrolled compare-select chain to a gather — the
    crossover this exists to measure (round-2 verdict ask #6)."""
    n_coarse = -(-n_fine // group)
    # map entries are [lbl] or [start, end] INCLUSIVE ranges (the
    # reference's hierarchy-table format, seghiero_tpu.config)
    c2f = [[i * group, min((i + 1) * group, n_fine) - 1]
           for i in range(n_coarse)]
    classes = {
        "coarse_to_fine_map": c2f,
        "coarse_names": {i: f"c{i}" for i in range(n_coarse)},
        "fine_names": {i: f"f{i}" for i in range(n_fine)},
    }
    if levels == 3:
        n_super = -(-n_coarse // group)
        classes["super_coarse_to_coarse_map"] = [
            [i * group, min((i + 1) * group, n_coarse) - 1]
            for i in range(n_super)
        ]
        classes["super_coarse_names"] = {i: f"s{i}" for i in range(n_super)}
    return classes


def build(spec: dict):
    """Build (trainer, device_batch, cfg_spec, global_batch) for a point
    spec. Precision knobs are only forwarded when explicitly set, so the
    framework defaults (config.py: hiera_precision 'fast',
    rmi_precision 'parity' — DESIGN.md decision 23) apply."""
    import jax

    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    cfg_spec = dict(BENCH_CONFIGS[spec["cid"]])
    if spec.get("dry"):
        cfg_spec.update(hw=64, batch=2, all_devices=False)
    n_dev = len(jax.devices()) if cfg_spec.get("all_devices") else 1
    batch = (spec.get("batch_override") or cfg_spec["batch"]) * n_dev
    if spec.get("fine_classes"):
        classes = make_classes(spec["fine_classes"], levels=cfg_spec["levels"])
    else:
        classes = CLASSES_3L if cfg_spec["levels"] == 3 else CLASSES_2L
    training = {
        "epochs": 1,
        "batch_size": batch,
        "lr": 0.001,
        "log_every": 10**9,
        "mesh": {"data": n_dev},
        "steps_per_dispatch": spec.get("steps_per_dispatch") or 1,
    }
    for knob in ("rmi_precision", "hiera_precision", "compiler_options",
                 "rmi_backend", "rmi_streaming"):
        if spec.get(knob):
            training[knob] = spec[knob]
    if spec.get("pallas_fused_loss"):
        training["pallas_fused_loss"] = True
    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": batch},
            "classes": classes,
            "model": {
                "depth": cfg_spec["depth"],
                "dtype": spec.get("dtype", "bfloat16"),
                "remat": bool(spec.get("remat")),
                "depthwise_backend": spec.get("depthwise_backend", "xla"),
                **(
                    {"argmax_backend": spec["argmax_backend"]}
                    if spec.get("argmax_backend")
                    else {}
                ),
                **({"backbone": spec["backbone"]} if spec.get("backbone") else {}),
                **({"stem": spec["stem"]} if spec.get("stem") else {}),
                **(
                    {"backbone_options": {"variant": spec["backbone_variant"]}}
                    if spec.get("backbone_variant")
                    else {}
                ),
                **({"head": spec["head"]} if spec.get("head") else {}),
            },
            "training": training,
            "transform": {
                "resize": [cfg_spec["hw"], cfg_spec["hw"]],
                "hflip_prob": 0.5,
            },
            "output": {"checkpoint_dir": "/tmp/bench_ckpt", "project_name": "bench"},
        }
    )
    trainer = Trainer(cfg, verbose=False)
    batch_data = next(iter(trainer.train_loader))
    return trainer, batch_data, cfg_spec, batch


def _flops_of(compiled):
    """XLA's own FLOP count for the compiled program, or None where the
    backend does not implement cost_analysis."""
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _aot(jitted, *args):
    """Lower + compile once (AOT): the timed loop calls the compiled
    object directly, and cost_analysis comes from the same program —
    no second trace/compile. Compile seconds go to stderr (verdict r3
    ask: make the next stall diagnosable)."""
    _hb("compile")
    t0 = time.perf_counter()
    compiled = jitted.lower(*args).compile()
    print(f"# compile {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)
    _hb("exec")
    return compiled


def run_train_bench(trainer, batch, steps: int, min_time_s: float = 1.0):
    """Returns (elapsed_seconds, final_loss, steps_actually_run, flops).

    The timing window auto-scales: after the first measurement, if the
    window is shorter than ``min_time_s`` of device time the loop re-runs
    with proportionally more steps (capped at 1024). Sub-10-ms configs
    (config 1: ~4 ms/step) otherwise measure ~0.1 s and swing 7% run to
    run (BENCH_r02 473 vs DESIGN.md 509 img/s/chip on identical code).
    """
    import jax
    import jax.numpy as jnp

    state = trainer.state
    epoch = jnp.asarray(0)
    k = trainer.cfg.training.steps_per_dispatch
    # warmup: compile + settle. NOTE: through the remote-TPU relay in
    # this environment, block_until_ready does NOT barrier on remote
    # execution — only a device_get (host materialization) does. The
    # loss scalar transitively depends on the whole step chain, so
    # fetching the final loss times all executions correctly.
    print("# warmup (compile)...", file=sys.stderr, flush=True)
    if k > 1:
        # training.steps_per_dispatch: lax.scan folds k optimizer steps
        # into one dispatch — the honest trainer fast path for steps
        # whose device time is smaller than the dispatch round-trip.
        # The bench reuses one device-resident batch, so the stacked
        # [k, B, ...] batch is k copies of it, built once outside timing.
        stacked = trainer._stack_batches(*([batch] * k))
        step_fn = _aot(trainer._train_superstep, state, stacked, epoch)
        flops = _flops_of(step_fn)
        flops = flops / k if flops else None
        for i in range(2):
            state, m = step_fn(state, stacked, epoch)
            print(
                f"# warmup dispatch {i}: loss={float(jax.device_get(m['loss'])):.4f}",
                file=sys.stderr, flush=True,
            )
            _hb("exec")

        def timed(n_calls):
            nonlocal state, m
            _hb("exec")
            t0 = time.perf_counter()
            for _ in range(n_calls):
                state, m = step_fn(state, stacked, epoch)
            loss = float(jax.device_get(m["loss"]))
            return time.perf_counter() - t0, loss

        calls = max(1, -(-steps // k))  # ceil
        dt, loss = timed(calls)
        if dt < min_time_s:
            calls = min(-(-1024 // k), max(calls + 1, int(calls * 1.2 * min_time_s / dt)))
            print(f"# window {dt:.2f}s < {min_time_s}s; re-timing over "
                  f"{calls} dispatches", file=sys.stderr, flush=True)
            dt, loss = timed(calls)
        # median-of-3 windows — same stall robustness as the per-step path
        dts = sorted((dt, timed(calls)[0], timed(calls)[0]))
        return dts[1], loss, calls * k, flops
    step_fn = _aot(trainer._train_step, state, batch, epoch)
    flops = _flops_of(step_fn)
    for i in range(3):
        state, m = step_fn(state, batch, epoch)
        print(f"# warmup step {i}: loss={float(jax.device_get(m['loss'])):.4f}",
              file=sys.stderr, flush=True)
        _hb("exec")

    def timed(n):
        nonlocal state, m
        _hb("exec")
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step_fn(state, batch, epoch)
        loss = float(jax.device_get(m["loss"]))
        return time.perf_counter() - t0, loss

    dt, loss = timed(steps)
    if dt < min_time_s:
        steps = min(1024, max(steps + 1, int(steps * 1.2 * min_time_s / dt)))
        print(f"# window {dt:.2f}s < {min_time_s}s; re-timing over "
              f"{steps} steps", file=sys.stderr, flush=True)
        dt, loss = timed(steps)
    # median-of-3 windows (round-4 verdict ask #6): a single timed
    # window is exposed to one-off relay stalls — measured on config 3,
    # 4 of 5 same-program repeats landed within ±0.05% and one fell
    # 10.7% (an execution-time transient, same compiled program). Two
    # more windows cost ~2× the window and the median ignores one stall.
    dt2, loss = timed(steps)
    dt3, loss = timed(steps)
    dts = sorted((dt, dt2, dt3))
    print(f"# windows s/step: {', '.join(f'{d / steps:.5f}' for d in dts)} "
          f"(median reported)", file=sys.stderr, flush=True)
    return dts[1], loss, steps, flops


def run_infer_bench(trainer, batch, steps: int, spd: int = 1):
    import jax

    from seghiero_tpu.infer.predictor import Predictor

    cfg = trainer.cfg
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    pred = Predictor(cfg, variables, mesh=trainer.mesh)
    images = batch["image"]
    out_hw = tuple(images.shape[1:3])

    # ONE jitted program per DISPATCH: `spd` chained predicts in a
    # lax.scan (image -> image dependency keeps them sequential) plus a
    # final predict whose output is returned. Eager chaining costs
    # several dispatch round-trips per step — measured 139 ms/step vs
    # 25 ms of actual device time at 1024²/b4 through the relay.
    # `variables` is an explicit argument (not a closure) so the weights
    # are jaxpr inputs, not baked-in constants — closing over an
    # r101-scale tree inflates trace/compile memory and re-bakes the
    # constants on every call of this function.
    def bump_im(variables, images):
        preds = pred._predict_masks(variables, images, out_hw)
        # the image->image dependency must NOT be algebraically zero: a
        # `pred * 0` bump gets constant-folded and the whole chained
        # predict dies as dead code (measured: the scan version then
        # "ran" r101@1024² at 3.5 ms/step — one real predict per K).
        # Perturb one pixel by the parity of one predicted label instead.
        tag = (preds["fine"][:, :1, :1] & 1).astype(images.dtype)
        images = images.at[:, :1, :1, 0].add(tag)
        return images, preds

    @jax.jit
    def chained(variables, images):
        if spd > 1:
            images, _ = jax.lax.scan(
                lambda im, _: (bump_im(variables, im)[0], None),
                images,
                None,
                length=spd - 1,
            )
        return bump_im(variables, images)

    per_call = spd
    print("# warmup (compile)...", file=sys.stderr, flush=True)
    chained = _aot(chained, variables, images)
    flops = _flops_of(chained)
    flops = flops / spd if flops else None  # per predict, not per dispatch
    t0 = time.perf_counter()
    for _ in range(2):
        images, preds = chained(variables, images)
    jax.device_get(preds["fine"][0, 0, 0])
    print(f"# warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    _hb("exec")

    def timed(n_calls):
        nonlocal images, preds
        _hb("exec")
        t0 = time.perf_counter()
        for _ in range(n_calls):
            images, preds = chained(variables, images)
        jax.device_get(preds["fine"][0, 0, 0])
        return time.perf_counter() - t0

    calls = max(1, -(-steps // per_call))  # ceil
    dt = timed(calls)
    if dt < 1.0:  # same ≥1 s window rule as run_train_bench
        calls = min(-(-1024 // per_call),
                    max(calls + 1, int(calls * 1.2 / dt)))
        print(f"# window {dt:.2f}s < 1.0s; re-timing over {calls} calls",
              file=sys.stderr, flush=True)
        dt = timed(calls)
    # median-of-3 windows — same stall robustness as run_train_bench
    dts = sorted((dt, timed(calls), timed(calls)))
    return dts[1], 0.0, calls * per_call, flops


def _gen_pipeline_dataset(root: str, n: int, hw: int, classes: dict):
    """Write an n-sample file-backed dataset (PNG image/mask pairs at
    hw²) rendered from the synthetic shapes generator — the disk corpus
    for the fed-pipeline benchmark. Idempotent per (root, n, hw)."""
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return
    import numpy as np
    from PIL import Image

    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.data.synthetic import SyntheticShapesDataset

    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": n},
            "classes": classes,
            "transform": {"resize": [hw, hw]},
            "output": {"checkpoint_dir": "/tmp/bench_ckpt", "project_name": "pipe"},
        }
    )
    ds = SyntheticShapesDataset(cfg, "train", seed=11)
    img_dir = os.path.join(root, "img")
    msk_dir = os.path.join(root, "msk")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(msk_dir, exist_ok=True)
    t0 = time.perf_counter()
    for i in range(n):
        s = ds[i]
        Image.fromarray(s["image"]).save(os.path.join(img_dir, f"{i:05d}.png"))
        Image.fromarray(s["fine"].astype(np.uint8)).save(
            os.path.join(msk_dir, f"{i:05d}.png")
        )
    with open(done, "w") as f:
        f.write("ok")
    print(f"# pipeline dataset: {n}x{hw}² PNGs in "
          f"{time.perf_counter() - t0:.1f}s -> {root}",
          file=sys.stderr, flush=True)


def _pipe_cfg_dict(root: str, hw: int, batch: int, classes: dict,
                   depth: int, dtype: str, variant: str) -> dict:
    """Config dict for one pipeline variant: 'pil' | 'pil_w4' | 'native'
    | 'cache' | 'cache_devflip'."""
    transform = {"resize": [hw, hw], "hflip_prob": 0.5}
    dataset = {
        "root": root,
        "train": {"image_subdir": "img", "mask_subdir": "msk"},
        "val": {"image_subdir": "img", "mask_subdir": "msk"},
    }
    training = {"epochs": 1, "batch_size": batch, "lr": 0.001,
                "log_every": 10**9, "num_workers": 0}
    if variant == "pil_w4":
        training["num_workers"] = 4
    elif variant == "native":
        transform["backend"] = "native"
    elif variant in ("cache", "cache_devflip"):
        dataset["cache"] = "raw"
        dataset["cache_dir"] = os.path.join(root, "_rawcache")
        if variant == "cache_devflip":
            transform["device_hflip"] = True
    return {
        "dataset": dataset,
        "classes": classes,
        "model": {"depth": depth, "dtype": dtype},
        "training": training,
        "transform": transform,
        "output": {"checkpoint_dir": "/tmp/bench_ckpt", "project_name": "pipe"},
    }


def pipeline_bench(spec: dict) -> dict:
    """End-to-end *fed* throughput (round-4 verdict ask #1): the host
    input pipeline (file decode → augment → collate → device_put) feeding
    the real jitted train step, vs the device-resident number the other
    configs report. Match target: the reference's full loop
    (/root/reference/train.py:121-134,261-262 — DataLoader workers → H2D
    copy → step). Also reports host-only loader rates per backend so a
    gap is attributable (decode vs transfer vs step)."""
    import jax

    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.data.dataset import build_dataset
    from seghiero_tpu.data.pipeline import BatchLoader

    dry = bool(spec.get("dry"))
    hw = 64 if dry else 512
    n = 24 if dry else 96
    batch = 2 if dry else 8
    depth = 18 if dry else 50
    steps = 4 if dry else max(24, spec.get("steps", 30))
    dtype = spec.get("dtype", "bfloat16")
    classes = CLASSES_2L
    root = f"/tmp/bench_pipe_{n}_{hw}"

    _hb("build")
    _gen_pipeline_dataset(root, n, hw, classes)

    res = {"n_files": n, "hw": hw, "batch": batch, "host": {}}

    # --- host-only loader rates (no device involved) ------------------
    variants = ["pil", "pil_w4", "native", "cache", "cache_devflip"]
    for variant in variants:
        _hb("build")
        try:
            cfg = SegHieroConfig.from_dict(
                _pipe_cfg_dict(root, hw, batch, classes, depth, dtype, variant)
            )
            ds = build_dataset(cfg, "train", include_levels=False,
                               verbose=False)
            loader = BatchLoader(
                ds, batch, shuffle=True, drop_last=True,
                num_workers=cfg.training.num_workers, prefetch=0,
            )
            # ≥2 s window (mid-epoch break allowed — slow decode backends
            # at 512² would otherwise run a whole ~20 s epoch)
            win = 0.5 if dry else 2.0
            t0 = time.perf_counter()
            images = 0
            epoch = 0
            while time.perf_counter() - t0 < win:
                loader.set_epoch(epoch)
                for b in loader:
                    images += b["image"].shape[0]
                    if (
                        time.perf_counter() - t0 >= win
                        and images >= 4 * batch
                    ):
                        break
                epoch += 1
            dt = time.perf_counter() - t0
            res["host"][variant] = round(images / dt, 2)
        except Exception as e:  # native backend may be unavailable etc.
            res["host"][variant] = f"error: {type(e).__name__}: {e}"
        print(f"# pipeline host[{variant}]: {res['host'][variant]} img/s",
              file=sys.stderr, flush=True)

    # --- H2D transfer attribution: device_put alone, no model ---------
    # On tunneled-relay runtimes the host→device link, not host decode,
    # caps fed throughput (measured round 5: ~8.4 MB/batch at ~75 MB/s
    # ≈ 111 ms vs a 34 ms step); this point pins that number so the fed
    # gap is attributable. On a local-PCIe TPU VM this is <1 ms/batch.
    def h2d_run():
        import jax
        import jax.numpy as jnp

        cfg = SegHieroConfig.from_dict(
            _pipe_cfg_dict(root, hw, batch, classes, depth, dtype,
                           "cache_devflip")
        )
        ds = build_dataset(cfg, "train", include_levels=False, verbose=False)
        # two distinct host batches, alternated so no transfer can be
        # elided as a repeat of the previous buffer
        b0 = ds.get_batch(list(range(batch)))
        b1 = ds.get_batch(list(range(batch, 2 * batch)))
        nbytes = sum(v.nbytes for v in b0.values())
        consume = jax.jit(
            lambda b: b["image"].astype(jnp.int32).sum()
            + b["fine"].astype(jnp.int32).sum()
        )
        jax.device_get(consume(jax.device_put(b0)))  # compile + warm
        _hb("exec")
        reps = 3 if dry else 10
        t0 = time.perf_counter()
        for i in range(reps):
            jax.device_get(consume(jax.device_put(b0 if i % 2 else b1)))
        dt = (time.perf_counter() - t0) / reps
        return {
            "batch_mb": round(nbytes / 2**20, 2),
            "ms_per_batch": round(dt * 1e3, 1),
            "mb_per_s": round(nbytes / 2**20 / dt, 1),
        }

    _hb("build")
    try:
        res["h2d"] = h2d_run()
    except Exception as e:
        res["h2d"] = f"error: {type(e).__name__}: {e}"
    print(f"# pipeline h2d: {res['h2d']}", file=sys.stderr, flush=True)

    # --- fed training: loader → device_put → real train step ----------
    def fed_run(variant: str):
        from seghiero_tpu.train.trainer import Trainer

        cfg = SegHieroConfig.from_dict(
            _pipe_cfg_dict(root, hw, batch, classes, depth, dtype, variant)
        )
        trainer = Trainer(cfg, verbose=False)
        state = trainer.state
        epoch_arr = jax.numpy.asarray(0)
        # warmup/compile on the first batch (the step program is shared
        # with the device-resident config-2 run → usually cache-warm)
        it = iter(trainer.train_loader)
        first = next(it)
        step_fn = _aot(trainer._train_step, state, first, epoch_arr)
        state, m = step_fn(state, first, epoch_arr)
        float(jax.device_get(m["loss"]))
        _hb("exec")
        done_steps = 0
        t0 = time.perf_counter()
        while done_steps < steps:
            for b in it:
                state, m = step_fn(state, b, epoch_arr)
                done_steps += 1
                if done_steps >= steps:
                    break
            else:
                trainer.train_loader.set_epoch(done_steps)  # new epoch
                it = iter(trainer.train_loader)
        loss = float(jax.device_get(m["loss"]))
        dt = time.perf_counter() - t0
        del trainer, state
        import gc

        gc.collect()
        return {
            "images_per_sec": round(batch * done_steps / dt, 2),
            "seconds_per_step": round(dt / done_steps, 5),
            "steps": done_steps,
            "final_loss": loss,
        }

    for variant in ("pil", "cache_devflip"):
        _hb("build")
        try:
            res[f"fed_{variant}"] = fed_run(variant)
        except Exception as e:
            res[f"fed_{variant}"] = f"error: {type(e).__name__}: {e}"
        print(f"# pipeline fed[{variant}]: {res[f'fed_{variant}']}",
              file=sys.stderr, flush=True)
    return res


def parse_compiler_options(spec: str):
    """'k=v,k2=v2' -> dict; bare keys default to 'true'."""
    if not spec:
        return None
    out = {}
    for item in spec.split(","):
        k, _, v = item.strip().partition("=")
        out[k] = v if v else "true"
    return out


def bench_point(spec: dict) -> dict:
    """One (config, operating point) measurement → result dict; OOM
    (or any build/run failure) is recorded, not fatal — the driver
    artifact must survive an over-ambitious sweep point."""
    import jax

    if spec.get("platform"):
        # env JAX_PLATFORMS alone is not enough where a sitecustomize
        # pins a platform plugin; set it through the config API before
        # the first backend initializes
        jax.config.update("jax_platforms", spec["platform"])

    if spec.get("probe"):
        # chip-health probe: one trivial jitted op + device_get. Through
        # the relay this is where a process-handover hang bites (compile
        # is served fine; the first *execution* never returns), so the
        # orchestrator runs this first with a short exec-stall limit and
        # absorbs the hang cheaply before the headline point.
        import jax.numpy as jnp

        _hb("compile")
        f = jax.jit(lambda x: x + 1)
        lowered = f.lower(jnp.zeros(()))
        compiled = lowered.compile()
        _hb("exec")
        val = float(jax.device_get(compiled(jnp.ones(()))))
        return {"ok": val == 2.0,
                "platform": jax.devices()[0].platform}

    if spec.get("pipeline"):
        try:
            return pipeline_bench(spec)
        except Exception as e:
            print(f"# pipeline bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            return {"error": f"{type(e).__name__}: {e}"}

    _hb("build")
    cid = spec["cid"]
    steps = spec.get("steps", 30)
    spd = spec.get("steps_per_dispatch")
    if spd is None:
        spd = SPD_DEFAULT.get(cid, 1)
    is_train = BENCH_CONFIGS[cid]["mode"] == "train"
    spec = dict(spec, steps_per_dispatch=spd if is_train else 1)
    try:
        trainer, batch, cfg_spec, global_batch = build(spec)
        n_chips = trainer.mesh.devices.size
        if cfg_spec["mode"] == "train":
            dt, loss, n_steps, flops = run_train_bench(trainer, batch, steps)
        else:
            dt, loss, n_steps, flops = run_infer_bench(
                trainer, batch, steps, spd
            )
    except Exception as e:  # typically RESOURCE_EXHAUSTED at big batch
        print(f"# config {cid} point failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return dict(error=f"{type(e).__name__}: {e}",
                    batch=spec.get("batch_override"),
                    remat=bool(spec.get("remat")))
    img_s = global_batch * n_steps / dt
    res = dict(
        images_per_sec=img_s,
        images_per_sec_per_chip=img_s / n_chips,
        seconds_per_step=dt / n_steps,
        chips=n_chips,
        batch=global_batch,
        steps_per_dispatch=spd,
        final_loss=loss,
        remat=bool(spec.get("remat")),
        # effective precisions, for auditability (config defaults apply
        # when the point spec leaves them unset)
        hiera_precision=trainer.cfg.training.hiera_precision,
    )
    if cfg_spec["levels"] == 3:
        res["rmi_precision"] = trainer.cfg.training.rmi_precision
    if flops:
        res["flops_per_step"] = flops
        res["tflops_per_sec"] = flops / (dt / n_steps) / 1e12
    tag = "".join(
        f" {k}={spec[k]}"
        for k in ("batch_override", "remat", "rmi_precision",
                  "hiera_precision", "fine_classes")
        if spec.get(k)
    )
    tf = f", {res['tflops_per_sec']:.1f} TFLOP/s" if flops else ""
    print(
        f"# config {cid}{tag}: {img_s:.2f} img/s total, "
        f"{img_s / n_chips:.2f} img/s/chip, {dt / n_steps * 1e3:.1f} ms/step{tf}",
        file=sys.stderr, flush=True,
    )
    # release this config's params/opt-state/batch before the next
    # build — configs 4/5 are r101 at 769²/1024² and HBM is finite
    del trainer, batch
    import gc

    gc.collect()
    return res


def _headline_json(results: dict, headline_id: str, partial: bool = False):
    headline = results.get(headline_id, {})
    if "images_per_sec_per_chip" not in headline:
        return {"metric": "bench_error", "value": 0,
                "unit": "images/sec/chip", "vs_baseline": 0,
                "details": results}
    value = headline["images_per_sec_per_chip"]
    cfg_spec = BENCH_CONFIGS[int(headline_id)]
    name = (
        "train_images_per_sec_per_chip_r50_2level_512"
        if headline_id == "2"
        else f"{cfg_spec['mode']}_images_per_sec_per_chip_r{cfg_spec['depth']}_"
        f"{cfg_spec['levels']}level_{cfg_spec['hw']}"
    )
    details = dict(results)
    if partial:
        details["partial"] = True
    return {
        "metric": name,
        "value": round(value, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / A100_REF_IMG_S, 3),
        "details": details,
    }


def _emit(out: dict, final: bool = False):
    """Print a headline JSON line whose LAST-line form is COMPACT.

    Round-4 postmortem: the final stdout line embedded the entire
    ``details`` dict, overflowing the driver's stdout tail window — the
    artifact recorded ``parsed: null`` two rounds running. Now every
    stdout emission is the 4-key compact dict; the full ``details`` go
    (a) to stderr and (b) to ``bench_details.json`` next to this file,
    so nothing is lost but the parseable line always survives the tail.
    """
    details = out.get("details")
    compact = {k: v for k, v in out.items() if k != "details"}
    if details is not None:
        # the '#' prefix keeps this line non-JSON so only the compact
        # line below is parseable; printing it to stdout right before
        # the final line keeps (most of) the details inside the
        # driver's stdout tail window for the record
        line = "# details: " + json.dumps(details)
        if final:
            print(line, flush=True)
        print(line, file=sys.stderr, flush=True)
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, "bench_details.json"), "w") as f:
                json.dump(out, f, indent=1)
        except OSError:
            pass
    print(json.dumps(compact), flush=True)


class _Worker:
    """One persistent ``--worker`` subprocess: specs in via stdin (one
    JSON per line), results out via stdout. A reader thread feeds a
    queue so the parent can wait with a per-point deadline."""

    def __init__(self):
        import queue
        import threading

        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
            bufsize=1,
        )
        self.q = queue.Queue()

        def _read():
            for line in self.proc.stdout:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        self.q.put(json.loads(line))
                    except json.JSONDecodeError:
                        pass
            self.q.put(None)  # EOF

        self._t = threading.Thread(target=_read, daemon=True)
        self._t.start()

    def run(self, spec: dict, cap: float, exec_stall: float = 180.0):
        """Returns the result dict, or None on hang/crash (worker is
        dead afterwards — caller must respawn).

        Stall detection rides the worker's ``{"hb": stage}`` heartbeat
        lines: build/compile stages may legitimately be slow (cold
        r101@1024² compiles) and get the full ``cap``, but once the
        worker reports the ``exec`` stage, silence for ``exec_stall``
        seconds means the relay-handover hang (compile succeeds, first
        execution never returns — see module docstring) and the worker
        is killed immediately instead of burning the whole cap."""
        import queue

        try:
            self.proc.stdin.write(json.dumps(spec) + "\n")
            self.proc.stdin.flush()
        except (BrokenPipeError, OSError):
            return None
        deadline = time.monotonic() + cap
        stage = "build"
        last_msg = time.monotonic()
        while True:
            now = time.monotonic()
            stall_deadline = (
                last_msg + exec_stall if stage == "exec" else deadline
            )
            try:
                msg = self.q.get(
                    timeout=max(0.1, min(deadline, stall_deadline) - now)
                )
            except queue.Empty:
                if time.monotonic() >= min(deadline, stall_deadline):
                    if stage == "exec" and time.monotonic() < deadline:
                        print(
                            f"# exec-stage stall >{exec_stall:.0f}s "
                            "(handover hang) — killing worker early",
                            file=sys.stderr, flush=True,
                        )
                    self.kill()
                    return None
                continue
            if msg is None:  # worker exited without a result
                return None
            last_msg = time.monotonic()
            if "point_result" in msg:
                return msg["point_result"]
            if "hb" in msg:
                stage = msg["hb"]
            # ignore other chatter lines

    def kill(self):
        try:
            self.proc.kill()
        except OSError:
            pass


def orchestrate(args, base_spec: dict):
    """Default all-config run: one persistent worker process executes
    points sequentially (no TPU-grant churn); the parent watchdogs each
    point, respawns on hangs, re-emits a partial headline JSON after
    every completed point, and enforces the wall-clock budget."""
    t_start = time.monotonic()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1100"))

    def remaining():
        return budget - (time.monotonic() - t_start)

    # after killing a hung TPU worker, the chip's grant needs ~4 min to
    # recover on this relay runtime — a respawned worker inside that
    # window hangs on its first execution. CPU workers need no pause.
    recovery_s = float(os.environ.get(
        "BENCH_RECOVERY_S", "0" if base_spec.get("platform") == "cpu" else "240"
    ))

    results = {}
    worker = _Worker()
    headline_emitted = False

    # 0. chip probe (trivial op, short exec-stall limit): if the device
    #    grant is mid-handover — the round-3 failure mode — the hang is
    #    absorbed here for ~90 s + recovery wait instead of eating the
    #    headline point's whole cap. Two attempts, then proceed anyway:
    #    the per-point watchdogs still bound every later point.
    for attempt in range(2):
        t0 = time.monotonic()
        r = worker.run(dict(base_spec, probe=True),
                       cap=max(60, min(300, remaining() - 60)),
                       exec_stall=90)
        if r is not None and r.get("ok"):
            print(f"# probe ok in {time.monotonic() - t0:.0f}s: {r}",
                  file=sys.stderr, flush=True)
            break
        if r is not None:
            # a result with ok=False means the chip MISCOMPUTED the
            # trivial op — as disqualifying as a hang (ADVICE r4: the
            # field was logged but never checked)
            print(f"# probe MISCOMPUTE (attempt {attempt + 1}): {r} — "
                  "respawning worker", file=sys.stderr, flush=True)
        else:
            print(f"# probe hang (attempt {attempt + 1}) — respawning worker",
                  file=sys.stderr, flush=True)
        worker.kill()
        if recovery_s and remaining() > recovery_s + 120:
            print(f"# waiting {recovery_s:.0f}s for device-grant recovery",
                  file=sys.stderr, flush=True)
            time.sleep(recovery_s)
        worker = _Worker()

    def emit_partial():
        if "2" in results and "images_per_sec_per_chip" in results["2"]:
            _emit(_headline_json(results, "2", partial=True))

    def point(cid, cap, **kw):
        nonlocal worker
        if remaining() < 90:
            print(f"# budget exhausted ({budget:.0f}s) — skipping config "
                  f"{cid} {kw}", file=sys.stderr, flush=True)
            return {"skipped": "wall-clock budget"}
        cap = max(60.0, min(cap, remaining() - 10))
        t0 = time.monotonic()
        res = worker.run(dict(base_spec, cid=cid, **kw), cap)
        wall = time.monotonic() - t0
        if res is None:
            print(f"# WATCHDOG: worker killed on config {cid} {kw} after "
                  f"{wall:.0f}s", file=sys.stderr, flush=True)
            worker.kill()
            if recovery_s and remaining() > recovery_s + 90:
                print(f"# waiting {recovery_s:.0f}s for device-grant "
                      "recovery", file=sys.stderr, flush=True)
                time.sleep(recovery_s)
            worker = _Worker()
            return {"error": f"hang/crash after {wall:.0f}s (watchdog)"}
        print(f"# point wall {wall:.0f}s", file=sys.stderr, flush=True)
        # transient relay/server failures (e.g. remote_compile HTTP 500,
        # tpu_compile_helper crashes) succeed on immediate retry — one
        # retry in the same warm worker; real errors (OOM) repeat and
        # are returned as-is
        err = res.get("error", "")
        if any(s in err for s in ("INTERNAL", "HTTP 5", "UNAVAILABLE")):
            if remaining() < 90:
                return res  # no budget left for a retry
            print(f"# transient error on config {cid} {kw} — one retry",
                  file=sys.stderr, flush=True)
            # re-clamp: the entry cap is stale after the failed attempt
            retry = worker.run(
                dict(base_spec, cid=cid, **kw),
                max(60.0, min(cap, remaining() - 10)),
            )
            if retry is not None:
                return retry
            worker.kill()
            worker = _Worker()
        return res

    # 1. headline FIRST (one retry — it is THE number), early JSON emit
    results["2"] = point(2, cap=420)
    if "images_per_sec_per_chip" not in results["2"] and remaining() > 240:
        print("# headline failed — one retry", file=sys.stderr, flush=True)
        results["2"] = point(2, cap=min(600, remaining() - 60))
    emit_partial()

    # 2. ADE20K-scale point (round-3's biggest claimed win: the C-major
    #    loss rewrite + bf16 loss storage at 150 fine classes)
    results["150class"] = point(2, cap=300, fine_classes=150)
    emit_partial()

    # 3. the remaining BASELINE configs — BEFORE the round-5 extras, so
    #    a cold-cache run that also ate a probe hang still lands all
    #    five judged configs inside the budget
    for cid, cap in ((1, 240), (3, 300), (4, 330), (5, 330)):
        results[str(cid)] = point(cid, cap=cap)
        emit_partial()

    # 3a. fed input pipeline (round-4 verdict ask #1): disk → decode →
    #     augment → device_put → real train step, plus per-backend
    #     host-only loader rates and H2D attribution
    results["pipeline"] = point(2, cap=330, pipeline=True)
    emit_partial()

    # 3b. config-3 repeatability (round-4 verdict ask #6: the ~11%
    #     cfg3 swing had no spread data): re-run the point twice in the
    #     same warm worker and report min/median/spread
    reps = [results["3"]] + [point(3, cap=180) for _ in range(2)]
    vals = sorted(
        r["images_per_sec_per_chip"]
        for r in reps
        if isinstance(r, dict) and "images_per_sec_per_chip" in r
    )
    if vals:
        import statistics

        results["cfg3_repeats"] = {
            "values": [round(v, 2) for v in vals],
            "min": round(vals[0], 2),
            # true median (vals[n//2] is the MAX for n=2 — a repeat that
            # errored out would have made the 'stable' figure the
            # optimistic extreme)
            "median": round(statistics.median(vals), 2),
            "spread_pct": round(100 * (vals[-1] - vals[0]) / vals[-1], 2),
        }
    emit_partial()

    if not args.no_sweep:
        # config-3 b8 operating point FIRST (round 5, decision 28): the
        # BASELINE-pinned b4 pays a per-image batch<8 layout tax
        # (sublane-padded batch dim un-fuses backbone BN into ~12 ms of
        # copies — profiled); b8 measured +75% img/s/chip at parity and
        # +103% with rmi fast — the most valuable sweep capture
        results["cfg3_b8"] = {
            "parity": point(3, cap=300, batch_override=8),
            "rmi_fast": point(3, cap=300, batch_override=8,
                              rmi_precision="fast"),
        }
        emit_partial()
        # config-4 b8 (same decision-28 tax: b2 40.1 ms/img, b4 44.1 —
        # a local minimum that hid the knee — b8 19.9 ms/img, +101%;
        # 57.7 img/s with rmi fast, no remat needed)
        results["cfg4_b8"] = {
            "parity": point(4, cap=330, batch_override=8),
            "rmi_fast": point(4, cap=330, batch_override=8,
                              rmi_precision="fast"),
        }
        emit_partial()
        # rmi_precision: fast — the bf16-Gram RMI mode (+17% on config 3
        # in DESIGN.md; default stays parity, decision 23)
        results["rmi_fast"] = {
            "3": point(3, cap=240, rmi_precision="fast"),
            "4": point(4, cap=300, rmi_precision="fast"),
        }
        emit_partial()
        # hiera_precision: parity — the oracle-exact mode (default is
        # now 'fast', DESIGN.md decision 23); captured so the cost of
        # exactness stays on the record
        results["hiera_parity"] = {"2": point(2, cap=240,
                                              hiera_precision="parity")}
        emit_partial()
        # operating-point sweep (round-2 verdict ask #1): the headline
        # config is conv-bound at b8; img/s/chip at the best legal batch
        # is the competitive number. OOM points record an error and the
        # remat fallback covers them.
        op = {"2": {"b8": dict(results["2"])}}
        for b in (16, 32):
            r = point(2, cap=240, batch_override=b)
            if "error" in r:
                r = point(2, cap=240, batch_override=b, remat=True)
            op["2"][f"b{b}" + ("_remat" if r.get("remat") else "")] = r
        r4 = point(4, cap=300, batch_override=4)
        if "error" in r4:
            r4 = point(4, cap=300, batch_override=4, remat=True)
        op["4"] = {"b2": dict(results["4"]),
                   "b4" + ("_remat" if r4.get("remat") else ""): r4}
        results["operating_points"] = op
        best_pt, best_key = None, None
        for key, r in op["2"].items():
            if "images_per_sec_per_chip" in r and (
                best_pt is None
                or r["images_per_sec_per_chip"]
                > best_pt["images_per_sec_per_chip"]
            ):
                best_pt, best_key = r, key
        if best_pt:
            results["best_operating_point"] = {
                "config": 2,
                "point": best_key,
                "batch": best_pt["batch"],
                "remat": best_pt["remat"],
                "images_per_sec_per_chip": best_pt["images_per_sec_per_chip"],
            }

    worker.kill()
    print(f"# total wall {time.monotonic() - t_start:.0f}s "
          f"(budget {budget:.0f}s)", file=sys.stderr, flush=True)
    out = _headline_json(results, "2")
    _emit(out, final=True)
    if out["metric"] == "bench_error":
        sys.exit(1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--config",
        type=int,
        default=None,
        choices=sorted(BENCH_CONFIGS),
        help="run ONE config in-process; default orchestrates all 5 "
        "BASELINE configs in watchdogged subprocesses (headline metric "
        "= config 2, every config in `details`)",
    )
    p.add_argument(
        "--worker",
        action="store_true",
        help="(internal) persistent worker: read JSON point specs from "
        "stdin (one per line), print a {'point_result': ...} line per "
        "spec; the orchestrator's child mode",
    )
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument(
        "--rmi-precision",
        type=str,
        default=None,
        choices=("parity", "fast"),
        help="training.rmi_precision for 3-level configs (bf16 Gram "
        "mode); default = framework default (parity)",
    )
    p.add_argument(
        "--hiera-precision",
        type=str,
        default=None,
        choices=("parity", "fast"),
        help="training.hiera_precision — bf16 storage for the upsampled "
        "loss-side logits; default = framework default (fast, DESIGN.md "
        "decision 23)",
    )
    p.add_argument(
        "--steps-per-dispatch",
        type=int,
        default=None,
        help="training.steps_per_dispatch for the timed loop; default "
        "per config (10 for the dispatch-bound config 1, else 1)",
    )
    p.add_argument(
        "--backbone",
        type=str,
        default=None,
        help="override model.backbone (resnet|convnext|hrnet|unet|mit) for "
        "exploratory runs; the 5 BASELINE configs use resnet by default",
    )
    p.add_argument(
        "--backbone-variant",
        type=str,
        default=None,
        help="backbone_options.variant for the override (e.g. b2, w32, tiny)",
    )
    p.add_argument(
        "--head",
        type=str,
        default=None,
        help="override model.head (sep_aspp_contrast|aspp|segformer_mlp)",
    )
    p.add_argument(
        "--batch",
        type=int,
        default=None,
        help="override the config's per-chip batch size (exploratory "
        "scaling runs; the BASELINE configs pin their own)",
    )
    p.add_argument(
        "--fine-classes",
        type=int,
        default=None,
        help="replace the config's class hierarchy with a generated "
        "N-fine-class one (groups of 5 per coarse class) — ADE20K-scale "
        "(150) engages the gather target-LUT path statically "
        "(losses/hiera.py LUT_UNROLL_MAX)",
    )
    p.add_argument(
        "--depthwise-backend",
        type=str,
        default="xla",
        choices=("xla", "pallas"),
        help="model.depthwise_backend — 'pallas' measured SLOWER "
        "end-to-end on both training and serving configs (see "
        "ops/pallas/depthwise.py); flag kept for re-measurement",
    )
    p.add_argument(
        "--argmax-backend",
        type=str,
        default=None,
        choices=("xla", "pallas"),
        help="model.argmax_backend — inference decode path; 'pallas' "
        "(fused 4x-upsample+argmax) measured SLOWER end-to-end in both "
        "dtypes (ops/pallas/upsample_argmax.py); flag kept for "
        "re-measurement",
    )
    p.add_argument(
        "--stem",
        type=str,
        default=None,
        choices=("conv7", "s2d"),
        help="model.stem for resnet backbones — 's2d' is the MLPerf-style "
        "space-to-depth stem (same math; see models/resnet.py StemConv); "
        "re-measurement knob for DESIGN.md decision tracking",
    )
    p.add_argument(
        "--remat",
        action="store_true",
        help="model.remat (backbone gradient checkpointing) for the "
        "train configs — measures the throughput cost of the memory win",
    )
    p.add_argument(
        "--compiler-options",
        type=str,
        default=None,
        help="comma-separated XLA option overrides for the jitted step, "
        "e.g. xla_tpu_scoped_vmem_limit_kib=65536,"
        "xla_tpu_enable_latency_hiding_scheduler=true — passed through "
        "training.compiler_options (PJRT compile-call overrides; local "
        "XLA_FLAGS cannot carry tpu-only flags on this relay runtime)",
    )
    p.add_argument(
        "--pallas-fused-loss",
        action="store_true",
        help="training.pallas_fused_loss — the fused upsample+BCE+CE "
        "kernel (ops/pallas/hiera2_fused.py). Loses to XLA at C~13 "
        "(DESIGN.md); flag kept for many-class re-measurement",
    )
    p.add_argument(
        "--pipeline",
        action="store_true",
        help="run ONLY the fed-input-pipeline benchmark in-process "
        "(file dataset → loader → device_put → train step, plus host-only "
        "loader rates per backend); the default all-config run includes "
        "it as details.pipeline",
    )
    p.add_argument(
        "--dry-run", action="store_true", help="tiny shapes, CPU smoke run"
    )
    p.add_argument(
        "--no-sweep",
        action="store_true",
        help="skip the extras an all-config run adds by default: the "
        "rmi_precision:fast / hiera_precision:parity captures and the "
        "batch/remat operating-point sweep",
    )
    p.add_argument("--all", action="store_true", help="(default) run every config")
    p.add_argument(
        "--platform",
        type=str,
        default=None,
        choices=("cpu", "tpu", "axon"),
        help="force a jax platform; --dry-run defaults to cpu",
    )
    args = p.parse_args()

    _set_cache_env()

    if args.worker:
        global _WORKER_MODE
        _WORKER_MODE = True
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            res = bench_point(json.loads(line))
            print(json.dumps({"point_result": res}), flush=True)
        return

    if args.dry_run:
        if args.platform is None:
            args.platform = "cpu"
        args.steps = min(args.steps, 3)
        args.dtype = "float32"
        # `--dry-run --all` exercises the ORCHESTRATOR itself (subprocess
        # watchdogs, early headline emit, budget) on tiny CPU shapes
        if args.config is None and not args.all:
            args.config = 2

    base_spec = dict(
        steps=args.steps,
        dtype=args.dtype,
        stem=args.stem,
        rmi_precision=args.rmi_precision,
        hiera_precision=args.hiera_precision,
        steps_per_dispatch=args.steps_per_dispatch,
        backbone=args.backbone,
        backbone_variant=args.backbone_variant,
        head=args.head,
        batch_override=args.batch,
        fine_classes=args.fine_classes,
        remat=args.remat,
        depthwise_backend=args.depthwise_backend,
        argmax_backend=args.argmax_backend,
        compiler_options=parse_compiler_options(args.compiler_options),
        pallas_fused_loss=args.pallas_fused_loss,
        platform=args.platform,
        dry=args.dry_run,
    )

    if args.pipeline:
        if args.platform:
            import jax

            jax.config.update("jax_platforms", args.platform)
        res = pipeline_bench(dict(base_spec))
        fed = res.get("fed_cache_devflip")
        val = fed.get("images_per_sec", 0) if isinstance(fed, dict) else 0
        _emit(
            {
                "metric": "pipeline_fed_images_per_sec_per_chip",
                "value": val,
                "unit": "images/sec/chip",
                "vs_baseline": round(val / A100_REF_IMG_S, 3),
                "details": res,
            },
            final=True,
        )
        return

    if args.config is not None and not args.all:
        # single config: in-process (no subprocess indirection — this is
        # the interactive/exploratory mode)
        cid = args.config
        results = {str(cid): bench_point(dict(base_spec, cid=cid))}
        out = _headline_json(results, str(cid))
        _emit(out, final=True)
        if out["metric"] == "bench_error":
            sys.exit(1)
        return

    orchestrate(args, base_spec)


if __name__ == "__main__":
    main()
