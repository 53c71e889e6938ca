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
train-step compute throughput per chip (input pipeline excluded).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

A100_REF_IMG_S = 40.0  # docs/BASELINE_ASSUMPTIONS.md

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


def build(
    cfg_id: int,
    steps: int,
    dtype: str,
    rmi_precision: str = "parity",
    steps_per_dispatch: int = 1,
    backbone: str = None,
    backbone_variant: str = None,
    head: str = None,
    remat: bool = False,
    depthwise_backend: str = "xla",
    batch_override: int = None,
    fine_classes: int = None,
    compiler_options: dict = None,
    pallas_fused_loss: bool = False,
    hiera_precision: str = "parity",
):
    import jax
    import jax.numpy as jnp

    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    spec = BENCH_CONFIGS[cfg_id]
    n_dev = len(jax.devices()) if spec.get("all_devices") else 1
    batch = (batch_override or spec["batch"]) * n_dev
    if fine_classes:
        classes = make_classes(fine_classes, levels=spec["levels"])
    else:
        classes = CLASSES_3L if spec["levels"] == 3 else CLASSES_2L
    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": batch},
            "classes": classes,
            "model": {
                "depth": spec["depth"],
                "dtype": dtype,
                "remat": remat,
                "depthwise_backend": depthwise_backend,
                **({"backbone": backbone} if backbone else {}),
                **(
                    {"backbone_options": {"variant": backbone_variant}}
                    if backbone_variant
                    else {}
                ),
                **({"head": head} if head else {}),
            },
            "training": {
                "epochs": 1,
                "batch_size": batch,
                "lr": 0.001,
                "log_every": 10**9,
                "mesh": {"data": n_dev},
                "rmi_precision": rmi_precision,
                "steps_per_dispatch": steps_per_dispatch,
                **(
                    {"compiler_options": compiler_options}
                    if compiler_options
                    else {}
                ),
                **({"pallas_fused_loss": True} if pallas_fused_loss else {}),
                "hiera_precision": hiera_precision,
            },
            "transform": {"resize": [spec["hw"], spec["hw"]], "hflip_prob": 0.5},
            "output": {"checkpoint_dir": "/tmp/bench_ckpt", "project_name": "bench"},
        }
    )
    trainer = Trainer(cfg, verbose=False)
    batch_data = next(iter(trainer.train_loader))
    return trainer, batch_data, spec, batch


def run_train_bench(trainer, batch, steps: int, min_time_s: float = 1.0):
    """Returns (elapsed_seconds, final_loss, steps_actually_run).

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
        for i in range(2):
            state, m = trainer._train_superstep(state, stacked, epoch)
            print(
                f"# warmup dispatch {i}: loss={float(jax.device_get(m['loss'])):.4f}",
                file=sys.stderr, flush=True,
            )

        def timed(n_calls):
            nonlocal state, m
            t0 = time.perf_counter()
            for _ in range(n_calls):
                state, m = trainer._train_superstep(state, stacked, epoch)
            loss = float(jax.device_get(m["loss"]))
            return time.perf_counter() - t0, loss

        calls = max(1, -(-steps // k))  # ceil
        dt, loss = timed(calls)
        if dt < min_time_s:
            calls = min(-(-1024 // k), max(calls + 1, int(calls * 1.2 * min_time_s / dt)))
            print(f"# window {dt:.2f}s < {min_time_s}s; re-timing over "
                  f"{calls} dispatches", file=sys.stderr, flush=True)
            dt, loss = timed(calls)
        return dt, loss, calls * k
    for i in range(3):
        state, m = trainer._train_step(state, batch, epoch)
        print(f"# warmup step {i}: loss={float(jax.device_get(m['loss'])):.4f}",
              file=sys.stderr, flush=True)

    def timed(n):
        nonlocal state, m
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = trainer._train_step(state, batch, epoch)
        loss = float(jax.device_get(m["loss"]))
        return time.perf_counter() - t0, loss

    dt, loss = timed(steps)
    if dt < min_time_s:
        steps = min(1024, max(steps + 1, int(steps * 1.2 * min_time_s / dt)))
        print(f"# window {dt:.2f}s < {min_time_s}s; re-timing over "
              f"{steps} steps", file=sys.stderr, flush=True)
        dt, loss = timed(steps)
    return dt, loss, steps


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
        preds, _ = pred._predict(variables, images, out_hw)
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
    for _ in range(2):
        images, preds = chained(variables, images)
    jax.device_get(preds["fine"][0, 0, 0])

    def timed(n_calls):
        nonlocal images, preds
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
    return dt, 0.0, calls * per_call


def parse_compiler_options(spec: str):
    """'k=v,k2=v2' -> dict; bare keys default to 'true'."""
    if not spec:
        return None
    out = {}
    for item in spec.split(","):
        k, _, v = item.strip().partition("=")
        out[k] = v if v else "true"
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--config",
        type=int,
        default=None,
        choices=sorted(BENCH_CONFIGS),
        help="run ONE config; default runs all 5 BASELINE configs "
        "(headline metric = config 2, every config in `details`)",
    )
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument(
        "--rmi-precision",
        type=str,
        default="parity",
        choices=("parity", "fast"),
        help="training.rmi_precision for 3-level configs (bf16 Gram mode)",
    )
    p.add_argument(
        "--hiera-precision",
        type=str,
        default="parity",
        choices=("parity", "fast"),
        help="training.hiera_precision — bf16 storage for the upsampled "
        "loss-side logits (math stays f32; DESIGN.md decision 21)",
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
        "--dry-run", action="store_true", help="tiny shapes, CPU smoke run"
    )
    p.add_argument(
        "--no-sweep",
        action="store_true",
        help="skip the extras an all-config run adds by default: the "
        "rmi_precision:fast capture (configs 3/4) and the batch/remat "
        "operating-point sweep (configs 2/4)",
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

    if args.dry_run:
        cid = args.config if args.config is not None else 2
        args.config = cid
        BENCH_CONFIGS[cid] = dict(
            BENCH_CONFIGS[cid], hw=64, batch=2, all_devices=False
        )
        args.steps = min(args.steps, 3)
        args.dtype = "float32"
        if args.platform is None:
            args.platform = "cpu"

    import jax

    if args.platform:
        # env JAX_PLATFORMS alone is not enough where a sitecustomize
        # pins a platform plugin; set it through the config API before
        # the first backend initializes
        jax.config.update("jax_platforms", args.platform)

    run_all = args.all or args.config is None
    cfg_ids = sorted(BENCH_CONFIGS) if run_all else [args.config]
    # config 1's step (r18 @ 256²/b2, ~4 ms device time) is smaller than
    # one dispatch round-trip on remote-relay runtimes — fold steps there.
    # Config 5 stays per-call: it is already device-bound (26.3 ms/step
    # vs 25.1 ms device profile), and a scan-folded variant MEASURED
    # SLOWER (34.9 ms/step) — the carry dependency serializes buffer
    # reuse the per-call pipeline gets for free.
    spd_default = {1: 10}

    def bench_one(cid, batch_override=None, remat=None, rmi_precision=None,
                  hiera_precision=None):
        """One (config, operating point) measurement → result dict; OOM
        (or any build/run failure) is recorded, not fatal — the driver
        artifact must survive an over-ambitious sweep point."""
        spd = (
            args.steps_per_dispatch
            if args.steps_per_dispatch is not None
            else spd_default.get(cid, 1)
        )
        is_train = BENCH_CONFIGS[cid]["mode"] == "train"
        use_remat = args.remat if remat is None else remat
        try:
            trainer, batch, spec, global_batch = build(
                cid,
                args.steps,
                args.dtype,
                rmi_precision or args.rmi_precision,
                spd if is_train else 1,
                backbone=args.backbone,
                backbone_variant=args.backbone_variant,
                head=args.head,
                remat=use_remat,
                depthwise_backend=args.depthwise_backend,
                batch_override=batch_override or args.batch,
                fine_classes=args.fine_classes,
                compiler_options=parse_compiler_options(args.compiler_options),
                pallas_fused_loss=args.pallas_fused_loss,
                hiera_precision=hiera_precision or args.hiera_precision,
            )
            n_chips = trainer.mesh.devices.size
            if spec["mode"] == "train":
                dt, loss, n_steps = run_train_bench(trainer, batch, args.steps)
            else:
                dt, loss, n_steps = run_infer_bench(
                    trainer, batch, args.steps, spd
                )
        except Exception as e:  # typically RESOURCE_EXHAUSTED at big batch
            print(f"# config {cid} point failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            return dict(error=f"{type(e).__name__}: {e}",
                        batch=batch_override, remat=use_remat)
        img_s = global_batch * n_steps / dt
        res = dict(
            images_per_sec=img_s,
            images_per_sec_per_chip=img_s / n_chips,
            seconds_per_step=dt / n_steps,
            chips=n_chips,
            batch=global_batch,
            steps_per_dispatch=spd,
            final_loss=loss,
            remat=use_remat,
        )
        print(
            f"# config {cid}"
            + (f" b{batch_override}" if batch_override else "")
            + (" remat" if use_remat else "")
            + (f" rmi={rmi_precision}" if rmi_precision else "")
            + (f" hiera={hiera_precision}" if hiera_precision else "")
            + f": {img_s:.2f} img/s total, "
            f"{img_s / n_chips:.2f} img/s/chip, {dt / n_steps * 1e3:.1f} ms/step",
            file=sys.stderr,
        )
        # release this config's params/opt-state/batch before the next
        # build — configs 4/5 are r101 at 769²/1024² and HBM is finite
        del trainer, batch
        import gc

        gc.collect()
        return res

    results = {}
    for cid in cfg_ids:
        results[str(cid)] = bench_one(cid)

    do_sweep = run_all and not args.no_sweep and not args.dry_run
    if do_sweep:
        # rmi_precision: fast — the bf16-Gram RMI mode (+17% on config 3
        # in DESIGN.md, driver-captured here per round-2 verdict ask #3)
        results["rmi_fast"] = {
            str(cid): bench_one(cid, rmi_precision="fast") for cid in (3, 4)
        }
        # hiera_precision: fast — bf16 storage for the upsampled
        # loss-side logits (DESIGN.md decision 21), captured on the
        # headline config
        results["hiera_fast"] = {"2": bench_one(2, hiera_precision="fast")}
        # operating-point sweep (round-2 verdict ask #1): the headline
        # config is conv-bound at b8; img/s/chip at the best legal batch
        # is the competitive number. OOM points record an error and the
        # remat fallback covers them.
        op = {"2": {"b8": dict(results["2"])}}
        for b in (16, 32):
            r = bench_one(2, batch_override=b)
            if "error" in r:
                r = bench_one(2, batch_override=b, remat=True)
            op["2"][f"b{b}" + ("_remat" if r.get("remat") else "")] = r
        r4 = bench_one(4, batch_override=4)
        if "error" in r4:
            r4 = bench_one(4, batch_override=4, remat=True)
        op["4"] = {"b2": dict(results["4"]),
                   "b4" + ("_remat" if r4.get("remat") else ""): r4}
        results["operating_points"] = op
        best_pt, best_key = None, None
        for key, r in op["2"].items():
            if "error" not in r and (
                best_pt is None
                or r["images_per_sec_per_chip"]
                > best_pt["images_per_sec_per_chip"]
            ):
                best_pt, best_key = r, key
        results["best_operating_point"] = {
            "config": 2,
            "point": best_key,
            "batch": best_pt["batch"],
            "remat": best_pt["remat"],
            "images_per_sec_per_chip": best_pt["images_per_sec_per_chip"],
        }

    headline_id = "2" if "2" in results else str(cfg_ids[0])
    headline = results[headline_id]
    if "images_per_sec_per_chip" not in headline:
        print(json.dumps({"metric": "bench_error", "value": 0,
                          "unit": "images/sec/chip", "vs_baseline": 0,
                          "details": results}))
        sys.exit(1)
    value = headline["images_per_sec_per_chip"]
    spec = BENCH_CONFIGS[int(headline_id)]
    name = (
        "train_images_per_sec_per_chip_r50_2level_512"
        if headline_id == "2"
        else f"{spec['mode']}_images_per_sec_per_chip_r{spec['depth']}_"
        f"{spec['levels']}level_{spec['hw']}"
    )
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(value, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / A100_REF_IMG_S, 3),
                "details": results,
            }
        )
    )


if __name__ == "__main__":
    main()
