#!/usr/bin/env python
"""XLA compiler-option sweep over the conv-bound train-step benchmark.

Round-2 verdict ask #2: the one untried perf lever in the decision log
was compiler-flag tuning. This tool re-times `bench.py --config N` under
a small matrix of per-program XLA option overrides and prints a ranked
table plus a JSON artifact, so the adopt/reject decision in
docs/DESIGN.md is backed by numbers.

Why compiler options, not XLA_FLAGS: on this remote-dispatch runtime the
LOCAL jaxlib parses XLA_FLAGS and fatally rejects tpu-only flags
("Unknown flag in XLA_FLAGS: --xla_tpu_..." — measured round 3), while
the compilation itself happens server-side. Per-jit `compiler_options`
(`training.compiler_options` / `bench.py --compiler-options`) ride the
PJRT compile call to the XLA that actually compiles the program.

Usage:
  python tools/xla_sweep.py                 # configs 2 and 4 on the chip
  python tools/xla_sweep.py --configs 2     # headline only
  python tools/xla_sweep.py --dry-run       # CPU smoke test of the harness
  python tools/xla_sweep.py --out sweep.json

Options the server-side XLA rejects make the subprocess fail; the combo
is recorded as an error row rather than aborting the sweep (TPU runtime
versions differ in which xla_tpu_* options they accept).

Each combo runs in a FRESH subprocess: compiled programs are cached per
(program, options), and a clean process keeps one combo's live buffers
from skewing the next combo's HBM layout.

Option sources: public MaxText/JAX performance guides. The matrix leans
on single-chip levers (scoped vmem limit controls how much VMEM fusions
may use; the latency-hiding scheduler reorders async ops) — the
collective options only matter when a config spans chips.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> --compiler-options spec ("k=v,k=v"). Baseline first: its
# ms/step is the denominator for every speedup column.
COMBOS: list[tuple[str, str]] = [
    ("baseline", ""),
    ("vmem32m", "xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs", "xla_tpu_enable_latency_hiding_scheduler=true"),
    ("vmem64m+lhs",
     "xla_tpu_scoped_vmem_limit_kib=65536,"
     "xla_tpu_enable_latency_hiding_scheduler=true"),
    ("rng_unsafe", "xla_tpu_spmd_rng_bit_generator_unsafe=true"),
    ("dp_ar_opt",
     "xla_tpu_enable_data_parallel_all_reduce_opt=true,"
     "xla_tpu_data_parallel_opt_different_sized_ops=true"),
    ("async_coll",
     "xla_tpu_enable_async_collective_fusion=true,"
     "xla_tpu_enable_async_collective_fusion_fuse_all_gather=true,"
     "xla_tpu_overlap_compute_collective_tc=true,"
     "xla_enable_async_all_gather=true"),
]


def run_combo(name: str, opts: str, cid: int, steps: int,
              dry_run: bool) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--config", str(cid), "--steps", str(steps)]
    if opts:
        cmd += ["--compiler-options", opts]
    if dry_run:
        cmd.append("--dry-run")
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=REPO, timeout=1800)
    wall = time.time() - t0
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
        return dict(name=name, compiler_options=opts,
                    error=" | ".join(tail), wall_s=round(wall, 1))
    lines = proc.stdout.strip().splitlines()
    # details moved off the compact final line (bench _emit): read the
    # '#'-prefixed details line instead
    det_lines = [l for l in lines if l.startswith("# details: ")]
    if det_lines:
        det = json.loads(det_lines[-1][len("# details: "):])[str(cid)]
    else:  # pre-round-5 bench fallback
        det = json.loads(lines[-1])["details"][str(cid)]
    if "error" in det:
        return dict(name=name, compiler_options=opts, error=det["error"],
                    wall_s=round(wall, 1))
    return dict(
        name=name,
        compiler_options=opts,
        ms_per_step=round(det["seconds_per_step"] * 1e3, 3),
        images_per_sec_per_chip=round(det["images_per_sec_per_chip"], 2),
        wall_s=round(wall, 1),
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", type=str, default="2,4",
                   help="comma-separated bench config ids (default 2,4)")
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--only", type=str, default=None,
                   help="comma-separated combo names to run (default all)")
    p.add_argument("--dry-run", action="store_true",
                   help="CPU smoke test of the sweep harness itself")
    p.add_argument("--out", type=str, default=None,
                   help="write the full results JSON here")
    args = p.parse_args()

    combos = COMBOS
    if args.only:
        wanted = set(args.only.split(","))
        combos = [c for c in COMBOS if c[0] in wanted]
    if args.dry_run:
        # CPU rejects xla_tpu_* compile options (INVALID_ARGUMENT, by
        # design recorded as an error row); smoke-test the pass-through
        # with a generic option every backend accepts instead.
        combos = [combos[0],
                  ("optlevel1", "xla_backend_optimization_level=1")]

    results: dict[str, list[dict]] = {}
    for cid in [int(c) for c in args.configs.split(",")]:
        rows = []
        base_ms = None
        for name, opts in combos:
            row = run_combo(name, opts, cid, args.steps, args.dry_run)
            if "ms_per_step" in row:
                if name == "baseline":
                    base_ms = row["ms_per_step"]
                if base_ms:
                    row["speedup_vs_baseline"] = round(
                        base_ms / row["ms_per_step"], 4)
            print(f"# config {cid} {name:>12}: "
                  + (f"{row['ms_per_step']:.2f} ms/step "
                     f"({row.get('speedup_vs_baseline', 1.0):.3f}x)"
                     if "ms_per_step" in row
                     else f"ERROR {row['error'][:160]}"),
                  file=sys.stderr, flush=True)
            rows.append(row)
        results[str(cid)] = rows

    # markdown table for DESIGN.md
    for cid, rows in results.items():
        print(f"\n### XLA option sweep — bench config {cid}\n")
        print("| combo | ms/step | img/s/chip | vs baseline |")
        print("|---|---|---|---|")
        for r in rows:
            if "error" in r:
                print(f"| {r['name']} | error | — | — |")
            else:
                print(f"| {r['name']} | {r['ms_per_step']:.2f} | "
                      f"{r['images_per_sec_per_chip']:.1f} | "
                      f"{r.get('speedup_vs_baseline', 1.0):.3f}x |")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
