#!/usr/bin/env python
"""XLA/libtpu flag sweep over the conv-bound train-step benchmark.

Round-2 verdict ask #2: the one untried perf lever in the decision log
was compiler-flag tuning. This tool re-times `bench.py --config N` under
a small matrix of `XLA_FLAGS` combinations (each in a FRESH subprocess —
XLA flags are read once at backend init, they cannot be swept in-process)
and prints a ranked table plus a JSON artifact, so the adopt/reject
decision in docs/DESIGN.md is backed by numbers.

Usage:
  python tools/xla_sweep.py                 # configs 2 and 4 on the chip
  python tools/xla_sweep.py --configs 2     # headline only
  python tools/xla_sweep.py --dry-run       # CPU smoke test of the harness
  python tools/xla_sweep.py --out sweep.json

Unknown/unsupported flags make the subprocess fail; the combo is recorded
as an error row rather than aborting the sweep (libtpu versions differ in
which xla_tpu_* flags they accept).

Flag sources: public MaxText/JAX performance guides. The matrix leans on
single-chip levers (scoped vmem limit controls how much VMEM fusions may
use; the latency-hiding scheduler reorders async ops) — the collective
flags only matter for the data-parallel config 4 when it spans chips.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> XLA_FLAGS value (space-joined). Baseline first: its ms/step is
# the denominator for every speedup column.
COMBOS: list[tuple[str, str]] = [
    ("baseline", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("vmem64m+lhs",
     "--xla_tpu_scoped_vmem_limit_kib=65536 "
     "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("rng_unsafe", "--xla_tpu_spmd_rng_bit_generator_unsafe=true"),
    ("dp_ar_opt",
     "--xla_tpu_enable_data_parallel_all_reduce_opt=true "
     "--xla_tpu_data_parallel_opt_different_sized_ops=true"),
    ("async_coll",
     "--xla_tpu_enable_async_collective_fusion=true "
     "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true "
     "--xla_tpu_overlap_compute_collective_tc=true "
     "--xla_enable_async_all_gather=true"),
]


def run_combo(name: str, flags: str, cid: int, steps: int,
              dry_run: bool) -> dict:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--config", str(cid), "--steps", str(steps)]
    if dry_run:
        cmd.append("--dry-run")
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=1800)
    wall = time.time() - t0
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
        return dict(name=name, flags=flags, error=" | ".join(tail),
                    wall_s=round(wall, 1))
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    det = rec["details"][str(cid)]
    return dict(
        name=name,
        flags=flags,
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
        combos = combos[:2]

    results: dict[str, list[dict]] = {}
    for cid in [int(c) for c in args.configs.split(",")]:
        rows = []
        base_ms = None
        for name, flags in combos:
            row = run_combo(name, flags, cid, args.steps, args.dry_run)
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
                     else f"ERROR {row['error'][:120]}"),
                  file=sys.stderr, flush=True)
            rows.append(row)
        results[str(cid)] = rows

    # markdown table for DESIGN.md
    for cid, rows in results.items():
        print(f"\n### XLA flag sweep — bench config {cid}\n")
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
