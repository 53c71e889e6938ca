#!/usr/bin/env python
"""Capture a device trace of one bench config's train step.

Builds the same trainer as `bench.py --config N` (including
--fine-classes / --rmi-precision / --batch overrides), warms up, traces
K steps with jax.profiler, and prints the per-category aggregation via
tools/parse_trace.py. The trace file (vm.trace.json.gz) lands under
--out for deeper --by source/op digs.

Usage (on the chip):
  python tools/profile_bench.py --config 2 --fine-classes 150 \
      --steps 10 --out /tmp/prof150
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=2)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--fine-classes", type=int, default=None)
    ap.add_argument("--rmi-precision", default="parity")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/seghiero_prof")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--by", default="category",
                    choices=("category", "source", "op"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build

    trainer, batch, spec, global_batch = build(
        args.config, args.steps, args.dtype, args.rmi_precision,
        batch_override=args.batch, fine_classes=args.fine_classes,
    )
    state = trainer.state
    epoch = jnp.asarray(0)
    for i in range(3):
        state, m = trainer._train_step(state, batch, epoch)
        print(f"# warmup {i}: loss={float(jax.device_get(m['loss'])):.4f}",
              file=sys.stderr, flush=True)

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, m = trainer._train_step(state, batch, epoch)
    jax.device_get(m["loss"])
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print("no trace file found under", args.out, file=sys.stderr)
        return 1
    trace = max(traces, key=os.path.getmtime)
    print(f"# trace: {trace}", file=sys.stderr)
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "parse_trace.py"),
         trace, "--by", args.by, "--top", str(args.top),
         "--steps", str(args.steps)]
    )


if __name__ == "__main__":
    raise SystemExit(main())
