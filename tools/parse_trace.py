#!/usr/bin/env python
"""Aggregate a jax.profiler device trace (vm.trace.json.gz).

Usage:
  python tools/parse_trace.py <trace.json.gz> [--by source|category|op]
                              [--top N] [--steps K]

Sums device-op durations grouped by HLO category / source file:line /
op name, and reports achieved FLOP/s and bytes/s per group from the
`model_flops` / `raw_bytes_accessed` event args. `--steps K` divides
totals by K to get per-step figures when the trace spans K steps.

The relay's trace events carry: hlo_category, source, model_flops,
raw_bytes_accessed (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import gzip
import json
import sys
from collections import defaultdict


def load_events(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    if isinstance(data, list):  # Chrome trace "JSON Array Format"
        return data
    return data.get("traceEvents", [])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--by", default="category",
                    choices=("category", "source", "op"))
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--grep", default=None,
                    help="only events whose name/source contains this")
    args = ap.parse_args()

    groups = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # us, flops, bytes, n
    total_us = 0.0
    for ev in load_events(args.trace):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        ea = ev.get("args") or {}
        cat = ea.get("hlo_category")
        if cat is None:
            continue  # not a device op
        name = ev.get("name", "")
        src = ea.get("source", "")
        if args.grep and args.grep not in name and args.grep not in src:
            continue
        key = {"category": cat, "source": src or "<none>", "op": name}[args.by]
        g = groups[key]
        g[0] += ev["dur"]
        g[1] += float(ea.get("model_flops", 0) or 0)
        g[2] += float(ea.get("raw_bytes_accessed", 0) or 0)
        g[3] += 1
        total_us += ev["dur"]

    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])[: args.top]
    k = max(args.steps, 1)
    print(f"{'group':60s} {'ms/step':>9s} {'%':>5s} {'TF/s':>7s} {'GB/s':>7s} {'n':>6s}")
    for key, (us, fl, by, n) in rows:
        ms = us / 1e3 / k
        tfs = fl / (us * 1e-6) / 1e12 if us else 0.0
        gbs = by / (us * 1e-6) / 1e9 if us else 0.0
        pct = 100.0 * us / total_us if total_us else 0.0
        print(f"{key[:60]:60s} {ms:9.3f} {pct:5.1f} {tfs:7.1f} {gbs:7.1f} {n // k:6d}")
    print(f"{'TOTAL device op time':60s} {total_us / 1e3 / k:9.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
