"""bench.py and tools/xla_sweep.py stay runnable (CPU dry-run).

bench.py is the driver's artifact generator (BENCH_r{N}.json) — silent
rot there loses a round's headline number, so the JSON contract is
asserted the way the driver consumes it. Full tier only: each subprocess
pays the heavy import cost on this box's single core.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def test_bench_dry_run_contract():
    r = _run(["bench.py", "--dry-run", "--config", "2"])
    assert r.returncode == 0, (r.stderr or r.stdout)[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["unit"] == "images/sec/chip"
    det = rec["details"]["2"]
    assert det["images_per_sec_per_chip"] > 0
    assert det["seconds_per_step"] > 0
    # the driver divides by BASELINE; the field must exist and be finite
    assert rec["vs_baseline"] > 0


def test_bench_dry_run_fine_classes_gather_path():
    """--fine-classes 150 exceeds LUT_UNROLL_MAX: the generated
    hierarchy must build, trace via the gather LUT path, and run."""
    r = _run(["bench.py", "--dry-run", "--config", "2",
              "--fine-classes", "150"])
    assert r.returncode == 0, (r.stderr or r.stdout)[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["details"]["2"]["images_per_sec_per_chip"] > 0


def test_xla_sweep_dry_run():
    """The sweep harness itself: two combos in fresh subprocesses, ranked
    table + JSON artifact (the on-chip results live in docs/DESIGN.md)."""
    r = _run(["tools/xla_sweep.py", "--dry-run", "--configs", "2",
              "--steps", "2"])
    assert r.returncode == 0, (r.stderr or r.stdout)[-2000:]
    sweep = json.loads(r.stdout.strip().splitlines()[-1])["sweep"]
    rows = sweep["2"]
    assert [row["name"] for row in rows] == ["baseline", "optlevel1"]
    for row in rows:
        assert "ms_per_step" in row, row
    assert rows[0]["speedup_vs_baseline"] == 1.0
