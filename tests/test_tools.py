"""The tools/ scripts stay runnable: summarize, memstats, parse_trace.

Each is exercised as a subprocess exactly as a user would run it (tiny
shapes, CPU platform) and its JSON/stdout contract is asserted — these
scripts are the evidence path for memory/FLOPs claims, so silent rot
would be worse than slow tests.
"""

import gzip
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.fast

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )


def test_summarize_model_card():
    r = _run(["tools/summarize.py", "--depth", "18", "--hw", "64",
              "--batch", "1", "--json"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["params_by_module"].keys() == {"aux_head", "backbone", "head"}
    assert out["params"] == sum(out["params_by_module"].values())
    # one train step ≈ 3 forwards; at b1 it must exceed the b1 forward
    assert out["train_step_flops"] > out["forward_flops_b1"] > 0
    assert out["train_step_temp_bytes"] > 0


def test_memstats_fsdp_shrinks_arguments():
    """The sharding lever is visible on CPU: per-device argument bytes
    (params + opt state) drop under fsdp on an 8-device virtual mesh."""
    base = _run(["tools/memstats.py", "--hw", "64", "--batch", "8",
                 "--depth", "18", "--devices", "8"])
    fsdp = _run(["tools/memstats.py", "--hw", "64", "--batch", "8",
                 "--depth", "18", "--devices", "8", "--fsdp"])
    assert base.returncode == 0, base.stderr[-2000:]
    assert fsdp.returncode == 0, fsdp.stderr[-2000:]
    b = json.loads(base.stdout.strip().splitlines()[-1])
    f = json.loads(fsdp.stdout.strip().splitlines()[-1])
    assert f["argument_bytes"] < 0.5 * b["argument_bytes"], (b, f)


def test_parse_trace_aggregation(tmp_path):
    events = [
        # two conv ops (one per step), one elementwise, one host event
        {"ph": "X", "dur": 1000.0, "name": "fusion.1",
         "args": {"hlo_category": "convolution", "source": "m.py:1",
                  "model_flops": 2e9, "raw_bytes_accessed": 1e6}},
        {"ph": "X", "dur": 1000.0, "name": "fusion.1",
         "args": {"hlo_category": "convolution", "source": "m.py:1",
                  "model_flops": 2e9, "raw_bytes_accessed": 1e6}},
        {"ph": "X", "dur": 500.0, "name": "add.2",
         "args": {"hlo_category": "loop fusion", "source": "m.py:2"}},
        {"ph": "X", "dur": 99999.0, "name": "host_thing", "args": {}},
    ]
    path = tmp_path / "t.json.gz"
    with gzip.open(path, "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    r = _run(["tools/parse_trace.py", str(path), "--by", "category",
              "--steps", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.splitlines()
    conv = next(line for line in lines if line.startswith("convolution"))
    cols = conv.split()
    # 2 ops × 1000 us over 2 steps → 1.000 ms/step, 80% of device time,
    # 4 GFLOP / 2 ms = 2.0 TF/s
    assert cols[-5] == "1.000" and cols[-3] == "2.0"
    assert "host_thing" not in r.stdout  # non-device events excluded
    total = next(line for line in lines if line.startswith("TOTAL"))
    assert total.split()[-1] == "1.250"
