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
    lines = r.stdout.strip().splitlines()
    # the FINAL line is the compact 4-key dict (round-4 artifact had
    # parsed:null because details overflowed the driver's tail window)
    rec = json.loads(lines[-1])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    # the driver divides by BASELINE; the field must exist and be finite
    assert rec["vs_baseline"] > 0
    # full details ride a '#'-prefixed stdout line + bench_details.json
    det_lines = [l for l in lines if l.startswith("# details: ")]
    assert det_lines, lines
    det = json.loads(det_lines[-1][len("# details: "):])["2"]
    assert det["images_per_sec_per_chip"] > 0
    assert det["seconds_per_step"] > 0
    with open(os.path.join(REPO, "bench_details.json")) as f:
        assert json.load(f)["details"]["2"]["images_per_sec_per_chip"] > 0


def test_bench_dry_run_fine_classes_gather_path():
    """--fine-classes 150 exceeds LUT_UNROLL_MAX: the generated
    hierarchy must build, trace via the gather LUT path, and run."""
    r = _run(["bench.py", "--dry-run", "--config", "2",
              "--fine-classes", "150"])
    assert r.returncode == 0, (r.stderr or r.stdout)[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["value"] > 0


def test_bench_pipeline_dry_run():
    """--pipeline (fed input-pipeline benchmark, round-4 verdict ask #1):
    host-only rates per backend, H2D attribution, and two fed train runs
    must all produce numbers on the CPU dry path."""
    r = _run(["bench.py", "--pipeline", "--dry-run"])
    assert r.returncode == 0, (r.stderr or r.stdout)[-2000:]
    lines = r.stdout.strip().splitlines()
    rec = json.loads(lines[-1])
    assert rec["metric"] == "pipeline_fed_images_per_sec_per_chip"
    assert rec["value"] > 0
    det_lines = [l for l in lines if l.startswith("# details: ")]
    det = json.loads(det_lines[-1][len("# details: "):])
    for variant in ("pil", "pil_w4", "cache", "cache_devflip"):
        rate = det["host"][variant]
        assert isinstance(rate, (int, float)) and rate > 0, (variant, rate)
    # the native backend may legitimately be unavailable on some hosts
    # (the bench degrades it to an 'error: ...' string by design)
    native = det["host"]["native"]
    assert (isinstance(native, (int, float)) and native > 0) or (
        isinstance(native, str) and native.startswith("error:")
    ), native
    assert det["h2d"]["mb_per_s"] > 0
    for fed in ("fed_pil", "fed_cache_devflip"):
        assert det[fed]["images_per_sec"] > 0, det[fed]


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


def test_bench_worker_protocol():
    """The orchestrator's --worker child: specs in via stdin, one
    {'point_result': ...} line out per spec, process stays warm between
    points (the property that avoids the TPU-grant handover hang)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "bench.py", "--worker"],
        cwd=REPO, env=env, stdin=subprocess.PIPE,
        stdout=subprocess.PIPE, text=True, bufsize=1,
    )
    spec = {"cid": 2, "dry": True, "steps": 2, "dtype": "float32",
            "platform": "cpu"}
    try:
        out, _ = proc.communicate(
            input=json.dumps(spec) + "\n"
            + json.dumps(dict(spec, fine_classes=20)) + "\n",
            timeout=800,
        )
    finally:
        proc.kill()
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    results = [d["point_result"] for d in lines if "point_result" in d]
    assert len(results) == 2, out[-2000:]
    for r in results:
        assert r["images_per_sec_per_chip"] > 0, r
        assert r["hiera_precision"] == "fast"  # config default applied


def test_bench_orchestrator_dry_run_partial_and_final_json():
    """--dry-run --all drives the real orchestrator (worker subprocess,
    partial emits, budget): stdout must contain >=1 partial compact
    line, '#'-prefixed details lines (partial ones tagged), and end
    with the final compact JSON whose details line carries every
    BASELINE config."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_BUDGET_S="600")
    r = subprocess.run(
        [sys.executable, "bench.py", "--dry-run", "--all", "--no-sweep"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stderr or r.stdout)[-2000:]
    lines = r.stdout.splitlines()
    recs = [json.loads(l) for l in lines if l.startswith("{")]
    assert len(recs) >= 2  # >=1 partial + the final
    for rec in recs:  # every stdout JSON line is the compact dict
        assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert recs[-1]["value"] > 0
    det_lines = [l for l in lines if l.startswith("# details: ")]
    assert det_lines
    dets = [json.loads(l[len("# details: "):]) for l in det_lines]
    # partial details ride stderr only (stdout stays tail-friendly)
    err_dets = [
        json.loads(l[len("# details: "):])
        for l in r.stderr.splitlines()
        if l.startswith("# details: ")
    ]
    assert any(d.get("partial") for d in err_dets)
    final = dets[-1]
    assert "partial" not in final
    assert final["2"]["images_per_sec_per_chip"] > 0
    # every BASELINE config key is present (measured, error, or skipped)
    assert set("12345") <= set(final)
    # the round-5 additions ride along
    assert "pipeline" in final and "cfg3_repeats" in final
