"""2-process `jax.distributed` smoke test (tools/dist_smoke.py).

Launches two REAL processes with a local coordinator on this machine —
the closest a single host gets to the multi-host bring-up — and asserts
both complete a grain-sharded ddp step ending in identical parameters.
See tools/dist_smoke.py for exactly which written-paths this exercises.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_ddp_step_identical_params():
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_NUM_CPU_DEVICES="1",
    )
    env.pop("XLA_FLAGS", None)  # no virtual 8-device mesh in the workers
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tools", "dist_smoke.py"),
                "--coordinator",
                f"localhost:{port}",
                "--process-id",
                str(i),
                "--num-processes",
                "2",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=REPO,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        m = re.search(
            r"DIST_OK process=(\d+) loss=([-\d.]+) checksum=([-\d.]+)", out
        )
        assert m, f"no DIST_OK line in:\n{out[-4000:]}"
        results[int(m.group(1))] = (m.group(2), m.group(3))

    assert set(results) == {0, 1}
    # DDP contract: pmean'd grads + identical init ⇒ identical params
    assert results[0] == results[1], results
