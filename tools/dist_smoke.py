#!/usr/bin/env python
"""2-process `jax.distributed` smoke worker.

Run by tests/test_distributed.py (and usable standalone) to exercise the
ONLY written-but-otherwise-unrunnable paths on a single machine:

  * ``jax.distributed.initialize`` with a local coordinator (the
    multi-host bring-up documented in docs/MIGRATION.md),
  * the grain loader's ``ShardOptions(process_index, process_count)``
    record sharding (data/pipeline.py:GrainBatchLoader) and its
    ``make_array_from_process_local_data`` global-batch assembly,
  * one ddp (shard_map) train step whose gradient pmean rides the
    cross-process CPU collectives (gloo),

then prints a param checksum: the test asserts both processes end in
bitwise-identical states (the DDP contract, trainer.py ddp mode).

Usage (each of N processes):
  python tools/dist_smoke.py --coordinator localhost:PORT \
      --process-id I --num-processes N
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.device_count() == args.num_processes  # 1 CPU device/process

    import jax.numpy as jnp

    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 8},
            "classes": {
                "coarse_to_fine_map": [[0, 3], [4, 6], [7], [8]],
                "coarse_names": {0: "a", 1: "b", 2: "c", 3: "d"},
                "fine_names": {i: f"f{i}" for i in range(9)},
            },
            "model": {
                "depth": 18,
                "dtype": "float32",
                "aspp_channels": 16,
                "c1_channels": 8,
                "proj_dim": 8,
                "dilations": [1, 2, 3, 4],
            },
            "training": {
                "epochs": 1,
                "batch_size": 2 * args.num_processes,
                "lr": 0.01,
                "num_workers": 0,
                "loader": "grain",
                "parallel_mode": "ddp",
                "mesh": {"data": args.num_processes},
                "seed": 3,
            },
            "transform": {"resize": [32, 32], "hflip_prob": 0.5},
            "output": {
                "checkpoint_dir": f"/tmp/dist_smoke_{args.process_id}",
                "project_name": "dist",
            },
        }
    )
    trainer = Trainer(cfg, verbose=False)
    assert trainer.train_loader.proc_count == args.num_processes
    assert len(trainer.train_loader) == 2  # 8 records / 4 global batch

    state = trainer.state
    it = iter(trainer.train_loader)
    for _ in range(2):  # two steps: grads pmean'd over gloo each step
        batch = next(it)
        state, m = trainer._train_step(state, batch, jnp.asarray(0))

    loss = float(m["loss"])
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(
        sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
    )
    # one line the test parses; flush before the distributed shutdown
    print(
        f"DIST_OK process={args.process_id} loss={loss:.6f} "
        f"checksum={checksum:.6f}",
        flush=True,
    )
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
