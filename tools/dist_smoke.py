#!/usr/bin/env python
"""Multi-process `jax.distributed` smoke worker.

Run by tests/test_distributed.py (and usable standalone) to exercise the
ONLY written-but-otherwise-unrunnable paths on a single machine:

  * ``jax.distributed.initialize`` with a local coordinator (the
    multi-host bring-up documented in docs/MIGRATION.md),
  * the grain loader's ``ShardOptions(process_index, process_count)``
    record sharding (data/pipeline.py:GrainBatchLoader) and its
    ``make_array_from_process_local_data`` global-batch assembly,
  * train steps in every multi-process parallel mode — ``ddp``
    (shard_map, gradient pmean over the cross-process CPU collectives),
    ``pjit`` (global-batch data parallel), ``fsdp``
    (``param_sharding: fsdp`` — params sharded across processes),
  * COLLECTIVE Orbax checkpointing (every process calls save; the
    primary commits — train/checkpoint.py) and resume-from-checkpoint,
    including mid-epoch realignment of the deterministic batch stream —
    the failure-drill path (round-4 verdict ask #4): kill a process
    mid-run, relaunch with --resume, and the trajectory must continue
    bitwise as if never interrupted.

Prints ``DIST_OK process=I start=S loss=L checksum=C``: the test asserts
all processes end in identical states (the DP contract) and that a
resumed run reproduces the uninterrupted run's final checksum.

Usage (each of N processes):
  python tools/dist_smoke.py --coordinator localhost:PORT \
      --process-id I --num-processes N [--mode ddp|pjit|fsdp]
      [--steps K] [--save-at S] [--resume] [--die-process P --die-at D]
      [--ckpt-dir DIR]
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
    ap.add_argument("--mode", default="ddp", choices=("ddp", "pjit", "fsdp"))
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--save-at", type=int, default=0,
                    help="checkpoint (collective Orbax save) after this "
                    "1-based step; 0 = never")
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint and continue the "
                    "batch stream from the restored step")
    ap.add_argument("--die-process", type=int, default=-1)
    ap.add_argument("--die-at", type=int, default=0,
                    help="process --die-process exits hard (os._exit) "
                    "BEFORE executing this 1-based step — the failure "
                    "injection for the elastic-recovery drill")
    ap.add_argument("--ckpt-dir", default=None,
                    help="SHARED checkpoint dir (all processes must see "
                    "the same path); default /tmp/dist_smoke_<mode>")
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
    # Barrier EARLY so the gloo context for the all-device clique
    # initializes while every process is provably at the same point:
    # gloo's context bootstrap has a hard 30 s KV timeout, and on a
    # contended host, compile skew at the first *late* collective
    # (measured: the loader's first device_put at 4 processes on one
    # core) exceeds it. The context is cached per clique afterwards, so
    # all later collectives block without a deadline instead of racing
    # that 30 s window. (jax_share_binary_between_hosts would also pin
    # the skew, but it deadlocks multi-process CPU runs in this JAX
    # version — measured, do not enable.)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dist_smoke_start")

    import jax.numpy as jnp

    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    training = {
        "epochs": 1,
        "batch_size": 2 * args.num_processes,
        "lr": 0.01,
        "num_workers": 0,
        "loader": "grain",
        "mesh": {"data": args.num_processes},
        "seed": 3,
    }
    if args.mode == "ddp":
        training["parallel_mode"] = "ddp"
    elif args.mode == "fsdp":
        training["param_sharding"] = "fsdp"
    ckpt_dir = args.ckpt_dir or f"/tmp/dist_smoke_{args.mode}"
    cfg = SegHieroConfig.from_dict(
        {
            # 2 global batches per epoch → multi-epoch streams for the
            # longer drill runs
            "dataset": {
                "kind": "synthetic",
                "synthetic_size": 4 * args.num_processes,
            },
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
            "training": training,
            "transform": {"resize": [32, 32], "hflip_prob": 0.5},
            "output": {"checkpoint_dir": ckpt_dir, "project_name": "dist"},
        }
    )
    trainer = Trainer(cfg, verbose=False)
    assert trainer.train_loader.proc_count == args.num_processes
    assert len(trainer.train_loader) == 2  # 4N records / 2N global batch

    state = trainer.state
    start_step = 0
    if args.resume:
        restored = trainer.ckpt.restore_latest(state)
        assert restored is not None, "resume requested but no checkpoint"
        state, _meta = restored
        start_step = int(jax.device_get(state.step))

    def batch_stream():
        """Deterministic (seed, epoch)-keyed stream — identical on every
        process and across relaunches, so skipping `start_step` batches
        realigns a resumed run mid-epoch."""
        epoch = 0
        while True:
            trainer.train_loader.set_epoch(epoch)
            for b in trainer.train_loader:
                yield b
            epoch += 1

    stream = batch_stream()
    for _ in range(start_step):
        next(stream)  # realign after resume

    m = {"loss": jnp.zeros(())}  # defined even if fully restored
    for step_1 in range(start_step + 1, args.steps + 1):
        if args.die_process == args.process_id and args.die_at == step_1:
            os._exit(17)  # simulated hard failure (no cleanup, no shutdown)
        batch = next(stream)
        state, m = trainer._train_step(state, batch, jnp.asarray(0))
        if args.save_at == step_1:
            trainer.ckpt.save(
                state,
                epoch=0,
                metrics={"loss": float(jax.device_get(m["loss"]))},
                best_val_loss=float("inf"),
                config_raw={},
                is_best=False,
            )
            trainer.ckpt.wait()  # commit before any injected failure

    loss = float(jax.device_get(m["loss"]))
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(
        sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
    )
    # one line the test parses; flush before the distributed shutdown
    print(
        f"DIST_OK process={args.process_id} start={start_step} "
        f"loss={loss:.6f} checksum={checksum:.6f}",
        flush=True,
    )
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
