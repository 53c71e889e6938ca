#!/usr/bin/env python
"""Compiled-program memory analysis for the jitted train step.

Prints XLA's own memory accounting (``compiled.memory_analysis()``) for
a given config — temp (activation) bytes, argument/output bytes, and
the generated-code footprint — per device. This is how the memory
levers are evidenced WITHOUT hardware:

  * ``model.remat: true``         → temp bytes drop (backbone
                                    activations recomputed in backward);
  * ``training.param_sharding: fsdp`` / ``tensor_shards`` → argument
                                    bytes (params + opt state) drop
                                    per device;
  * ``training.spatial_shards``   → temp bytes drop (H-sharded
                                    activations).

Usage:
  python tools/memstats.py --hw 512 --batch 8 --depth 50 [--remat]
      [--levels 3] [--fsdp] [--devices 8]

Runs on the CPU backend by default — good for the *sharding* levers
(argument bytes drop with fsdp/tensor_shards regardless of backend).
For the remat lever you MUST pass the TPU platform (``--platform axon``
in this environment): the CPU backend has no memory-aware scheduler, so
its buffer assignment does not realise the checkpointed schedule and
temp bytes stay flat (measured: 512²/b8/r50 remat shows −42% temp on
TPU — 3.39→1.97 GiB — but ±1% on CPU).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--levels", type=int, default=2, choices=(2, 3))
    p.add_argument("--backbone", type=str, default=None)
    p.add_argument("--variant", type=str, default=None)
    p.add_argument("--head", type=str, default=None)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--fsdp", action="store_true")
    p.add_argument("--tensor-shards", type=int, default=1)
    p.add_argument("--spatial-shards", type=int, default=1)
    p.add_argument("--devices", type=int, default=1)
    p.add_argument("--platform", type=str, default="cpu")
    args = p.parse_args()

    if args.platform == "cpu" and args.devices > 1:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
    import jax

    jax.config.update("jax_platforms", args.platform)

    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    classes = {
        "coarse_to_fine_map": [[0, 3], [4, 6], [7], [8]],
        "coarse_names": {i: f"c{i}" for i in range(4)},
        "fine_names": {i: f"f{i}" for i in range(9)},
    }
    if args.levels == 3:
        classes["super_coarse_to_coarse_map"] = [[0, 2], [3]]
        classes["super_coarse_names"] = {0: "x", 1: "y"}
    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": args.batch},
            "classes": classes,
            "model": {
                "depth": args.depth,
                "remat": args.remat,
                **({"backbone": args.backbone} if args.backbone else {}),
                **(
                    {"backbone_options": {"variant": args.variant}}
                    if args.variant
                    else {}
                ),
                **({"head": args.head} if args.head else {}),
            },
            "training": {
                "epochs": 1,
                "batch_size": args.batch,
                "lr": 0.01,
                "mesh": {"data": args.devices // max(args.tensor_shards, args.spatial_shards, 1)},
                "param_sharding": "fsdp" if args.fsdp else "replicated",
                "tensor_shards": args.tensor_shards,
                "spatial_shards": args.spatial_shards,
            },
            "transform": {"resize": [args.hw, args.hw], "hflip_prob": 0.0},
            "output": {"checkpoint_dir": "/tmp/memstats", "project_name": "m"},
        }
    )
    trainer = Trainer(cfg, verbose=False)
    batch = next(iter(trainer.train_loader))
    import jax.numpy as jnp

    lowered = trainer._train_step.lower(trainer.state, batch, jnp.asarray(0))
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    out = {
        "temp_bytes": int(m.temp_size_in_bytes),
        "argument_bytes": int(m.argument_size_in_bytes),
        "output_bytes": int(m.output_size_in_bytes),
        "alias_bytes": int(m.alias_size_in_bytes),
        "generated_code_bytes": int(m.generated_code_size_in_bytes),
        "devices": args.devices,
        "config": {
            "hw": args.hw, "batch": args.batch, "depth": args.depth,
            "levels": args.levels, "remat": args.remat, "fsdp": args.fsdp,
            "tensor_shards": args.tensor_shards,
            "spatial_shards": args.spatial_shards,
        },
    }
    print(json.dumps(out))
    gib = 1 << 30
    print(
        f"# temp {m.temp_size_in_bytes / gib:.3f} GiB, "
        f"args {m.argument_size_in_bytes / gib:.3f} GiB, "
        f"out {m.output_size_in_bytes / gib:.3f} GiB (per device)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
