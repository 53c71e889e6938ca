#!/usr/bin/env python
"""Model card for a config: parameters, FLOPs, and step memory.

Prints a per-module parameter breakdown (backbone / head / aux) and
XLA's own cost model for one inference forward and one train step:

  python tools/summarize.py --config cfg.yaml [--hw 512 --batch 8]
  python tools/summarize.py --depth 50 --levels 2 --hw 512 --batch 8

FLOPs come from ``compiled.cost_analysis()`` (the compiler's count for
the program it actually emitted — includes rematerialization if
``model.remat`` is on), memory from ``compiled.memory_analysis()``
(see tools/memstats.py for the per-lever methodology and the
CPU-vs-TPU caveat on temp bytes).
"""

from __future__ import annotations

import argparse
import json
import sys


def _tree_bytes(tree) -> int:
    import jax

    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
    )


def _tree_params(tree) -> int:
    import jax

    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None, help="YAML config path")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--levels", type=int, default=2, choices=(2, 3))
    p.add_argument("--backbone", type=str, default=None)
    p.add_argument("--variant", type=str, default=None)
    p.add_argument("--head", type=str, default=None)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--platform", type=str, default="cpu",
                   help="cpu (default) or the TPU platform name")
    p.add_argument("--json", action="store_true", help="one JSON line only")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from seghiero_tpu.config import SegHieroConfig, load_config

    if args.config:
        cfg = load_config(args.config)
        if cfg.transform.resize:
            args.hw = cfg.transform.resize[0]
        args.batch = cfg.training.batch_size
    else:
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
                "training": {"epochs": 1, "batch_size": args.batch, "lr": 0.01},
                "transform": {"resize": [args.hw, args.hw], "hflip_prob": 0.0},
                "output": {"checkpoint_dir": "/tmp/summarize", "project_name": "m"},
            }
        )

    from seghiero_tpu.models.segmenter import build_model

    model = build_model(cfg)
    x = jnp.zeros((1, args.hw, args.hw, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x, train=False)
    )
    per_module = {
        name: _tree_params(sub)
        for name, sub in sorted(variables["params"].items())
    }
    n_params = sum(per_module.values())
    state_bytes = _tree_bytes(variables)

    # inference forward (batch 1) and train step (config batch)
    variables_r = model.init(jax.random.key(0), x, train=False)
    fwd = (
        jax.jit(lambda v, x: model.apply(v, x, train=False))
        .lower(variables_r, x)
        .compile()
    )
    fwd_flops = _flops(fwd)

    from seghiero_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, verbose=False)
    batch = next(iter(trainer.train_loader))
    step = trainer._train_step.lower(trainer.state, batch, jnp.asarray(0)).compile()
    step_flops = _flops(step)
    mem = step.memory_analysis()

    out = {
        "backbone": cfg.model.backbone,
        "depth": cfg.model.depth,
        "head": cfg.model.head,
        "levels": 3 if cfg.hierarchy.has_super else 2,
        "hw": args.hw,
        "batch": args.batch,
        "params": n_params,
        "params_by_module": per_module,
        "variables_bytes": state_bytes,
        "forward_flops_b1": fwd_flops,
        "train_step_flops": step_flops,
        "train_step_temp_bytes": int(mem.temp_size_in_bytes),
        "train_step_argument_bytes": int(mem.argument_size_in_bytes),
        "remat": cfg.model.remat,
        "platform": args.platform,
    }
    print(json.dumps(out))
    if not args.json:
        gib = 1 << 30
        print(
            f"# {cfg.model.backbone}-{cfg.model.depth} + {cfg.model.head} "
            f"({out['levels']}-level) @ {args.hw}²/b{args.batch}",
            file=sys.stderr,
        )
        for name, n in per_module.items():
            print(f"#   {name:<12} {n / 1e6:8.2f} M params", file=sys.stderr)
        print(
            f"#   total        {n_params / 1e6:8.2f} M params "
            f"({state_bytes / 1e6:.1f} MB variables)",
            file=sys.stderr,
        )
        print(
            f"#   forward (b1) {fwd_flops / 1e9:8.1f} GFLOP   "
            f"train step (b{args.batch}) {step_flops / 1e9:.1f} GFLOP",
            file=sys.stderr,
        )
        print(
            f"#   train-step memory: temp {mem.temp_size_in_bytes / gib:.2f} GiB, "
            f"args {mem.argument_size_in_bytes / gib:.2f} GiB "
            f"(platform {args.platform}; see tools/memstats.py caveats)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
