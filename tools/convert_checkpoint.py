#!/usr/bin/env python
"""Checkpoint conversion CLI.

  import: reference torch .pth  → our Orbax checkpoint layout
  export: our Orbax checkpoint  → reference-style torch .pth
          (loadable by the reference's infer.py:277-279)

Usage:
  python tools/convert_checkpoint.py import --config cfg.yaml \
      --pth seghiero_best.pth --out ./checkpoints
  python tools/convert_checkpoint.py export --config cfg.yaml \
      [--checkpoint STEP_DIR] --out model_best.pth
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["import", "export"])
    p.add_argument("--config", required=True)
    p.add_argument("--pth", help="reference .pth (import mode)")
    p.add_argument("--checkpoint", help="orbax step dir (export mode; default best)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax

    from seghiero_tpu.config import load_config
    from seghiero_tpu.infer.predictor import Predictor

    cfg = load_config(args.config)

    if args.mode == "import":
        if not args.pth:
            p.error("--pth required for import")
        predictor = Predictor.from_checkpoint(cfg, args.pth)
        # persist as an orbax state at step 0 under --out
        import jax.numpy as jnp

        from seghiero_tpu.train.checkpoint import CheckpointManager
        from seghiero_tpu.train.optim import make_optimizer, make_schedule
        from seghiero_tpu.train.trainer import TrainState

        tx = make_optimizer(cfg.training, make_schedule(cfg.training, 1))
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=predictor.variables["params"],
            batch_stats=predictor.variables["batch_stats"],
            opt_state=tx.init(predictor.variables["params"]),
        )
        mngr = CheckpointManager(args.out, cfg.output.project_name)
        path = mngr.save(
            state,
            epoch=0,
            metrics={},
            best_val_loss=float("inf"),
            config_raw=cfg.raw,
            is_best=True,
        )
        print(f"→ Imported {args.pth} to {path}")
    else:
        import torch

        from seghiero_tpu.models.torch_convert import export_reference_checkpoint

        predictor = Predictor.from_checkpoint(cfg, args.checkpoint)
        ckpt = export_reference_checkpoint(
            jax.device_get(predictor.variables),
            cfg.model.depth,
            cfg.model.proj_type,
            config=cfg.raw,
        )
        torch.save(ckpt, args.out)
        print(f"→ Exported reference-style checkpoint to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
