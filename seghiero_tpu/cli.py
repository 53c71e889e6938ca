"""Command-line entry points.

Flag-compatible with the reference CLIs:
  * train: ``--config`` (train.py:24-34) + extensions ``--resume``,
    ``--eval-only`` (standalone checkpoint validation), ``--quiet``.
  * infer: ``--config --image --checkpoint --device --output-dir``
    (infer.py:183-213). ``--device cpu`` (or ``training.device: cpu``)
    pins the CPU backend, mirroring the reference's device knob
    (train.py:109-113); other values are ignored with a note — placement
    on accelerators is the JAX runtime's job. ``--image`` may be given
    multiple times (batched multi-image inference, an extension).
"""

from __future__ import annotations

import argparse
import os
import sys


def _force_cpu():
    """Pin the CPU backend BEFORE any jax backend initializes (the env
    var alone is not enough on images whose sitecustomize registers an
    accelerator plugin in every interpreter)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def train_main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Train a hierarchical segmentation model from a single YAML config"
    )
    p.add_argument("--config", type=str, required=True, help="Path to the YAML config")
    p.add_argument(
        "--resume", action="store_true", help="Resume from the latest checkpoint"
    )
    p.add_argument(
        "--eval-only",
        action="store_true",
        help="no training: restore the latest checkpoint (or evaluate the "
        "fresh init if none exists) and print val metrics + the per-class "
        "IoU table (extension — the reference has no standalone eval)",
    )
    p.add_argument("--quiet", action="store_true", help="Less console output")
    args = p.parse_args(argv)

    from seghiero_tpu.config import load_config
    from seghiero_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    if cfg.training.device == "cpu":
        # honored like the reference's training.device (train.py:109-113):
        # run on the host CPU backend instead of grabbing an accelerator
        _force_cpu()
    elif cfg.training.gpus is not None or cfg.training.device not in (None, "tpu"):
        print(
            f"→ config requests device={cfg.training.device!r} gpus={cfg.training.gpus}"
            " — ignored on the JAX/TPU runtime (devices are auto-detected)"
        )

    trainer = Trainer(
        cfg, verbose=not args.quiet, resume=args.resume or args.eval_only
    )
    n_train, n_val = len(trainer.train_ds), len(trainer.val_ds)
    print(f"Number of train samples: {n_train}")
    print(f"Number of val   samples: {n_val}")
    h = cfg.hierarchy
    print(
        f"n_fine={h.n_fine}, n_coarse={h.n_coarse}, has_super={h.has_super}, "
        f"n_super={h.n_super}"
    )
    print(f"Total classes (output dim) = {h.total_classes}")
    print(f"Mesh: {dict(trainer.mesh.shape)} over {trainer.mesh.devices.size} device(s)")

    if args.eval_only:
        if trainer.start_epoch == 0:
            print("→ No checkpoint found; evaluating the fresh init.")
        summary, iou_table = trainer.evaluate(with_table=True)
        from seghiero_tpu.utils.tables import ascii_table

        rows = [["Val Loss", "Val Pixel Acc", "Val fine mIoU"]]
        rows.append(
            [
                f"{summary['loss']:.4f}",
                f"{summary['fine_acc'] * 100:.2f}%",
                f"{summary['fine_miou'] * 100:.2f}%",
            ]
        )
        print(ascii_table(rows))
        print(iou_table)
        print("Evaluation complete.")
        return 0

    trainer.fit()
    print("Training complete.")
    return 0


def infer_main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Run inference on image(s) using a trained model and YAML config"
    )
    p.add_argument("--config", type=str, required=True)
    p.add_argument(
        "--image",
        type=str,
        action="append",
        help="Input image path (repeatable for batched inference)",
    )
    p.add_argument(
        "--image-dir",
        type=str,
        default=None,
        help="Run on every image in a directory (sorted; combined with "
        "any --image flags)",
    )
    p.add_argument(
        "--batch-size",
        type=int,
        default=8,
        help="Device batch size for multi-image runs: images with the "
        "same original size are stacked and predicted together (one "
        "compiled program per size group; the tail batch is padded so "
        "the shape stays static)",
    )
    p.add_argument(
        "--checkpoint",
        type=str,
        default=None,
        help="Orbax step dir or reference .pth; defaults to the project's best",
    )
    p.add_argument(
        "--device",
        type=str,
        default=None,
        help="Accepted for reference-CLI compatibility; ignored (JAX runtime)",
    )
    p.add_argument("--output-dir", type=str, default=".")
    p.add_argument(
        "--consistent",
        action="store_true",
        help="derive coarse/super masks from the fine argmax through the "
        "hierarchy (guaranteed tree-consistent; extension — the reference "
        "argmaxes each level independently)",
    )
    p.add_argument(
        "--tta",
        action="store_true",
        help="multi-scale + horizontal-flip test-time augmentation "
        "ensemble (softmax-averaged; extension — standard DeepLab "
        "eval protocol)",
    )
    p.add_argument(
        "--tta-scales",
        type=str,
        default="0.75,1.0,1.25",
        help="comma-separated scales for --tta",
    )
    p.add_argument(
        "--export",
        type=str,
        default=None,
        metavar="DIR",
        help="instead of running on images, serialize a self-contained "
        "batch-polymorphic serving artifact (StableHLO via jax.export) "
        "to DIR; see seghiero_tpu/infer/export.py",
    )
    p.add_argument(
        "--export-sizes",
        type=str,
        default=None,
        metavar="HxW,...",
        help="extra input shape buckets for --export (e.g. "
        "'768x768,1024x1024'); the serving daemon routes each request "
        "to the smallest covering bucket and responds at the request's "
        "own resolution",
    )
    args = p.parse_args(argv)
    if args.image_dir:
        exts = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp"}
        found = sorted(
            os.path.join(args.image_dir, f)
            for f in os.listdir(args.image_dir)
            if os.path.splitext(f)[1].lower() in exts
        )
        if not found:
            p.error(f"--image-dir {args.image_dir} contains no images")
        args.image = (args.image or []) + found
    if not args.image and not args.export:
        p.error("one of --image/--image-dir or --export is required")
    if args.batch_size < 1:
        p.error("--batch-size must be >= 1")

    from seghiero_tpu.config import load_config
    from seghiero_tpu.infer.predictor import Predictor

    cfg = load_config(args.config)
    if args.device == "cpu" or (args.device is None and cfg.training.device == "cpu"):
        _force_cpu()
    elif args.device:
        print(f"→ --device {args.device!r} ignored (JAX selects devices)")

    predictor = Predictor.from_checkpoint(cfg, args.checkpoint)
    if args.export:
        from seghiero_tpu.infer.export import export_predictor

        sizes = None
        if args.export_sizes:
            try:
                sizes = [
                    tuple(int(x) for x in s.split("x"))
                    for s in args.export_sizes.split(",")
                ]
            except ValueError:
                p.error(f"--export-sizes must be 'HxW,...', got "
                        f"{args.export_sizes!r}")
        meta = export_predictor(
            predictor, args.export, consistent=args.consistent,
            input_sizes=sizes,
        )
        print(
            f"→ Exported serving artifact to {args.export} "
            f"(platforms: {', '.join(meta['platforms'])}; "
            f"input sizes {meta['input_sizes']})"
        )
        if not args.image:
            return 0
    if args.tta:
        # TTA stays per-image: each image runs a multi-scale ensemble
        for image_path in args.image:
            from seghiero_tpu.infer.predictor import preprocess_image

            arr, orig_hw, _ = preprocess_image(image_path, cfg.transform.resize)
            scales = tuple(float(s) for s in args.tta_scales.split(","))
            preds = predictor.predict_tta(
                arr[None], scales=scales, out_hw=orig_hw,
                consistent=args.consistent,
            )
            preds = {k: v[0] for k, v in preds.items()}
            base = os.path.splitext(os.path.basename(image_path))[0]
            for path in predictor.export_masks(preds, args.output_dir, base):
                print(f"→ Saved {path}")
    else:
        # genuinely batched: stack images sharing an original size and
        # predict args.batch_size at a time (infer.py processes one image
        # per forward; here the batch dim feeds the device/mesh directly)
        import numpy as np

        from seghiero_tpu.infer.predictor import preprocess_image

        groups: dict = {}
        for image_path in args.image:
            arr, orig_hw, _ = preprocess_image(image_path, cfg.transform.resize)
            groups.setdefault(orig_hw, []).append((image_path, arr))
        for orig_hw, items in groups.items():
            bsz = min(args.batch_size, len(items))
            for i in range(0, len(items), bsz):
                chunk = items[i : i + bsz]
                arrs = [a for _, a in chunk]
                while len(arrs) < bsz:  # pad the tail; outputs dropped
                    arrs.append(arrs[-1])
                preds = predictor.predict_array(
                    np.stack(arrs), out_hw=orig_hw, consistent=args.consistent
                )
                for j, (image_path, _) in enumerate(chunk):
                    per = {k: v[j] for k, v in preds.items()}
                    base = os.path.splitext(os.path.basename(image_path))[0]
                    for path in predictor.export_masks(
                        per, args.output_dir, base
                    ):
                        print(f"→ Saved {path}")
    print("Inference complete.")
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(train_main())
