"""CLI + file-backed dataset integration: train then infer, through the
same flags the reference exposes."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

from seghiero_tpu.cli import infer_main, train_main


@pytest.fixture
def file_dataset(tmp_path, classes_2level):
    """Tiny on-disk dataset + YAML config in the reference schema."""
    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    for split in ("train", "val"):
        (root / split / "img").mkdir(parents=True)
        (root / split / "msk").mkdir(parents=True)
        for i in range(4):
            img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            mask = rng.integers(0, 9, (40, 40)).astype(np.uint8)
            mask[:3, :3] = 255  # ignore region (reference would crash here)
            name = f"s{i}.png"
            Image.fromarray(img).save(root / split / "img" / name)
            Image.fromarray(mask).save(root / split / "msk" / name)
    # one unmatched file that must be dropped by the intersect
    Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(
        root / "train" / "img" / "orphan.png"
    )

    cfg = {
        "dataset": {
            "root": str(root),
            "train": {"image_subdir": "/train/img", "mask_subdir": "/train/msk"},
            "val": {"image_subdir": "/val/img", "mask_subdir": "/val/msk"},
        },
        "classes": classes_2level,
        "model": {
            "depth": 18,
            "dtype": "float32",
            "aspp_channels": 32,
            "c1_channels": 8,
            "proj_dim": 16,
            "dilations": [1, 2, 3, 4],
        },
        "training": {
            "epochs": 1,
            "batch_size": 2,
            "lr": 0.005,
            "device": "cuda",  # reference-style key: accepted & ignored
            "gpus": [0],
        },
        "transform": {"resize": [32, 32], "hflip_prob": 0.5},
        "output": {"checkpoint_dir": str(tmp_path / "ckpt"), "project_name": "cli"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return cfg_path, root


def test_train_then_infer_cli(file_dataset, tmp_path, capsys):
    cfg_path, root = file_dataset

    assert train_main(["--config", str(cfg_path), "--quiet"]) == 0
    out = capsys.readouterr().out
    assert "Number of train samples: 4" in out  # orphan dropped by intersect
    assert "Training complete." in out
    ckpt_root = tmp_path / "ckpt" / "cli"
    assert (ckpt_root / "best.json").exists()

    img = str(root / "val" / "img" / "s0.png")
    out_dir = tmp_path / "preds"
    assert (
        infer_main(
            [
                "--config",
                str(cfg_path),
                "--image",
                img,
                "--output-dir",
                str(out_dir),
                "--device",
                "cpu",
            ]
        )
        == 0
    )
    for suffix in ("fine", "coarse", "fine_color", "coarse_color"):
        assert (out_dir / f"s0_{suffix}.png").exists(), suffix
    # masks are at the ORIGINAL image size (40×40), not the resize size
    fine = np.asarray(Image.open(out_dir / "s0_fine.png"))
    assert fine.shape == (40, 40)
    assert fine.max() < 9

    # --checkpoint accepts any of: the step dir, the manager root
    # (<checkpoint_dir>/<project>), or the checkpoint_dir ROOT itself —
    # the latter is what `output.checkpoint_dir` literally names in the
    # config, a natural thing to paste (predictor.from_checkpoint)
    for ckpt_arg in (str(ckpt_root), str(tmp_path / "ckpt")):
        out_dir2 = tmp_path / f"preds_{os.path.basename(ckpt_arg)}"
        assert (
            infer_main(
                [
                    "--config", str(cfg_path),
                    "--image", img,
                    "--checkpoint", ckpt_arg,
                    "--output-dir", str(out_dir2),
                    "--device", "cpu",
                ]
            )
            == 0
        )
        same = np.asarray(Image.open(out_dir2 / "s0_fine.png"))
        np.testing.assert_array_equal(same, fine)


def test_native_transform_backend_trains(file_dataset, tmp_path):
    """File-backed training through the C++ transform core."""
    import yaml

    cfg_path, _ = file_dataset
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["transform"]["backend"] = "native"
    cfg["training"]["num_workers"] = 2
    cfg["output"]["checkpoint_dir"] = str(tmp_path / "nat")
    p2 = tmp_path / "native.yaml"
    p2.write_text(yaml.safe_dump(cfg))
    assert train_main(["--config", str(p2), "--quiet"]) == 0


def test_resume_cli(file_dataset, capsys):
    cfg_path, _ = file_dataset
    train_main(["--config", str(cfg_path), "--quiet"])
    capsys.readouterr()
    train_main(["--config", str(cfg_path), "--resume"])
    out = capsys.readouterr().out
    assert "Resumed from epoch 1" in out


def test_eval_only_cli(file_dataset, capsys):
    cfg_path, _ = file_dataset
    train_main(["--config", str(cfg_path), "--quiet"])
    capsys.readouterr()
    assert train_main(["--config", str(cfg_path), "--eval-only"]) == 0
    out = capsys.readouterr().out
    # restored the trained checkpoint, ran val only, printed both tables
    assert "Resumed from epoch 1" in out
    assert "Val fine mIoU" in out
    assert "Flower" in out  # per-class IoU table rows
    assert "Evaluation complete." in out
    assert "Training complete." not in out


def test_infer_image_dir_batched(file_dataset, tmp_path, capsys):
    """--image-dir runs every image in the directory, stacked into
    device batches (tail padded); outputs match the per-image path."""
    cfg_path, root = file_dataset
    assert train_main(["--config", str(cfg_path), "--quiet"]) == 0
    capsys.readouterr()

    img_dir = str(root / "val" / "img")
    out_dir = tmp_path / "dir_preds"
    assert (
        infer_main(
            [
                "--config", str(cfg_path),
                "--image-dir", img_dir,
                "--batch-size", "3",  # 4 images → batch of 3 + padded tail
                "--output-dir", str(out_dir),
                "--device", "cpu",
            ]
        )
        == 0
    )
    for i in range(4):
        for suffix in ("fine", "coarse"):
            assert (out_dir / f"s{i}_{suffix}.png").exists(), (i, suffix)

    # same masks as the single-image path
    solo_dir = tmp_path / "solo_preds"
    assert (
        infer_main(
            [
                "--config", str(cfg_path),
                "--image", str(root / "val" / "img" / "s3.png"),
                "--output-dir", str(solo_dir),
                "--device", "cpu",
            ]
        )
        == 0
    )
    a = np.asarray(Image.open(out_dir / "s3_fine.png"))
    b = np.asarray(Image.open(solo_dir / "s3_fine.png"))
    np.testing.assert_array_equal(a, b)


def test_infer_image_dir_empty_errors(file_dataset, tmp_path):
    cfg_path, _ = file_dataset
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit):
        infer_main(
            ["--config", str(cfg_path), "--image-dir", str(empty),
             "--device", "cpu"]
        )
