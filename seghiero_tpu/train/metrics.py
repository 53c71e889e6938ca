"""Segmentation metrics.

The reference's only metric is fine-level pixel accuracy computed inline
(train.py:381-393). We provide per-level pixel accuracy AND mIoU — mIoU
does not exist anywhere in the reference (SURVEY.md C18) but is the
north-star parity metric, so the eval harness accumulates a per-level
confusion matrix on-device (scatter-add, O(n²) ints) and derives both.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    preds: jax.Array, labels: jax.Array, num_classes: int, ignore_index: int = 255
) -> jax.Array:
    """[num_classes, num_classes] counts over non-ignored pixels
    (rows = truth, cols = prediction).

    Computed as a one-hot matmul ``Tᵀ·P`` so the reduction over pixels
    rides the MXU — a scatter-add over a full-resolution index map is
    the same ~3 GB/s TPU pathology as a gather (losses/hiera.py:
    lut_lookup). f32 accumulation is exact only for counts < 2²⁴ per
    cell, so pixels are processed in ≤2²³-pixel slabs whose partial
    matrices accumulate in int32 — exact up to 2³¹ total per cell (a
    16×1024² batch dominated by one class stays exact)."""
    valid = labels != ignore_index
    t = jnp.where(valid, labels, 0).reshape(-1)
    p = preds.reshape(-1)
    w = valid.reshape(-1).astype(jnp.float32)
    iota = jnp.arange(num_classes)

    slab = 1 << 23
    n = t.shape[0]
    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    for lo in range(0, n, slab):
        hi = min(lo + slab, n)
        t_oh = (t[lo:hi, None] == iota).astype(jnp.float32) * w[lo:hi, None]
        p_oh = (p[lo:hi, None] == iota).astype(jnp.float32)
        part = jnp.einsum(
            "ni,nj->ij", t_oh, p_oh, precision=jax.lax.Precision.HIGHEST
        )
        cm = cm + part.astype(jnp.int32)
    return cm


def pixel_accuracy_counts(preds, labels, ignore_index: int = 255):
    """(correct, valid) pixel counts (train.py:381-385 semantics)."""
    valid = labels != ignore_index
    correct = jnp.sum(((preds == labels) & valid).astype(jnp.int64))
    return correct, jnp.sum(valid.astype(jnp.int64))


def per_class_iou(cm: np.ndarray) -> np.ndarray:
    """IoU per class (NaN for classes absent from truth and prediction)."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    denom = cm.sum(0) + cm.sum(1) - tp
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(denom > 0, tp / denom, np.nan)


def miou_from_confusion(cm: np.ndarray) -> float:
    """Mean IoU over classes that appear in truth or prediction."""
    ious = per_class_iou(cm)
    present = ~np.isnan(ious)
    if not present.any():
        return 0.0
    return float(np.mean(ious[present]))


def macc_from_confusion(cm: np.ndarray) -> float:
    """Mean of per-class recall over classes present in truth (mmseg's
    "mAcc"; complements the all-pixel "aAcc" and mIoU)."""
    cm = np.asarray(cm, np.float64)
    tp, truth = np.diag(cm), cm.sum(1)
    present = truth > 0
    if not present.any():
        return 0.0
    return float(np.mean(tp[present] / truth[present]))


def accuracy_topk(logits: jax.Array, labels: jax.Array, topk=(1,), thresh=None):
    """mmseg-style top-k accuracy (models/loss/accuracy.py:4-49 of the
    reference — dead code there, live utility here). logits [..., C]."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)  # [..., maxk]
    correct = pred == labels[..., None]
    if thresh is not None:
        correct = correct & (jnp.max(logits, axis=-1, keepdims=True) > thresh)
    out = []
    total = labels.size
    for k in topk:
        out.append(jnp.sum(correct[..., :k]).astype(jnp.float32) * 100.0 / total)
    return out[0] if len(out) == 1 else tuple(out)


@dataclasses.dataclass
class SegMetrics:
    """Host-side accumulator over eval batches."""

    num_classes_per_level: Dict[str, int]
    cms: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    correct: Dict[str, int] = dataclasses.field(default_factory=dict)
    valid: Dict[str, int] = dataclasses.field(default_factory=dict)
    loss_sum: float = 0.0
    batches: int = 0

    def __post_init__(self):
        for lvl, n in self.num_classes_per_level.items():
            self.cms[lvl] = np.zeros((n, n), np.int64)
            self.correct[lvl] = 0
            self.valid[lvl] = 0

    def update(self, loss: float, level_stats: Dict[str, Dict]):
        self.loss_sum += float(loss)
        self.batches += 1
        for lvl, s in level_stats.items():
            self.cms[lvl] += np.asarray(s["cm"], np.int64)
            self.correct[lvl] += int(s["correct"])
            self.valid[lvl] += int(s["valid"])

    def summary(self) -> Dict[str, float]:
        out = {"loss": self.loss_sum / max(self.batches, 1)}
        for lvl in self.num_classes_per_level:
            out[f"{lvl}_acc"] = self.correct[lvl] / max(self.valid[lvl], 1)
            out[f"{lvl}_miou"] = miou_from_confusion(self.cms[lvl])
            out[f"{lvl}_macc"] = macc_from_confusion(self.cms[lvl])
        return out

    def iou_table(self, names_per_level: Dict[str, Dict[int, str]]) -> str:
        """Per-class IoU report (extension — the reference has no mIoU)."""
        from seghiero_tpu.utils.tables import ascii_table

        rows = [["Level", "Class", "Name", "IoU"]]
        for lvl, cm in self.cms.items():
            names = names_per_level.get(lvl, {})
            for cid, iou in enumerate(per_class_iou(cm)):
                rows.append(
                    [
                        lvl,
                        cid,
                        names.get(cid, ""),
                        "-" if np.isnan(iou) else f"{iou * 100:.2f}%",
                    ]
                )
        return ascii_table(rows)
