"""Epoch orchestration: the fit loop, evaluation, and reporting.

Split out of train/trainer.py (which owns construction: mesh, datasets,
optimizer, jitted steps). ``FitLoopMixin`` assumes the attributes Trainer
builds in ``__post_init__``: ``cfg``, ``state``, ``train_loader``,
``val_loader``, ``ckpt``, ``_train_step`` (+ ``_train_superstep`` /
``_stack_batches`` when ``steps_per_dispatch > 1``), ``_eval_step``,
``best_val_loss``, ``start_epoch``.

Reference counterpart: the epoch loop of train.py:236-430 — here the
loop keeps per-step losses ON DEVICE (one host sync per log interval and
one per epoch) instead of the reference's ``.item()`` per batch.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.data.pipeline import normalize_images
from seghiero_tpu.ops.resize import resize_bilinear
from seghiero_tpu.train.metrics import SegMetrics
from seghiero_tpu.train.steps import TrainState
from seghiero_tpu.utils.logging_util import MetricsLogger
from seghiero_tpu.utils.profiling import StepTimer, maybe_profile
from seghiero_tpu.utils.tables import ascii_table


class FitLoopMixin:
    """Epoch loop + eval/reporting for Trainer (reference train.py:236-430)."""
    # ------------------------------------------------------------------
    def _batch_groups(self, iterator):
        """Group the loader stream into ``steps_per_dispatch``-sized
        chunks (the epoch tail may be shorter)."""
        k = self.cfg.training.steps_per_dispatch
        buf = []
        for batch in iterator:
            buf.append(batch)
            if len(buf) == k:
                yield buf
                buf = []
        if buf:
            yield buf

    def _run_steps(self, batches, epoch_arr):
        """Dispatch one group: the scan superstep when the group is a full
        ``steps_per_dispatch`` chunk, per-step jit otherwise (a shorter
        tail group would otherwise force a second superstep compile).

        Returns ``(last_loss, summed_loss, n_steps)`` — device scalars;
        only the log-interval path materializes them on host."""
        k = self.cfg.training.steps_per_dispatch
        if k > 1 and len(batches) == k:
            stacked = self._stack_batches(*batches)
            self.state, m = self._train_superstep(self.state, stacked, epoch_arr)
            return m["loss"], m["loss_sum"], k
        last = tot = None
        for b in batches:
            self.state, m = self._train_step(self.state, b, epoch_arr)
            last = m["loss"]
            tot = last if tot is None else tot + last
        return last, tot, len(batches)

    def fit(self) -> list:
        cfg = self.cfg
        history = []
        logger = MetricsLogger(
            cfg.output.metrics_jsonl, cfg.output.tensorboard_dir
        )
        n_train = len(self.train_loader)
        with maybe_profile(cfg.output.profile_dir):
            for epoch in range(self.start_epoch, cfg.training.epochs):
                timer = StepTimer()
                self.train_loader.set_epoch(epoch)
                running = 0.0
                # device-side running sum: O(1) memory, one async scalar
                # add per step, ONE host sync at epoch end (a list of
                # per-step scalars would pin n_train buffers and stack
                # them into an n_train-operand concat HLO)
                loss_sum, loss_n = jnp.zeros((), jnp.float32), 0
                t0 = time.perf_counter()
                iterator = iter(self.train_loader)
                pbar = None
                if self.verbose:
                    try:  # reference-style progress bar (train.py:259)
                        from tqdm import tqdm

                        pbar = tqdm(
                            total=n_train,
                            desc=f"Epoch {epoch + 1}/{cfg.training.epochs} [Train]",
                            leave=False,
                        )
                    except ImportError:
                        pbar = None
                done = 0
                for group in self._batch_groups(iterator):
                    prev = done
                    last, tot, k = self._run_steps(group, jnp.asarray(epoch))
                    done += k
                    loss_sum, loss_n = loss_sum + tot, loss_n + k
                    timer.tick(cfg.training.batch_size * k)
                    if pbar is not None:
                        pbar.update(k)
                    log_every = cfg.training.log_every
                    if (done // log_every) != (prev // log_every) or done == n_train:
                        running = float(last)  # one sync per log interval
                        ips = timer.images_per_sec
                        if pbar is not None:
                            pbar.set_postfix(
                                train_loss=f"{running:.4f}",
                                **({"img_s": f"{ips:.1f}"} if ips else {}),
                            )
                        elif self.verbose:
                            print(
                                f"epoch {epoch + 1} step {done}/{n_train} "
                                f"loss {running:.4f}"
                                + (f" ({ips:.1f} img/s)" if ips else "")
                            )
                if pbar is not None:
                    pbar.close()
                train_time = time.perf_counter() - t0
                # true epoch average (train.py:403-414 averages over the
                # epoch; `running` is only the last logged step's loss)
                train_loss = float(loss_sum) / loss_n if loss_n else running

                val = self.evaluate()
                self._export_samples(epoch)
                record = {
                    "epoch": epoch + 1,
                    "train_loss": train_loss,
                    "val_loss": val["loss"],
                    "val_acc": val["fine_acc"],
                    "val_fine_miou": val["fine_miou"],
                    "val_coarse_miou": val.get("coarse_miou"),
                    "train_images_per_sec": timer.images_per_sec,
                    "train_seconds": train_time,
                }
                history.append(record)
                logger.log(record)
                if self.verbose:
                    rows = [
                        ["Epoch", "Avg Train Loss", "Avg Val Loss", "Val Pixel Acc",
                         "Val fine mIoU"],
                        [
                            epoch + 1,
                            f"{train_loss:.4f}",
                            f"{val['loss']:.4f}",
                            f"{val['fine_acc'] * 100:.2f}%",
                            f"{val['fine_miou'] * 100:.2f}%",
                        ],
                    ]
                    print(ascii_table(rows))

                is_best = val["loss"] < self.best_val_loss
                if is_best:
                    self.best_val_loss = val["loss"]
                    self._epochs_since_best = 0
                else:
                    self._epochs_since_best += 1
                self.ckpt.save(
                    self.state,
                    epoch=epoch + 1,
                    metrics=record,
                    best_val_loss=self.best_val_loss,
                    config_raw=cfg.raw,
                    is_best=is_best,
                )
                if is_best and self.verbose:
                    print(f"→ Saved new best model (val_loss {val['loss']:.4f})\n")
                patience = cfg.training.early_stop_patience
                if patience and self._epochs_since_best >= patience:
                    # extension: stop when val loss hasn't improved for
                    # `patience` epochs (the best checkpoint is already
                    # saved; the reference always runs every epoch)
                    if self.verbose:
                        print(
                            f"→ Early stop: no val-loss improvement for "
                            f"{patience} epoch(s) (best "
                            f"{self.best_val_loss:.4f})"
                        )
                    break
            if self.verbose and self._last_eval is not None:
                # final per-class IoU report (extension; reference has no
                # mIoU) — from the last epoch's accumulator, not a second
                # full pass over the val set
                print(self._iou_table(self._last_eval))
        self.ckpt.wait()  # flush the last async save before returning
        logger.close()
        return history


    def _export_samples(self, epoch: int) -> None:
        """``output.sample_images``: write N val predictions (plus the
        input and fine ground truth) as colorized PNGs under
        ``<checkpoint_dir>/<project>/samples/epoch_NNN/`` — visual
        training progress at a glance (extension; off by default)."""
        n = self.cfg.output.sample_images
        if not n:
            return
        import os

        from PIL import Image

        from seghiero_tpu.infer.viz import create_colormap, mask_to_color_image

        cfg, h = self.cfg, self.cfg.hierarchy
        batch = next(iter(self.val_loader))
        if self._sample_predict is None:
            model = self.model
            use_ema = cfg.training.ema_decay > 0

            def predict(state: TrainState, batch: Dict):
                params = state.ema_params if use_ema else state.params
                variables = {"params": params, "batch_stats": state.batch_stats}
                images = normalize_images(
                    batch["image"],
                    cfg.transform.normalize_mean,
                    cfg.transform.normalize_std,
                )
                out = model.apply(variables, images, train=False)
                logits = resize_bilinear(
                    out["logits"], batch["fine"].shape[1:3]
                )
                levels = ("fine", "coarse", "super")
                return {
                    lvl: jnp.argmax(logits[..., lo:hi], -1).astype(jnp.int32)
                    for lvl, (lo, hi) in zip(levels, h.level_slices)
                }

            self._sample_predict = jax.jit(predict)
        preds = jax.device_get(self._sample_predict(self.state, batch))
        outdir = os.path.join(
            cfg.output.checkpoint_dir,
            cfg.output.project_name,
            "samples",
            f"epoch_{epoch + 1:03d}",
        )
        os.makedirs(outdir, exist_ok=True)
        counts = {"fine": h.n_fine, "coarse": h.n_coarse, "super": h.n_super}
        imgs = np.asarray(batch["image"])
        gts = np.asarray(batch["fine"])
        for i in range(min(n, imgs.shape[0])):
            Image.fromarray(imgs[i].astype(np.uint8)).save(
                os.path.join(outdir, f"img{i}.png")
            )
            gt = np.where(gts[i] == h.ignore_index, -1, gts[i])  # 255 → black
            gt_color = mask_to_color_image(gt, create_colormap(counts["fine"]))
            gt_color.save(os.path.join(outdir, f"img{i}_gt_fine.png"))
            for lvl, m in preds.items():
                color = mask_to_color_image(
                    np.asarray(m[i]), create_colormap(counts[lvl])
                )
                color.save(os.path.join(outdir, f"img{i}_pred_{lvl}.png"))

    def _iou_table(self, acc) -> str:
        h = self.cfg.hierarchy
        names = {"fine": self.cfg.fine_names, "coarse": self.cfg.coarse_names}
        if h.has_super:
            names["super"] = self.cfg.super_names
        return acc.iou_table(names)

    def evaluate(self, with_table: bool = False):
        h = self.cfg.hierarchy
        levels = {"fine": h.n_fine, "coarse": h.n_coarse}
        if h.has_super:
            levels["super"] = h.n_super
        acc = SegMetrics(levels)
        # keep per-batch results on device; ONE host transfer at the end
        # (a device_get per eval batch costs a full dispatch round-trip
        # through remote-TPU relays)
        outs = [self._eval_step(self.state, batch) for batch in self.val_loader]
        for out in jax.device_get(outs):
            acc.update(float(out["loss"]), out["levels"])
        self._last_eval = acc
        if with_table:
            return acc.summary(), self._iou_table(acc)
        return acc.summary()

