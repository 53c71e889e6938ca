"""Checkpointing with resume (Orbax).

The reference torch.save's a monolithic dict on every val-loss
improvement (train.py:419-435) and has NO resume path — optimizer state
is saved but never reloaded (SURVEY.md C19). Here:

  * Orbax saves the full train state (params, batch_stats, opt_state,
    step) — sharding-aware, works unchanged under a multi-chip mesh;
  * a JSON sidecar carries epoch / best_val_loss / the raw YAML config
    (superset of the reference dict contents);
  * ``restore_latest`` gives preemption-safe resume (aux subsystem
    "failure detection / elastic recovery" of SURVEY §5);
  * a ``best`` pointer mirrors the reference's best-checkpoint behavior —
    and we fix its filename mismatch (train saves ``_epoch_{e}_best.pth``
    while infer expects ``_best.pth``, train.py:430-433 vs
    infer.py:271-273): the best checkpoint is always reachable under one
    stable name.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, project_name: str, max_to_keep: int = 3):
        self.root = os.path.abspath(os.path.join(directory, project_name))
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    # ------------------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.root, f"step_{step:08d}")

    def _meta_path(self, step_dir: str) -> str:
        return os.path.join(step_dir, "meta.json")

    def _existing_steps(self):
        """Steps with a COMMITTED state dir. Orbax writes to a tmp name
        and renames on commit, so `state/` existing ⇒ complete — an
        in-flight async save (meta.json already written, state pending)
        is correctly skipped."""
        steps = []
        if not os.path.isdir(self.root):
            return steps
        for d in os.listdir(self.root):
            if d.startswith("step_"):
                try:
                    s = int(d.split("_")[1])
                except ValueError:
                    continue
                if os.path.isdir(os.path.join(self._step_dir(s), "state")):
                    steps.append(s)
        return sorted(steps)

    # ------------------------------------------------------------------
    def save(
        self,
        state,
        *,
        epoch: int,
        metrics: Dict,
        best_val_loss: float,
        config_raw: Dict,
        is_best: bool,
    ) -> str:
        # barrier on the PREVIOUS async save (a no-op if it finished
        # during the epoch that elapsed since) before starting this one,
        # then GC with only committed directories visible — the save
        # itself overlaps the next epoch's train steps.
        self._ckptr.wait_until_finished()
        step = int(jax.device_get(state.step))
        step_dir = self._step_dir(step)
        # the Orbax save is COLLECTIVE in a multi-process run (every
        # process must call it; the primary commits); the JSON sidecars
        # and GC are primary-only — concurrent identical writes are
        # merely racy on a shared FS, concurrent rmtree is not
        self._ckptr.save(os.path.join(step_dir, "state"), state, force=True)
        if jax.process_index() == 0:
            meta = {
                "step": step,
                "epoch": epoch,
                "metrics": {k: v for k, v in metrics.items() if v is not None},
                "best_val_loss": best_val_loss,
                "config": config_raw,
            }
            # the async save commits `state/` via tmp-dir rename later;
            # the sidecar must not rely on the step dir existing yet
            os.makedirs(step_dir, exist_ok=True)
            with open(self._meta_path(step_dir), "w") as f:
                json.dump(meta, f, indent=1, default=float)
            if is_best:
                with open(os.path.join(self.root, "best.json"), "w") as f:
                    json.dump({"step": step}, f)
            self._gc(keep_best=True)
        return step_dir

    def wait(self):
        """Flush any in-flight async save (call before process exit or
        before handing the directory to another reader)."""
        self._ckptr.wait_until_finished()

    def _best_step(self) -> Optional[int]:
        p = os.path.join(self.root, "best.json")
        if os.path.exists(p):
            with open(p) as f:
                return int(json.load(f)["step"])
        return None

    def _gc(self, keep_best: bool):
        import shutil

        steps = self._existing_steps()
        best = self._best_step() if keep_best else None
        removable = [s for s in steps if s != best]
        for s in removable[: max(0, len(removable) - self.max_to_keep)]:
            shutil.rmtree(self._step_dir(s), ignore_errors=True)

    # ------------------------------------------------------------------
    def restore(self, step: int, target_state) -> Tuple[Any, Dict]:
        self._ckptr.wait_until_finished()  # flush an in-flight save first
        step_dir = self._step_dir(step)
        state = self._ckptr.restore(os.path.join(step_dir, "state"), target_state)
        with open(self._meta_path(step_dir)) as f:
            meta = json.load(f)
        return state, meta

    def restore_latest(self, target_state) -> Optional[Tuple[Any, Dict]]:
        self._ckptr.wait_until_finished()  # the latest save may be in flight
        steps = self._existing_steps()
        if not steps:
            return None
        return self.restore(steps[-1], target_state)

    def restore_best(self, target_state) -> Optional[Tuple[Any, Dict]]:
        """Restore the best checkpoint, falling back to the latest
        COMMITTED one. The fallback matters: ``save(is_best=True)``
        writes ``best.json`` while the async state save is still in
        flight, so a crash inside that commit window leaves the pointer
        at a step whose ``state/`` dir never materialized — without the
        guard every later restore would fail permanently."""
        self._ckptr.wait_until_finished()  # the best save may be in flight
        best = self._best_step()
        if best is not None:
            if os.path.isdir(os.path.join(self._step_dir(best), "state")):
                return self.restore(best, target_state)
            import warnings

            warnings.warn(
                f"best.json points at step {best} whose state was never "
                "committed (crash during an async save); falling back to "
                "the latest complete checkpoint"
            )
        return self.restore_latest(target_state)
