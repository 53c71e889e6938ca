"""Metric persistence.

The reference keeps an in-memory ``history`` list that is never written
anywhere (train.py:249,396-401). We persist per-epoch metrics as JSONL
when ``output.metrics_jsonl`` is configured and/or as TensorBoard
scalars when ``output.tensorboard_dir`` is configured (tensorboardX —
gated import, optional dependency).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class MetricsLogger:
    def __init__(
        self, path: Optional[str] = None, tensorboard_dir: Optional[str] = None
    ):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            # truncate on open: one file per run
            open(path, "w").close()
        self._tb = None
        if tensorboard_dir:
            try:
                from tensorboardX import SummaryWriter
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "output.tensorboard_dir requires tensorboardX"
                ) from e
            self._tb = SummaryWriter(tensorboard_dir)

    def log(self, record: Dict) -> None:
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            step = int(record.get("epoch", 0))
            for k, v in record.items():
                if k != "epoch" and isinstance(v, (int, float)) and v is not None:
                    self._tb.add_scalar(k, float(v), step)
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
