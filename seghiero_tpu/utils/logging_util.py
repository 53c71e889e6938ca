"""Metric persistence.

The reference keeps an in-memory ``history`` list that is never written
anywhere (train.py:249,396-401). We persist per-epoch metrics as JSONL
when ``output.metrics_jsonl`` is configured.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            # truncate on open: one file per run
            open(path, "w").close()

    def log(self, record: Dict) -> None:
        if not self.path:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
