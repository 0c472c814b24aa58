"""Experiment metric logging: CSV always, wandb when importable.

The reference logs both trainers to wandb (``train_qnet.py:42-51``,
``train_rl_agent.py:37``); offline images get a CSV sink instead, same keys.
"""

from __future__ import annotations

import csv
import os
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, project: str, config=None, out_dir="logs"):
        self.project = project
        self.rows = []
        self.out_path = Path(out_dir) / f"{project}_{int(time.time())}.csv"
        self._wandb = None
        try:
            import wandb  # pragma: no cover - not installed in this image

            self._wandb = wandb.init(project=project, config=config or {})
        except Exception:
            pass

    def log(self, metrics: dict):
        self.rows.append(dict(metrics))
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(metrics)
        self._flush()

    def _flush(self):
        os.makedirs(self.out_path.parent, exist_ok=True)
        keys = sorted({k for r in self.rows for k in r})
        with open(self.out_path, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=keys)
            w.writeheader()
            w.writerows(self.rows)
