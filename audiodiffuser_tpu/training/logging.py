"""Metric logging backends (csv / tensorboard / wandb-if-available stub).

Capability parity with the reference's logger config group
(``configs/logger/{csv,tensorboard,wandb,...}.yaml``) without the Lightning
dependency: loggers expose ``log_metrics(metrics, step)`` and
``log_hyperparams(cfg)``; a MultiLogger fans out. Only rank zero writes.
"""

from __future__ import annotations

import csv
import json
import os
import time
from pathlib import Path
from typing import Dict, List, Optional


class BaseLogger:
    def log_hyperparams(self, cfg: Dict):
        pass

    def log_metrics(self, metrics: Dict[str, float], step: int):
        pass

    def finalize(self):
        pass


class CSVLogger(BaseLogger):
    def __init__(self, save_dir: str, name: str = "csv"):
        self.dir = Path(save_dir) / name
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / "metrics.csv"
        self._fields: List[str] = ["step", "time"]
        self._rows: List[Dict] = []

    def log_hyperparams(self, cfg: Dict):
        with open(self.dir / "hparams.json", "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        for k in row:
            if k not in self._fields:
                self._fields.append(k)
        self._rows.append(row)
        with open(self.path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fields)
            writer.writeheader()
            writer.writerows(self._rows)


class TensorBoardLogger(BaseLogger):
    def __init__(self, save_dir: str, name: str = "tensorboard"):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(os.path.join(save_dir, name))

    def log_hyperparams(self, cfg: Dict):
        self.writer.add_text("hparams", json.dumps(cfg, indent=2, default=str))

    def log_metrics(self, metrics: Dict[str, float], step: int):
        for k, v in metrics.items():
            self.writer.add_scalar(k, float(v), step)

    def finalize(self):
        self.writer.close()


class WandbLogger(BaseLogger):
    """Weights & Biases logger; degrades to a no-op when wandb is absent."""

    def __init__(self, save_dir: str, project: str = "audiodiffuser-tpu", **kwargs):
        try:
            import wandb

            self.run = wandb.init(project=project, dir=save_dir, **kwargs)
        except Exception:
            self.run = None

    def log_hyperparams(self, cfg: Dict):
        if self.run is not None:
            self.run.config.update(cfg, allow_val_change=True)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        if self.run is not None:
            self.run.log(metrics, step=step)

    def finalize(self):
        if self.run is not None:
            self.run.finish()


class MultiLogger(BaseLogger):
    def __init__(self, loggers: List[BaseLogger]):
        self.loggers = loggers

    def log_hyperparams(self, cfg: Dict):
        for lg in self.loggers:
            lg.log_hyperparams(cfg)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def finalize(self):
        for lg in self.loggers:
            lg.finalize()
