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

    def on_resume(self, step: int):
        """Called by the trainer after a checkpoint restore with the restored
        step, so history-keeping loggers can reconcile rows logged after the
        checkpoint was written (crash between checkpoint and crash-point)."""

    def finalize(self):
        pass


def _row_step_beyond(row: Dict, step: int) -> bool:
    try:
        return int(float(row.get("step", 0))) > step
    except (TypeError, ValueError):
        return False


class CSVLogger(BaseLogger):
    def __init__(self, save_dir: str, name: str = "csv"):
        self.dir = Path(save_dir) / name
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / "metrics.csv"
        self._fields: List[str] = ["step", "time"]
        self._rows: List[Dict] = []
        # crash-resume into the same output dir must append, not truncate,
        # the metric history: seed rows/fields from an existing file
        if self.path.exists():
            try:
                with open(self.path, newline="") as f:
                    reader = csv.DictReader(f)
                    for k in reader.fieldnames or []:
                        if k not in self._fields:
                            self._fields.append(k)
                    self._rows = [dict(r) for r in reader]
            except Exception:
                pass

    def log_hyperparams(self, cfg: Dict):
        with open(self.dir / "hparams.json", "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    def on_resume(self, step: int):
        # the restore may be older than the last logged row (crash after the
        # checkpoint was written): drop seeded rows beyond the restored step
        # so those steps aren't logged twice with conflicting values
        kept = [r for r in self._rows if not _row_step_beyond(r, step)]
        if len(kept) != len(self._rows):
            self._rows = kept
            with open(self.path, "w", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=self._fields)
                writer.writeheader()
                writer.writerows(self._rows)

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


class _OfflineFallbackLogger(BaseLogger):
    """Shared shape for backends whose client package may be absent
    (comet_ml / mlflow / neptune are not in the image): when the import
    fails, metrics are archived to ``<save_dir>/<name>_offline/metrics.jsonl``
    so runs remain inspectable and uploadable later — the same contract as
    the services' own offline modes."""

    name = "offline"

    def __init__(self, save_dir: str):
        self.dir = Path(save_dir) / f"{self.name}_offline"
        self.dir.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.dir / "metrics.jsonl", "a")

    def log_hyperparams(self, cfg: Dict):
        with open(self.dir / "hparams.json", "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def finalize(self):
        self._fh.close()


class CometLogger(_OfflineFallbackLogger):
    """Comet logger (reference configs/logger/comet.yaml). Uses comet_ml when
    installed (API key from COMET_API_TOKEN), else the offline archive."""

    name = "comet"

    def __init__(self, save_dir: str, project_name: str = "audiodiffuser-tpu", **kw):
        try:
            import comet_ml

            self.exp = comet_ml.Experiment(
                api_key=os.environ.get("COMET_API_TOKEN"),
                project_name=project_name,
            )
        except Exception:
            self.exp = None
            super().__init__(save_dir)

    def log_hyperparams(self, cfg: Dict):
        if self.exp is not None:
            self.exp.log_parameters(cfg)
        else:
            super().log_hyperparams(cfg)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        if self.exp is not None:
            self.exp.log_metrics(metrics, step=step)
        else:
            super().log_metrics(metrics, step)

    def finalize(self):
        if self.exp is not None:
            self.exp.end()
        else:
            super().finalize()


class MLFlowLogger(_OfflineFallbackLogger):
    """MLflow logger (reference configs/logger/mlflow.yaml). Uses mlflow when
    installed (file-store at ``tracking_uri``), else the offline archive."""

    name = "mlflow"

    def __init__(self, save_dir: str, tracking_uri: str = "", experiment_name: str = "audiodiffuser-tpu", **kw):
        try:
            import mlflow

            self.mlflow = mlflow
            if tracking_uri:
                mlflow.set_tracking_uri(tracking_uri)
            mlflow.set_experiment(experiment_name)
            self.run = mlflow.start_run()
        except Exception:
            self.mlflow = None
            super().__init__(save_dir)

    def log_hyperparams(self, cfg: Dict):
        if self.mlflow is not None:
            flat = _flatten(cfg)
            # mlflow caps param value length; truncate defensively
            self.mlflow.log_params({k: str(v)[:250] for k, v in flat.items()})
        else:
            super().log_hyperparams(cfg)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        if self.mlflow is not None:
            self.mlflow.log_metrics(
                {k.replace("/", "_"): float(v) for k, v in metrics.items()}, step=step
            )
        else:
            super().log_metrics(metrics, step)

    def finalize(self):
        if self.mlflow is not None:
            self.mlflow.end_run()
        else:
            super().finalize()


class NeptuneLogger(_OfflineFallbackLogger):
    """Neptune logger (reference configs/logger/neptune.yaml). Uses neptune
    when installed (API key from NEPTUNE_API_TOKEN), else the offline archive."""

    name = "neptune"

    def __init__(self, save_dir: str, project: str = "", **kw):
        try:
            import neptune

            self.run = neptune.init_run(
                project=project or None,
                api_token=os.environ.get("NEPTUNE_API_TOKEN"),
            )
        except Exception:
            self.run = None
            super().__init__(save_dir)

    def log_hyperparams(self, cfg: Dict):
        if self.run is not None:
            self.run["parameters"] = _flatten(cfg)
        else:
            super().log_hyperparams(cfg)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        if self.run is not None:
            for k, v in metrics.items():
                self.run[k].append(float(v), step=step)
        else:
            super().log_metrics(metrics, step)

    def finalize(self):
        if self.run is not None:
            self.run.stop()
        else:
            super().finalize()


def _flatten(cfg: Dict, prefix: str = "") -> Dict[str, object]:
    out: Dict[str, object] = {}
    for k, v in cfg.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


class MultiLogger(BaseLogger):
    def __init__(self, loggers: List[BaseLogger]):
        self.loggers = loggers

    def log_hyperparams(self, cfg: Dict):
        for lg in self.loggers:
            lg.log_hyperparams(cfg)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def on_resume(self, step: int):
        for lg in self.loggers:
            lg.on_resume(step)

    def finalize(self):
        for lg in self.loggers:
            lg.finalize()
