"""Entry-point helpers.

Capability parity with the reference ``src/utils/``: exception-safe
``task_wrapper`` (utils.py:42-92), config pretty printing (rich_utils.py),
``get_metric_value`` (utils.py:95-112) and seeding.
"""

from __future__ import annotations

import functools
import json
import random
import traceback
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


def seed_everything(seed: Optional[int]):
    if seed is None:
        return
    random.seed(seed)
    np.random.seed(seed % 2**32)


def task_wrapper(task_func: Callable) -> Callable:
    """Log crashes to the output dir and always re-raise (reference
    utils/utils.py:42-92); ensures logger finalization on the happy path."""

    @functools.wraps(task_func)
    def wrap(cfg, *args, **kwargs):
        try:
            return task_func(cfg, *args, **kwargs)
        except Exception:
            out = Path(cfg.get("paths", {}).get("output_dir") or ".")
            out.mkdir(parents=True, exist_ok=True)
            with open(out / "crash.log", "w") as f:
                f.write(traceback.format_exc())
            raise

    return wrap


def print_config_tree(cfg: Dict, save_to: Optional[str] = None):
    text = json.dumps(
        cfg.to_dict() if hasattr(cfg, "to_dict") else cfg, indent=2, default=str
    )
    print(text)
    if save_to:
        Path(save_to).parent.mkdir(parents=True, exist_ok=True)
        with open(save_to, "w") as f:
            f.write(text)


def get_metric_value(metric_dict: Dict[str, Any], metric_name: Optional[str]):
    """Retrieve the hyperparameter-search objective (reference :95-112)."""
    if not metric_name:
        return None
    if metric_name not in metric_dict:
        raise KeyError(
            f"metric '{metric_name}' not found in {sorted(metric_dict)}"
        )
    return float(metric_dict[metric_name])
