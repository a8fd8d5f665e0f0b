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


def extras(cfg) -> None:
    """Optional pre-task utilities, gated by the ``extras`` config group
    (reference ``src/utils/utils.py:12-39`` + ``configs/extras/default.yaml``):

    - ``ignore_warnings``: silence all python warnings
    - ``enforce_tags``: require a non-default ``tags`` list — prompt on an
      interactive tty, raise otherwise (experiments must be taggable for
      multirun bookkeeping)
    - ``print_config``: let the entry point pretty-print the composed config
      (honored by the caller via :func:`should_print_config`)
    """
    ex = cfg.get("extras") if hasattr(cfg, "get") else None
    if not ex:
        return
    if ex.get("ignore_warnings"):
        import warnings

        warnings.filterwarnings("ignore")
    if ex.get("enforce_tags"):
        tags = cfg.get("tags")
        if not tags:
            import sys

            if sys.stdin.isatty():
                entered = input(
                    "no tags set for this run — enter a comma-separated "
                    "list of tags: "
                ).strip()
                if not entered:
                    raise ValueError("tags are required (extras.enforce_tags)")
                cfg["tags"] = [t.strip() for t in entered.split(",") if t.strip()]
            else:
                raise ValueError(
                    "extras.enforce_tags: specify tags, e.g. "
                    "'tags=[dev]' (non-interactive run cannot prompt)"
                )


def should_print_config(cfg) -> bool:
    ex = cfg.get("extras") if hasattr(cfg, "get") else None
    return bool(ex.get("print_config", True)) if ex else True


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


def print_config_tree(cfg: Dict, save_to: Optional[str] = None, quiet: bool = False):
    text = json.dumps(
        cfg.to_dict() if hasattr(cfg, "to_dict") else cfg, indent=2, default=str
    )
    if not quiet:  # extras.print_config=False still persists the config file
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
