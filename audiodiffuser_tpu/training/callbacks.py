"""Trainer callbacks (parity with the reference's callback config group,
``/root/reference/configs/callbacks/*.yaml``).

The reference composes Lightning callbacks from config (model_checkpoint,
early_stopping, model_summary, rich_progress_bar — ``callbacks/default.yaml``).
Here the checkpoint/early-stop/progress mechanics live in the Trainer (they
interact with the jitted step and orbax state), and the ``callbacks`` config
group (a) maps onto those Trainer knobs in ``train.py`` and (b) may add
``_target_``-instantiated ``Callback`` objects for custom per-experiment
hooks — the part Lightning users reach callbacks for.

Hook contract (all optional):
    on_fit_start(trainer, state)        -> None
    on_train_epoch_end(trainer, state, logs: dict) -> bool | None
        (return True to request early stop)
    on_fit_end(trainer, state)          -> None
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np


class Callback:
    def on_fit_start(self, trainer, state):
        pass

    def on_train_epoch_end(self, trainer, state, logs: Dict[str, Any]) -> Optional[bool]:
        return None

    def on_fit_end(self, trainer, state):
        pass


class ModelSummary(Callback):
    """Parameter-count table by top-level module (reference
    ``callbacks/model_summary.yaml`` -> RichModelSummary)."""

    def __init__(self, max_depth: int = 1):
        self.max_depth = max_depth

    def on_fit_start(self, trainer, state):
        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        groups: Dict[str, int] = {}
        total = 0
        for path, leaf in flat:
            keys = [getattr(p, "key", getattr(p, "idx", "?")) for p in path]
            head = "/".join(str(k) for k in keys[: max(self.max_depth, 1)])
            n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
            groups[head] = groups.get(head, 0) + n
            total += n
        width = max((len(k) for k in groups), default=4)
        print(f"[summary] {'module':<{width}}  params")
        for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
            print(f"[summary] {k:<{width}}  {v:,}")
        print(f"[summary] {'TOTAL':<{width}}  {total:,}")


class MetricHistory(Callback):
    """Collects per-epoch logs in memory (handy for tests and sweepers)."""

    def __init__(self):
        self.history = []

    def on_train_epoch_end(self, trainer, state, logs):
        self.history.append(dict(logs))
        return None
