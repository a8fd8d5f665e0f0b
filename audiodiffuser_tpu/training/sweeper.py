"""Hyperparameter search: random and TPE samplers + median pruner.

Capability parity with the reference's hydra-optuna sweeper
(``/root/reference/requirements.txt:10``, ``tests/test_sweeps.py:57-90``)
without the optuna/hydra dependency: a self-contained Tree-structured Parzen
Estimator (Bergstra et al. 2011) over the same search-space spec the random
sweeper uses ({low, high, log} floats and {choices} categoricals), plus a
median pruner fed per-epoch via the trainer callback seam.

Spec (configs/hparams_search/*.yaml):
    sampler: random | tpe
    n_trials: 20
    n_startup_trials: 5        # random before TPE kicks in
    gamma: 0.25                # top fraction modeled as "good"
    direction: minimize | maximize
    pruner: {type: median, n_startup_trials: 3, n_warmup_epochs: 0}
    params: {key: {low, high, log} | {choices: [...]}}
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .callbacks import Callback


# --- search space ------------------------------------------------------------


class _Dim:
    """One search dimension; maps between config values and unit space."""

    def __init__(self, key: str, spec: Dict):
        self.key = key
        self.choices = list(spec["choices"]) if "choices" in spec else None
        if self.choices is None:
            self.log = bool(spec.get("log"))
            self.low = math.log(spec["low"]) if self.log else float(spec["low"])
            self.high = math.log(spec["high"]) if self.log else float(spec["high"])

    @property
    def categorical(self) -> bool:
        return self.choices is not None

    def to_unit(self, value) -> float:
        if self.categorical:
            return float(self.choices.index(value))
        v = math.log(value) if self.log else float(value)
        return (v - self.low) / (self.high - self.low)

    def from_unit(self, u: float):
        if self.categorical:
            return self.choices[int(np.clip(round(u), 0, len(self.choices) - 1))]
        v = self.low + float(np.clip(u, 0.0, 1.0)) * (self.high - self.low)
        return math.exp(v) if self.log else v

    def sample_uniform(self, rng: np.random.Generator):
        if self.categorical:
            return self.choices[rng.integers(len(self.choices))]
        return self.from_unit(rng.uniform())


# --- samplers ----------------------------------------------------------------


class RandomSampler:
    def __init__(self, params_spec: Dict, seed: int = 0):
        self.dims = [_Dim(k, dict(v)) for k, v in params_spec.items()]
        self.rng = np.random.default_rng(seed)

    def suggest(self, history: Sequence[Tuple[Dict, float]]) -> Dict:
        return {d.key: d.sample_uniform(self.rng) for d in self.dims}


class TPESampler:
    """Simplified TPE: model good/bad trial densities with Parzen windows in
    unit space, draw candidates from the good density, pick argmax l/g."""

    def __init__(
        self,
        params_spec: Dict,
        seed: int = 0,
        n_startup_trials: int = 5,
        gamma: float = 0.25,
        n_candidates: int = 24,
        direction: str = "minimize",
    ):
        self.dims = [_Dim(k, dict(v)) for k, v in params_spec.items()]
        self.rng = np.random.default_rng(seed)
        self.n_startup_trials = n_startup_trials
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.sign = 1.0 if direction == "minimize" else -1.0

    def suggest(self, history: Sequence[Tuple[Dict, float]]) -> Dict:
        done = [(p, v) for p, v in history if v is not None and np.isfinite(v)]
        if len(done) < self.n_startup_trials:
            return {d.key: d.sample_uniform(self.rng) for d in self.dims}

        values = np.asarray([self.sign * v for _, v in done])
        order = np.argsort(values)
        n_good = max(1, int(np.ceil(self.gamma * len(done))))
        good_idx, bad_idx = order[:n_good], order[n_good:]

        out = {}
        for d in self.dims:
            obs = np.asarray([d.to_unit(p[d.key]) for p, _ in done])
            good, bad = obs[good_idx], obs[bad_idx]
            if d.categorical:
                k = len(d.choices)
                # weighted category counts with +1 prior
                lg = np.bincount(good.astype(int), minlength=k) + 1.0
                bg = np.bincount(bad.astype(int), minlength=k) + 1.0
                lg, bg = lg / lg.sum(), bg / bg.sum()
                cands = self.rng.choice(k, size=self.n_candidates, p=lg)
                best = cands[np.argmax(lg[cands] / bg[cands])]
                out[d.key] = d.choices[int(best)]
            else:
                sigma_g = max(np.std(good), 1.0 / max(len(good), 1), 1e-3)
                sigma_b = max(np.std(bad), 1.0 / max(len(bad), 1), 1e-3) if len(bad) else 1.0
                # candidates from the good mixture (plus a uniform prior draw)
                centers = self.rng.choice(good, size=self.n_candidates)
                cands = np.clip(
                    centers + self.rng.normal(0, sigma_g, self.n_candidates), 0, 1
                )
                cands[0] = self.rng.uniform()  # exploration

                def parzen(x, pts, sigma):
                    if len(pts) == 0:
                        return np.ones_like(x)
                    diffs = (x[:, None] - pts[None, :]) / sigma
                    return np.exp(-0.5 * diffs**2).mean(axis=1) / sigma + 1e-12

                score = parzen(cands, good, sigma_g) / parzen(cands, bad, sigma_b)
                out[d.key] = d.from_unit(float(cands[np.argmax(score)]))
        return out


# --- median pruner -----------------------------------------------------------


class MedianPruner:
    """Prune a trial whose intermediate value is worse than the median of
    completed trials' values at the same epoch (optuna's MedianPruner)."""

    def __init__(
        self,
        n_startup_trials: int = 3,
        n_warmup_epochs: int = 0,
        direction: str = "minimize",
    ):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_epochs = n_warmup_epochs
        self.sign = 1.0 if direction == "minimize" else -1.0
        self.curves: Dict[int, List[float]] = {}
        self.completed: List[int] = []

    def report(self, trial: int, epoch: int, value: float):
        curve = self.curves.setdefault(trial, [])
        while len(curve) <= epoch:
            curve.append(float("nan"))
        curve[epoch] = self.sign * float(value)

    def complete(self, trial: int):
        self.completed.append(trial)

    def should_prune(self, trial: int, epoch: int) -> bool:
        if epoch < self.n_warmup_epochs:
            return False
        if len(self.completed) < self.n_startup_trials:
            return False
        peers = [
            self.curves[t][epoch]
            for t in self.completed
            if t in self.curves and len(self.curves[t]) > epoch
            and np.isfinite(self.curves[t][epoch])
        ]
        if not peers:
            return False
        mine = self.curves.get(trial, [])
        if len(mine) <= epoch or not np.isfinite(mine[epoch]):
            return False
        return mine[epoch] > float(np.median(peers))


class PruningCallback(Callback):
    """Reports the monitored metric to the pruner each epoch; requests a stop
    when the pruner says so."""

    def __init__(self, pruner: MedianPruner, trial: int, monitor: str = "val/loss"):
        self.pruner = pruner
        self.trial = trial
        self.monitor = monitor
        self.pruned = False
        self._epoch = 0

    def on_train_epoch_end(self, trainer, state, logs):
        value = logs.get(self.monitor)
        epoch = self._epoch
        self._epoch += 1
        if value is None:
            return None
        self.pruner.report(self.trial, epoch, float(value))
        if self.pruner.should_prune(self.trial, epoch):
            self.pruned = True
            print(f"[sweeper] trial {self.trial} pruned at epoch {epoch}")
            return True
        return None


def build_sampler(search_cfg: Dict):
    params = dict(search_cfg.get("params", {}))
    seed = int(search_cfg.get("seed", 0))
    direction = search_cfg.get("direction", "minimize")
    kind = search_cfg.get("sampler", "random")
    if kind == "tpe":
        return TPESampler(
            params,
            seed=seed,
            n_startup_trials=int(search_cfg.get("n_startup_trials", 5)),
            gamma=float(search_cfg.get("gamma", 0.25)),
            direction=direction,
        )
    return RandomSampler(params, seed=seed)


def build_pruner(search_cfg: Dict) -> Optional[MedianPruner]:
    pr = search_cfg.get("pruner")
    if not pr or pr.get("type") not in ("median",):
        return None
    return MedianPruner(
        n_startup_trials=int(pr.get("n_startup_trials", 3)),
        n_warmup_epochs=int(pr.get("n_warmup_epochs", 0)),
        direction=search_cfg.get("direction", "minimize"),
    )
