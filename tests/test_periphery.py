"""Config-periphery parity: debug overlays, callbacks group, logger
backends, TPE sweeper + median pruner, reformat script (VERDICT round-1
"What's missing" items 1-5)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(ROOT))

from audiodiffuser_tpu.config import compose


# --- debug overlays (reference configs/debug/{fdr,limit,overfit}.yaml) -------


def test_debug_fdr_overlay():
    cfg = compose(str(ROOT / "configs"), "train", ["debug=fdr"])
    assert cfg.trainer.fast_dev_run is True
    assert cfg.debug.debug_nans is True  # inherits debug/default


def test_debug_limit_overlay():
    cfg = compose(str(ROOT / "configs"), "train", ["debug=limit"])
    assert cfg.trainer.limit_train_batches == 0.01
    assert cfg.trainer.limit_val_batches == 0.05
    assert cfg.trainer.limit_test_batches == 0.05
    assert cfg.trainer.max_epochs == 3


def test_debug_overfit_overlay():
    cfg = compose(str(ROOT / "configs"), "train", ["debug=overfit"])
    assert cfg.trainer.overfit_batches == 3


def test_fractional_limit_resolution():
    from audiodiffuser_tpu.training.trainer import _resolve_limit

    assert _resolve_limit(0.01, 500) == 5
    assert _resolve_limit(0.001, 100) == 1  # never 0
    assert _resolve_limit(3, 500) == 3
    assert _resolve_limit(None, 500) is None


# --- callbacks group ----------------------------------------------------------


def test_callbacks_group_composes_and_translates():
    import train as train_mod

    cfg = compose(str(ROOT / "configs"), "train", [])
    kwargs, objects = train_mod.build_callbacks(cfg)
    assert kwargs["ckpt_every_n_epochs"] == 50
    assert any(type(o).__name__ == "ModelSummary" for o in objects)

    cfg = compose(str(ROOT / "configs"), "train", ["callbacks=none"])
    kwargs, objects = train_mod.build_callbacks(cfg)
    assert objects == []
    assert kwargs.get("progress_bar") is False


def test_callbacks_early_stopping_override():
    import train as train_mod

    cfg = compose(
        str(ROOT / "configs"),
        "train",
        ["callbacks.early_stopping.patience=2", "callbacks.early_stopping.min_delta=0.5"],
    )
    kwargs, _ = train_mod.build_callbacks(cfg)
    assert kwargs["early_stopping_patience"] == 2
    assert kwargs["early_stopping_min_delta"] == 0.5


def test_callback_hooks_fire():
    from audiodiffuser_tpu.training.callbacks import Callback, MetricHistory

    class StopAfterOne(Callback):
        def on_train_epoch_end(self, trainer, state, logs):
            return True

    hist = MetricHistory()
    hist.on_train_epoch_end(None, None, {"train/loss": 1.0})
    assert hist.history == [{"train/loss": 1.0}]
    assert StopAfterOne().on_train_epoch_end(None, None, {}) is True


# --- logger backends ----------------------------------------------------------


@pytest.mark.parametrize("name", ["comet", "mlflow", "neptune"])
def test_logger_config_composes(name):
    cfg = compose(str(ROOT / "configs"), "train", [f"logger={name}"])
    assert name in cfg.logger


@pytest.mark.parametrize(
    "cls_name", ["CometLogger", "MLFlowLogger", "NeptuneLogger"]
)
def test_logger_offline_fallback(tmp_path, cls_name):
    """Without the client package installed the backends archive metrics to
    a local jsonl instead of failing or silently dropping them."""
    import audiodiffuser_tpu.training.logging as L

    lg = getattr(L, cls_name)(str(tmp_path))
    lg.log_hyperparams({"a": 1})
    lg.log_metrics({"train/loss": 0.5}, step=3)
    lg.finalize()
    offline = list(tmp_path.glob("*_offline/metrics.jsonl"))
    assert len(offline) == 1
    rec = json.loads(offline[0].read_text().splitlines()[0])
    assert rec["step"] == 3 and rec["train/loss"] == 0.5


def test_csv_logger_appends_across_restart(tmp_path):
    """Crash-resume into the same output dir must append to metrics.csv,
    not truncate the prior run's history (observed: a resumed soak lost
    21.8k steps of metrics)."""
    from audiodiffuser_tpu.training.logging import CSVLogger

    l1 = CSVLogger(str(tmp_path))
    l1.log_metrics({"train/loss": 1.0}, 10)
    l1.log_metrics({"train/loss": 0.9, "val/loss": 0.8}, 20)
    l2 = CSVLogger(str(tmp_path))  # restart
    l2.log_metrics({"train/loss": 0.85}, 30)
    rows = (tmp_path / "csv" / "metrics.csv").read_text().splitlines()
    assert len(rows) == 4
    assert rows[1].startswith("10") and rows[3].startswith("30")
    assert "val/loss" in rows[0]


def test_many_loggers_includes_all_seven_minus_csv():
    cfg = compose(str(ROOT / "configs"), "train", ["logger=many_loggers"])
    assert set(cfg.logger) == {"csv", "tensorboard", "wandb", "comet", "mlflow", "neptune"}


# --- TPE sweeper + median pruner -----------------------------------------------


def test_tpe_beats_random_on_quadratic():
    """TPE should concentrate samples near the optimum of a smooth 1-D
    objective faster than random search."""
    from audiodiffuser_tpu.training.sweeper import RandomSampler, TPESampler

    spec = {"x": {"low": 0.0, "high": 1.0}}
    f = lambda x: (x - 0.3) ** 2

    def run(sampler, n=40):
        hist = []
        for _ in range(n):
            p = sampler.suggest(hist)
            hist.append((p, f(p["x"])))
        return min(v for _, v in hist)

    tpe_best = run(TPESampler(spec, seed=0, n_startup_trials=8))
    assert tpe_best < 2e-3

    # concentration: later TPE draws cluster around the optimum
    s = TPESampler(spec, seed=0, n_startup_trials=8)
    hist = []
    for _ in range(40):
        p = s.suggest(hist)
        hist.append((p, f(p["x"])))
    first = np.mean([abs(p["x"] - 0.3) for p, _ in hist[:10]])
    last = np.mean([abs(p["x"] - 0.3) for p, _ in hist[-10:]])
    assert last < first


def test_tpe_categorical_concentrates():
    from audiodiffuser_tpu.training.sweeper import TPESampler

    spec = {"c": {"choices": ["a", "b", "c"]}}
    score = {"a": 1.0, "b": 0.1, "c": 1.0}
    s = TPESampler(spec, seed=1, n_startup_trials=6)
    hist = []
    for _ in range(30):
        p = s.suggest(hist)
        hist.append((p, score[p["c"]]))
    tail = [p["c"] for p, _ in hist[-10:]]
    assert tail.count("b") >= 6


def test_tpe_log_scale_respects_bounds():
    from audiodiffuser_tpu.training.sweeper import TPESampler

    spec = {"lr": {"low": 1e-5, "high": 1e-2, "log": True}}
    s = TPESampler(spec, seed=2, n_startup_trials=3)
    hist = []
    for _ in range(20):
        p = s.suggest(hist)
        assert 1e-5 * 0.999 <= p["lr"] <= 1e-2 * 1.001
        hist.append((p, abs(np.log(p["lr"]) - np.log(3e-4))))


def test_median_pruner():
    from audiodiffuser_tpu.training.sweeper import MedianPruner

    pr = MedianPruner(n_startup_trials=2, n_warmup_epochs=0)
    # two completed trials with good curves
    for t, base in ((0, 0.5), (1, 0.6)):
        for e in range(3):
            pr.report(t, e, base - 0.1 * e)
        pr.complete(t)
    # a bad trial should prune, a good one should not
    pr.report(2, 0, 5.0)
    assert pr.should_prune(2, 0)
    pr.report(3, 0, 0.1)
    assert not pr.should_prune(3, 0)
    # before startup trials complete, never prune
    fresh = MedianPruner(n_startup_trials=2)
    fresh.report(0, 0, 100.0)
    assert not fresh.should_prune(0, 0)


def test_pruning_callback_requests_stop():
    from audiodiffuser_tpu.training.sweeper import MedianPruner, PruningCallback

    pr = MedianPruner(n_startup_trials=1, n_warmup_epochs=0)
    pr.report(0, 0, 0.1)
    pr.complete(0)
    cb = PruningCallback(pr, trial=1, monitor="val/loss")
    assert cb.on_train_epoch_end(None, None, {"val/loss": 9.0}) is True
    assert cb.pruned


def test_optuna_config_composes():
    cfg = compose(str(ROOT / "configs"), "train", ["hparams_search=optuna"])
    assert cfg.hparams_search.sampler == "tpe"
    assert cfg.hparams_search.pruner.type == "median"
    from audiodiffuser_tpu.training.sweeper import build_pruner, build_sampler

    assert type(build_sampler(cfg.hparams_search.to_dict())).__name__ == "TPESampler"
    assert build_pruner(cfg.hparams_search.to_dict()) is not None


# --- reformat script ------------------------------------------------------------


def test_reformat_wav_tree(tmp_path):
    from audiodiffuser_tpu.data.sc09 import load_wav, save_wav

    src = tmp_path / "src" / "speakerA"
    src.mkdir(parents=True)
    stereoish = np.stack([np.ones(100, np.float32) * 0.5, np.zeros(100, np.float32)], -1)
    save_wav(str(src / "x.wav"), stereoish.mean(axis=-1), 16000)
    out = tmp_path / "dst"
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts/audio_preprocessing/reformat.py"),
         str(tmp_path / "src"), str(out), "--input-format", "wav"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    got = out / "speakerA" / "x.wav"
    assert got.exists()
    sr, audio = load_wav(str(got))
    assert sr == 16000 and audio.ndim == 1


def test_csv_logger_on_resume_drops_rows_beyond_restored_step(tmp_path):
    """Crash-after-checkpoint: rows logged past the restored step must be
    dropped on resume so those steps aren't logged twice (advisor r3)."""
    from audiodiffuser_tpu.training.logging import CSVLogger

    l1 = CSVLogger(str(tmp_path))
    for step in (10, 20, 30, 40):
        l1.log_metrics({"train/loss": float(step)}, step)
    # restart: checkpoint was written at step 20, crash happened after 40
    l2 = CSVLogger(str(tmp_path))
    l2.on_resume(20)
    l2.log_metrics({"train/loss": 99.0}, 30)
    rows = (tmp_path / "csv" / "metrics.csv").read_text().strip().splitlines()
    steps = [int(float(r.split(",")[0])) for r in rows[1:]]
    assert steps == [10, 20, 30]
    # the re-logged step 30 carries the new value, not the stale one
    header = rows[0].split(",")
    loss_col = header.index("train/loss")
    assert float(rows[-1].split(",")[loss_col]) == 99.0


def test_extras_group(tmp_path):
    """extras config group parity (reference src/utils/utils.py:12-39)."""
    import pytest

    from audiodiffuser_tpu.config import compose
    from audiodiffuser_tpu.utils import extras, should_print_config

    cfg = compose("configs", "train", ["experiment=example"])
    assert dict(cfg.extras) == {
        "ignore_warnings": False,
        "enforce_tags": True,
        "print_config": True,
    }
    extras(cfg)  # tags present -> passes
    assert should_print_config(cfg)

    cfg2 = compose("configs", "train", ["experiment=example", "tags=[]"])
    with pytest.raises(ValueError, match="enforce_tags"):
        extras(cfg2)

    cfg3 = compose(
        "configs", "train", ["experiment=example", "extras.print_config=False"]
    )
    assert not should_print_config(cfg3)

    import warnings

    with warnings.catch_warnings():
        cfg4 = compose(
            "configs", "train",
            ["experiment=example", "extras.ignore_warnings=True"],
        )
        extras(cfg4)
        with warnings.catch_warnings(record=True) as rec:
            warnings.warn("should be suppressed")
        assert rec == []
