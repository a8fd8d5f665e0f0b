#!/usr/bin/env python
"""Training entry point.

Capability parity with the reference ``src/train.py``: compose config,
seed, instantiate datamodule/model/trainer/loggers, fit (optionally resume
from ``ckpt_path``), optionally test, return the optimized metric for
hyperparameter sweeps. Supports ``--multirun`` with comma-separated override
values like the reference's hydra sweeps (README.md:54-58).

Usage:
    python train.py experiment=sc09/diffunet_complex_sc09 [key=value ...]
    python train.py --multirun experiment=... model.optimizer.learning_rate=1e-4,4e-5
"""

from __future__ import annotations

import datetime
import os
import sys
from pathlib import Path

ROOT = Path(__file__).parent
sys.path.insert(0, str(ROOT))

# honor JAX_PLATFORMS even when a site customisation pins another platform
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from audiodiffuser_tpu.config import compose, expand_multirun, instantiate
from audiodiffuser_tpu.utils import (
    extras,
    get_metric_value,
    print_config_tree,
    seed_everything,
    should_print_config,
    task_wrapper,
)


def build_logger(cfg, output_dir):
    from audiodiffuser_tpu.training.logging import (
        BaseLogger,
        CometLogger,
        CSVLogger,
        MLFlowLogger,
        MultiLogger,
        NeptuneLogger,
        TensorBoardLogger,
        WandbLogger,
    )

    loggers = []
    for name, sub in (cfg.get("logger") or {}).items():
        if sub is None:
            continue
        if name == "csv":
            loggers.append(CSVLogger(str(output_dir)))
        elif name == "tensorboard":
            loggers.append(TensorBoardLogger(str(output_dir)))
        elif name == "wandb":
            loggers.append(WandbLogger(str(output_dir), **{k: v for k, v in sub.items() if k in ("project", "group", "tags")}))
        elif name == "comet":
            loggers.append(CometLogger(str(output_dir), project_name=sub.get("project_name", "audiodiffuser-tpu")))
        elif name == "mlflow":
            loggers.append(MLFlowLogger(str(output_dir), tracking_uri=sub.get("tracking_uri", ""), experiment_name=sub.get("experiment_name", "audiodiffuser-tpu")))
        elif name == "neptune":
            loggers.append(NeptuneLogger(str(output_dir), project=sub.get("project", "")))
    return MultiLogger(loggers) if loggers else BaseLogger()


def build_callbacks(cfg):
    """Translate the ``callbacks`` config group into (trainer_kwargs,
    callback_objects). Known sections map onto Trainer mechanics; sections
    with a ``_target_`` instantiate Callback hook objects (reference
    instantiate_callbacks, src/utils/instantiators.py:13-30)."""
    kwargs = {}
    objects = []
    for name, sub in (cfg.get("callbacks") or {}).items():
        if sub is None:
            continue
        if isinstance(sub, dict) and "_target_" in sub:
            objects.append(instantiate(dict(sub)))
            continue
        if name == "model_checkpoint":
            if sub.get("every_n_epochs") is not None:
                kwargs["ckpt_every_n_epochs"] = int(sub["every_n_epochs"])
            if sub.get("keep_last") is not None:
                kwargs["ckpt_keep_last"] = int(sub["keep_last"])
        elif name == "early_stopping":
            if sub.get("patience") is not None:
                kwargs["early_stopping_patience"] = int(sub["patience"])
                kwargs["early_stopping_min_delta"] = float(sub.get("min_delta", 0.0))
        elif name == "progress_bar":
            kwargs["progress_bar"] = bool(sub.get("enabled", True))
    if "callbacks" in cfg and not cfg.get("callbacks"):
        kwargs["progress_bar"] = False  # callbacks=none also drops the bar
    return kwargs, objects


def build_trainer_and_task(cfg, output_dir):
    from audiodiffuser_tpu.training.trainer import Trainer

    model_cfg = dict(cfg.model)
    optimizer_cfg = dict(model_cfg.pop("optimizer"))
    scheduler_cfg = model_cfg.pop("scheduler", None)
    # trainer.precision: 'bf16-mixed' runs the net in bfloat16 activations
    # with fp32 params/optimizer (the reference's `+trainer.precision=16-mixed`)
    precision = str(cfg.get("trainer", {}).get("precision", "")).lower()
    if precision in ("bf16", "bf16-mixed", "16-mixed") and "net" in model_cfg:
        model_cfg["net"] = dict(model_cfg["net"])
        model_cfg["net"]["dtype"] = "bfloat16"
    task = instantiate(model_cfg)
    if scheduler_cfg:
        # an optax schedule replaces the scalar learning rate, e.g.
        # scheduler: {_target_: optax.cosine_decay_schedule,
        #             init_value: 1e-4, decay_steps: 100000}
        optimizer_cfg["learning_rate"] = instantiate(scheduler_cfg)
    optimizer = instantiate(optimizer_cfg)

    # callbacks group fills defaults; explicit trainer.* keys win
    trainer_cfg, callback_objects = build_callbacks(cfg)
    trainer_cfg.update(
        {
            k: v
            for k, v in dict(cfg.get("trainer", {})).items()
            if k
            in (
                "max_epochs",
                "min_epochs",
                "max_steps",
                "log_every_n_steps",
                "check_val_every_n_epoch",
                "limit_train_batches",
                "limit_val_batches",
                "limit_test_batches",
                "overfit_batches",
                "ckpt_every_n_epochs",
                "ckpt_last_every_n_epochs",
                "fast_dev_run",
                "accumulate_grad_batches",
                "early_stopping_patience",
                "early_stopping_min_delta",
                "progress_bar",
                "param_sharding",
                "fsdp_min_size",
                "tp_axis_size",
                "sequence_parallel",
                "ckpt_keep_last",
            )
        }
    )
    logger = build_logger(cfg, output_dir)
    trainer = Trainer(
        callbacks=callback_objects + _EXTRA_CALLBACKS,
        task=task,
        optimizer=optimizer,
        logger=logger,
        seed=cfg.get("seed") or 0,
        output_dir=str(output_dir),
        **trainer_cfg,
    )
    return trainer, task, logger


def apply_debug_config(cfg, output_dir):
    """jax-native debug/profiling toggles (configs/debug/*): NaN detection
    replaces torch detect_anomaly; the jax profiler replaces the Lightning
    profilers (SURVEY §5.1-5.2)."""
    dbg = cfg.get("debug")
    if not dbg:
        return None
    import jax

    if dbg.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)
    if dbg.get("disable_jit"):
        jax.config.update("jax_disable_jit", True)
    if dbg.get("profile"):
        trace_dir = str(Path(output_dir) / "profile")
        jax.profiler.start_trace(trace_dir)
        return trace_dir
    return None


@task_wrapper
def train(cfg):
    extras(cfg)
    seed_everything(cfg.get("seed"))
    output_dir = Path(cfg.paths.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    print_config_tree(
        cfg,
        save_to=str(output_dir / "config.json"),
        quiet=not should_print_config(cfg),
    )
    trace_dir = apply_debug_config(cfg, output_dir)

    datamodule = instantiate(cfg.data)
    trainer, task, logger = build_trainer_and_task(cfg, output_dir)
    logger.log_hyperparams(cfg.to_dict())

    metrics = {}
    state = None
    if cfg.get("train", True):
        state = trainer.fit(datamodule, ckpt_path=cfg.get("ckpt_path"))
        metrics["val/loss"] = trainer.best_val_loss
    if cfg.get("test", False):
        if state is None and cfg.get("ckpt_path"):
            first = next(iter(datamodule.train_dataloader()))
            state = trainer.init_state(first)
            state = trainer.restore_checkpoint(cfg.ckpt_path, state)
        metrics.update(trainer.test(state, datamodule))
    if trace_dir:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace written to {trace_dir}")
    logger.finalize()
    return metrics


# extra Callback objects appended to every trainer built by train() — the
# sweeper injects its PruningCallback here (objects can't ride the yaml cfg)
_EXTRA_CALLBACKS: list = []


def run_hparams_search(base_overrides, stamp):
    """Hyperparameter sweeper: random or TPE sampler + optional median
    pruner (replaces the reference's hydra-optuna sweeper; see
    training/sweeper.py)."""
    from audiodiffuser_tpu.training.sweeper import (
        PruningCallback,
        build_pruner,
        build_sampler,
    )

    probe = compose(str(ROOT / "configs"), "train", base_overrides)
    search = probe.hparams_search
    sampler = build_sampler(search.to_dict())
    pruner = build_pruner(search.to_dict())
    best_val, best_params = None, None
    sign = -1.0 if search.get("direction", "minimize") == "maximize" else 1.0
    history = []  # (params_dict, value) pairs fed back to the sampler
    for trial in range(search["n_trials"]):
        params = sampler.suggest(history)
        trial_over = base_overrides + [f"{k}={v}" for k, v in params.items()]
        cfg = compose(str(ROOT / "configs"), "train", trial_over)
        cfg.paths.output_dir = str(
            Path(cfg.paths.log_dir)
            / cfg.get("task_name", "train")
            / f"search/{stamp}/{trial}"
        )
        prune_cb = None
        if pruner is not None:
            prune_cb = PruningCallback(
                pruner, trial, monitor=cfg.get("optimized_metric", "val/loss")
            )
            _EXTRA_CALLBACKS.append(prune_cb)
        try:
            metrics = train(cfg)
        finally:
            if prune_cb is not None:
                _EXTRA_CALLBACKS.remove(prune_cb)
        val = get_metric_value(metrics, cfg.get("optimized_metric"))
        pruned = prune_cb.pruned if prune_cb else False
        if pruner is not None and not pruned:
            pruner.complete(trial)
        history.append((params, None if pruned else val))
        print(f"[search] trial {trial}: {params} -> {val}{' (pruned)' if pruned else ''}")
        if (
            val is not None
            and not pruned
            and (best_val is None or sign * val < sign * best_val)
        ):
            best_val, best_params = val, params
    print(f"[search] best {probe.get('optimized_metric')}={best_val} with {best_params}")
    return best_val


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    multirun = "--multirun" in argv or "-m" in argv
    overrides = [a for a in argv if not a.startswith("-")]

    stamp0 = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    if any(o.startswith("hparams_search=") for o in overrides):
        return run_hparams_search(overrides, stamp0)

    jobs = expand_multirun(overrides) if multirun else [overrides]
    results = []
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    for i, job in enumerate(jobs):
        cfg = compose(str(ROOT / "configs"), "train", job)
        if not cfg.paths.get("output_dir"):
            sub = f"multirun/{stamp}/{i}" if multirun else f"runs/{stamp}"
            cfg.paths.output_dir = str(
                Path(cfg.paths.log_dir) / cfg.get("task_name", "train") / sub
            )
        elif multirun:
            # explicit output_dir + sweep: one subdir per job
            cfg.paths.output_dir = str(Path(cfg.paths.output_dir) / str(i))
        metrics = train(cfg)
        results.append(get_metric_value(metrics, cfg.get("optimized_metric")))
    return results[0] if len(results) == 1 else results


if __name__ == "__main__":
    main()
