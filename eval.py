#!/usr/bin/env python
"""Evaluation / generation entry point.

Capability parity with the reference ``src/eval.py``: requires ``ckpt_path``,
instantiates the datamodule/model/trainer and runs the test-time generation
harness. Supports ``--multirun`` sampler grid search, e.g.::

    python eval.py --multirun ckpt_path=... \
        experiment=sc09_inference/diffunet_complex_sc09_eval_dpm \
        model.sampler.order=1,2,3
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
    print_config_tree,
    seed_everything,
    should_print_config,
    task_wrapper,
)
from train import apply_debug_config, build_trainer_and_task


@task_wrapper
def evaluate(cfg):
    assert cfg.get("ckpt_path"), "ckpt_path is required for evaluation"
    extras(cfg)
    seed_everything(cfg.get("seed"))
    output_dir = Path(cfg.paths.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    print_config_tree(
        cfg,
        save_to=str(output_dir / "config.json"),
        quiet=not should_print_config(cfg),
    )
    apply_debug_config(cfg, output_dir)

    datamodule = instantiate(cfg.data)
    trainer, task, logger = build_trainer_and_task(cfg, output_dir)

    first = next(iter(datamodule.test_dataloader()))
    state = trainer.init_state(first)
    state = trainer.restore_checkpoint(cfg.ckpt_path, state)
    metrics = trainer.test(state, datamodule)

    # optional quality metric: FAD of the generated set vs a reference dir
    # (enable with +fad_reference_dir=/path/to/real/wavs)
    fad_ref = cfg.get("fad_reference_dir")
    if fad_ref:
        from audiodiffuser_tpu.evaluation.fad import fad_between_dirs

        fad = fad_between_dirs(fad_ref, output_dir / "test_samples")
        print(f"FAD vs {fad_ref}: {fad:.4f}")
        metrics["test/fad"] = fad
        logger.log_metrics({"test/fad": fad}, 0)

    logger.finalize()
    return metrics


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    multirun = "--multirun" in argv or "-m" in argv
    overrides = [a for a in argv if not a.startswith("-")]

    jobs = expand_multirun(overrides) if multirun else [overrides]
    results = []
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    for i, job in enumerate(jobs):
        cfg = compose(str(ROOT / "configs"), "eval", job)
        if not cfg.paths.get("output_dir"):
            sub = f"multirun/{stamp}/{i}" if multirun else f"runs/{stamp}"
            cfg.paths.output_dir = str(
                Path(cfg.paths.log_dir) / cfg.get("task_name", "eval") / sub
            )
        elif multirun:
            cfg.paths.output_dir = str(Path(cfg.paths.output_dir) / str(i))
        results.append(evaluate(cfg))
    return results[0] if len(results) == 1 else results


if __name__ == "__main__":
    main()
