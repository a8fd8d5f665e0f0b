#!/usr/bin/env python
"""Standalone generation (serving) entry point: sample wavs from a checkpoint
without a dataset.

Unlike eval.py (which mirrors the reference's trainer.test harness and needs
the datamodule), this builds the task from the experiment config alone,
restores params (or an EMA snapshot via model.ema_ckpt_path), and writes
``num_samples`` wavs.

Usage:
    python generate.py experiment=sc09/diffunet_complex_sc09 \
        ckpt_path=<run>/checkpoints/last num_samples=64 batch_size=16 \
        paths.output_dir=./generated [seed=0]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).parent
sys.path.insert(0, str(ROOT))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from audiodiffuser_tpu.config import compose, instantiate
from audiodiffuser_tpu.utils import print_config_tree, seed_everything, task_wrapper


@task_wrapper
def generate(cfg):
    assert cfg.get("ckpt_path") or cfg.get("model", {}).get(
        "ema_ckpt_path"
    ), "ckpt_path (or model.ema_ckpt_path) is required"
    seed_everything(cfg.get("seed"))

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from audiodiffuser_tpu.data.sc09 import save_wav
    from audiodiffuser_tpu.training.trainer import Trainer
    from train import build_trainer_and_task

    output_dir = Path(cfg.paths.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    print_config_tree(cfg, save_to=str(output_dir / "config.json"))

    trainer, task, logger = build_trainer_and_task(cfg, output_dir)

    # fabricate an init batch purely from the task's shape config
    if hasattr(task, "hop_length") and hasattr(task, "generated_frame_length"):
        audio_len = (task.generated_frame_length - 1) * task.hop_length
    else:
        audio_len = getattr(task, "generated_sample_length", 16384)
    batch = {
        "audio": np.zeros((1, audio_len), np.float32),
        "label": np.zeros((1,), np.int32),
    }
    state = trainer.init_state(batch)
    params = state.params
    if cfg.get("ckpt_path"):
        state = trainer.restore_checkpoint(cfg.ckpt_path, state)
        params = state.params
    if task.ema_ckpt_path:
        params = trainer.load_ema_params(task.ema_ckpt_path, params)

    num_samples = int(cfg.get("num_samples", 16))
    batch_size = int(cfg.get("batch_size", min(num_samples, 16)))

    from audiodiffuser_tpu.ops.quant import int8_enabled

    if int8_enabled() and hasattr(task, "calibrate_int8_scales"):
        print("[generate] int8: calibrating static activation scales")
        task.calibrate_int8_scales(jax.device_get(params), jax.random.key(7))

    sample_fn = jax.jit(task.make_sample_fn())
    key = jax.random.key(cfg.get("seed") or 0)

    out = output_dir / "samples"
    out.mkdir(exist_ok=True)
    sr = task.audio_sample_rate
    classes = task.test_classes(batch_size)
    done = 0
    t0 = time.time()
    while done < num_samples:
        key, sub = jax.random.split(key)
        audio = jax.device_get(sample_fn(params, sub, classes))
        for j in range(min(batch_size, num_samples - done)):
            save_wav(str(out / f"gen_{int(classes[j])}_{done + j}.wav"), audio[j], sr)
        done += batch_size
    dt = time.time() - t0
    print(f"generated {num_samples} samples in {dt:.1f}s -> {out}")
    return {"samples_per_sec": num_samples / dt}


def main(argv=None):
    import datetime

    overrides = list(sys.argv[1:] if argv is None else argv)
    extra = []
    for key in ("num_samples", "batch_size"):
        # allow bare num_samples=N without + prefix
        overrides = [
            (f"+{o}" if o.startswith(f"{key}=") else o) for o in overrides
        ]
    cfg = compose(str(ROOT / "configs"), "eval", overrides + extra)
    if not cfg.paths.get("output_dir"):
        stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        cfg.paths.output_dir = str(Path(cfg.paths.log_dir) / "generate" / stamp)
    return generate(cfg)


if __name__ == "__main__":
    main()
