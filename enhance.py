#!/usr/bin/env python
"""Standalone enhancement (serving) entry point: denoise wav files with a
trained DiffusionEnhancementTask checkpoint.

Builds the task from the experiment config alone, restores params (or an EMA
snapshot via model.ema_ckpt_path), runs ``task.enhance`` on every input wav
(cropped/zero-padded to the model's window) and writes ``<name>_enhanced.wav``
next to the outputs dir.

Usage:
    python enhance.py experiment=sc09/enhunet_sc09 \
        ckpt_path=<run>/checkpoints/last input_dir=./noisy \
        paths.output_dir=./enhanced [batch_size=8] [seed=0]
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

from audiodiffuser_tpu.config import compose
from audiodiffuser_tpu.utils import print_config_tree, seed_everything, task_wrapper


@task_wrapper
def enhance(cfg):
    assert cfg.get("ckpt_path") or cfg.get("model", {}).get(
        "ema_ckpt_path"
    ), "ckpt_path (or model.ema_ckpt_path) is required"
    assert cfg.get("input_dir"), "input_dir with wav files is required"
    paths = sorted(Path(cfg.input_dir).glob("*.wav"))
    assert paths, f"no wav files in {cfg.input_dir}"
    seed_everything(cfg.get("seed"))

    import jax
    import numpy as np

    from audiodiffuser_tpu.data.sc09 import load_wav, save_wav
    from train import build_trainer_and_task

    output_dir = Path(cfg.paths.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    print_config_tree(cfg, save_to=str(output_dir / "config.json"))

    trainer, task, logger = build_trainer_and_task(cfg, output_dir)
    assert hasattr(task, "enhance"), (
        f"experiment's task ({type(task).__name__}) has no enhance(); use an "
        "enhancement experiment (e.g. experiment=sc09/enhunet_sc09)"
    )

    audio_len = (task.generated_frame_length - 1) * task.hop_length
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

    batch_size = int(cfg.get("batch_size", min(len(paths), 8)))
    enhance_fn = jax.jit(task.enhance)
    key = jax.random.key(cfg.get("seed") or 0)
    out = output_dir / "enhanced"
    out.mkdir(exist_ok=True)
    sr = task.audio_sample_rate

    def to_window(x):
        x = np.asarray(x, np.float32)
        if len(x) >= audio_len:
            return x[:audio_len]
        return np.pad(x, (0, audio_len - len(x)))

    t0 = time.time()
    for i in range(0, len(paths), batch_size):
        chunk = paths[i : i + batch_size]
        wavs = []
        for p in chunk:
            loaded = load_wav(str(p))
            # (audio, sr) or (sr, audio) tolerant unpack
            audio = loaded[0] if hasattr(loaded[0], "__len__") else loaded[1]
            wavs.append(to_window(audio))
        # static batch shape: pad the tail chunk up to batch_size
        n_real = len(wavs)
        while len(wavs) < batch_size:
            wavs.append(np.zeros(audio_len, np.float32))
        key, sub = jax.random.split(key)
        enhanced = jax.device_get(enhance_fn(params, np.stack(wavs), sub))
        for p, e in zip(chunk, enhanced[:n_real]):
            save_wav(str(out / f"{p.stem}_enhanced.wav"), e, sr)
    dt = time.time() - t0
    print(f"enhanced {len(paths)} files in {dt:.1f}s -> {out}")
    return {"files_per_sec": len(paths) / dt}


def main(argv=None):
    import datetime

    overrides = list(sys.argv[1:] if argv is None else argv)
    overrides = [
        (f"+{o}" if o.startswith(("input_dir=", "batch_size=")) else o)
        for o in overrides
    ]
    cfg = compose(str(ROOT / "configs"), "eval", overrides)
    if not cfg.paths.get("output_dir"):
        stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        cfg.paths.output_dir = str(Path(cfg.paths.log_dir) / "enhance" / stamp)
    return enhance(cfg)


if __name__ == "__main__":
    main()
