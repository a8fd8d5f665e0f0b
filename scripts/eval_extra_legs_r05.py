#!/usr/bin/env python
"""Round-5 follow-up eval legs on the converged SC09 checkpoint.

Two legs the round-4 grid didn't cover, both at the FAD-winning guidance
scale (cond_scale 2.0, 32-step Heun, phema sigma_rel 0.100 @ 87500):

  * ``eval_heun32_cfg2.0_seedB`` — bf16 with a DIFFERENT sampling seed.
    FAD(seedA, seedB) is the same-model seed-to-seed floor: the value the
    direct int8-vs-bf16 gate FAD would take if quantization were perfectly
    transparent. Makes the gate's REJECT/ACCEPT interpretable as a
    distribution shift rather than estimator noise.
  * ``eval_heun32_int8ps`` — W8A8 with PER-STEP activation scales
    (calibrate_int8_scales per_step=True, the new default): re-adjudicates
    the int8 serving gate after the timestep-aware calibration fix.

Reference capability: the sampler grid-search workflow of
/root/reference/configs/experiment/sc09_inference/ (README.md:54-58).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(ROOT))

WORK = Path(os.environ.get("WORK", "/tmp/soak_r04"))
DATA = os.environ.get("DATA", "/tmp/sc09_soak_r03")
CKPT = os.environ.get("CKPT", "/tmp/soak_r03/train/checkpoints/last")
SAMPLES = int(os.environ.get("SAMPLES", "2048"))
HEUN_EXP = "sc09_inference/diffunet_complex_sc09_phema_eval_heun"
CS = os.environ.get("CS") or (WORK / "best_cond_scale.txt").read_text().strip()


def log(*a):
    print(f"[extra {time.strftime('%H:%M:%S')}]", *a, flush=True)


def recon_for_std(std: str) -> str:
    cands = sorted(
        WORK.glob(f"phema/recon_phema-{std}_*"),
        key=lambda p: int(p.name.rsplit("_", 1)[1]),
    )
    return str(cands[-1])


def leg_complete(leg: str) -> bool:
    d = WORK / leg / "test_samples"
    return d.is_dir() and len(list(d.glob("*.wav"))) >= SAMPLES


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodiffuser_tpu.config import compose, instantiate
    from audiodiffuser_tpu.data.sc09 import save_wav
    from audiodiffuser_tpu.utils import seed_everything
    from train import build_trainer_and_task

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

    def build(leg: str, overrides=()):
        cfg = compose(str(ROOT / "configs"), "eval", [
            f"experiment={HEUN_EXP}",
            f"data.data_dir={DATA}",
            f"ckpt_path={CKPT}",
            f"model.ema_ckpt_path={recon_for_std('0.100')}",
            f"model.total_test_samples={SAMPLES}",
            f"paths.output_dir={WORK / leg}",
            "extras.print_config=false",
            f"model.sampler.cond_scale={CS}",
            *overrides,
        ])
        seed_everything(cfg.get("seed"))
        datamodule = instantiate(cfg.data)
        trainer, task, logger = build_trainer_and_task(cfg, WORK / leg)
        return cfg, datamodule, trainer, task

    # ---- leg 1: bf16, different sampling seed ------------------------------
    leg = f"eval_heun32_cfg{CS}_seedB"
    if leg_complete(leg):
        log(f"{leg} already complete")
    else:
        cfg, dm, trainer, task = build(leg)
        first = next(iter(dm.test_dataloader()))
        state = trainer.init_state(first)
        like_params = state.params
        del state
        params = trainer.load_ema_params(recon_for_std("0.100"), like_params)
        sample = jax.jit(task.make_sample_fn())
        batch = dm.batch_size
        classes = task.test_classes(batch)
        sr = task.audio_sample_rate
        out = WORK / leg / "test_samples"
        out.mkdir(parents=True, exist_ok=True)
        done = len(list(out.glob("*.wav"))) // batch
        # seed offset 1002: a key chain disjoint from the grid's (seed + 2)
        key = jax.random.key(int(cfg.get("seed") or 0) + 1002)
        t0 = time.time()
        for it in range(max(SAMPLES // batch, 1)):
            key, sub = jax.random.split(key)
            if it < done:
                continue
            audio = jax.device_get(sample(params, sub, classes))
            for j in range(audio.shape[0]):
                save_wav(str(out / f"test_{int(classes[j])}_{it * batch + j}.wav"),
                         np.asarray(audio[j, :sr]), sr)
        log(f"{leg}: {SAMPLES} wavs in {time.time() - t0:.0f}s")
        (WORK / leg / "leg_meta.json").write_text(json.dumps(
            {"cond_scale": float(CS), "seed_offset": 1002,
             "ema_params": recon_for_std("0.100")}, indent=1))

    # ---- leg 2: int8 with per-step activation scales ------------------------
    leg = "eval_heun32_int8ps"
    if leg_complete(leg):
        log(f"{leg} already complete")
    else:
        os.environ["ADT_INT8"] = "1"
        os.environ["ADT_INT8_PER_STEP"] = "1"
        try:
            _, dm, trainer, _task = build(leg)
            first = next(iter(dm.test_dataloader()))
            like_params = trainer.init_state(first).params
            t0 = time.time()
            metrics = trainer.test(like_params, dm)
            log(f"{leg}: trainer.test -> {metrics} ({time.time() - t0:.0f}s)")
        finally:
            os.environ.pop("ADT_INT8", None)
        (WORK / leg / "leg_meta.json").write_text(json.dumps(
            {"cond_scale": float(CS), "int8": True, "per_step_scales": True},
            indent=1))

    log("EXTRA_LEGS_DONE")


if __name__ == "__main__":
    main()
