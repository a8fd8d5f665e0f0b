#!/usr/bin/env python
"""Round-5 matched-quality frontier extension.

The round-4/5 grid established UniPC-16 (cond_scale 2.0, FAD 434.66) as the
matched-quality serving winner: better FAD than the 32-Heun grid winner
(525.46) at 3.91x its steady-state throughput (PROFILE.md). Two questions
remain open on that frontier:

1. **Can UniPC go faster still?** The NFE frontier was only sampled at 16
   steps. This script adds UniPC-8/12/24: if 12 (or 8) still beats the
   32-Heun winner's FAD, the matched-quality serving rate rises
   proportionally; 24 shows whether quality is still NFE-limited at 16.
2. **Is cond_scale 2.0 optimal for UniPC?** The guidance sweep ran at
   32-Heun only, with a sharp minimum at 2.0 (1.5 -> 1907, 3.0 -> 2796).
   This script sweeps 1.75/2.25/2.5 at UniPC-16 under ONE compile
   (cond_scale is a traced operand, diffusion/formulations._cfg_apply).

All legs are 2048 samples from the converged-soak phema reconstruction
(sigma_rel 0.100, step 87500) with the exact leg-directory layout of
scripts/eval_grid_r04.py, so scripts/compute_fad.py + soak_quality_report.py
consume them unchanged. Legs are idempotent/resume-safe (whole completed
batches are skipped with the key chain advanced identically).

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
UNIPC_EXP = "sc09_inference/diffunet_complex_sc09_phema_eval_unipc"
CS_BASE = "2.0"  # the 32-Heun FAD winner; the sweep brackets it
CFG_SWEEP = ("1.75", "2.25", "2.5")
STEP_SWEEP = (8, 12, 24)


def log(*a):
    print(f"[frontier-ext {time.strftime('%H:%M:%S')}]", *a, flush=True)


def recon_for_std(std: str) -> str:
    cands = sorted(
        WORK.glob(f"phema/recon_phema-{std}_*"),
        key=lambda p: int(p.name.rsplit("_", 1)[1]),
    )
    if not cands:
        raise FileNotFoundError(f"no phema reconstruction for std {std}")
    return str(cands[-1])


def leg_complete(leg: str, n: int = None) -> bool:
    d = WORK / leg / "test_samples"
    return d.is_dir() and len(list(d.glob("*.wav"))) >= (n or SAMPLES)


def write_leg_metrics(leg: str, n_new: int, elapsed: float, meta: dict,
                      n_total: int):
    d = WORK / leg / "csv"
    d.mkdir(parents=True, exist_ok=True)
    sps = n_new / max(elapsed, 1e-9)
    (d / "metrics.csv").write_text(
        "step,test/num_samples,test/samples_per_sec\n" f"0,{n_total},{sps}\n")
    (WORK / leg / "leg_meta.json").write_text(json.dumps(meta | {
        "num_samples": n_total, "samples_per_sec": sps,
        "gen_samples": n_new, "gen_elapsed": elapsed}, indent=1))
    log(f"leg {leg}: {n_total} wavs, {sps:.2f} samples/s end-to-end  {meta}")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodiffuser_tpu.config import compose, instantiate
    from audiodiffuser_tpu.data.sc09 import save_wav
    from audiodiffuser_tpu.utils import seed_everything
    from train import build_trainer_and_task

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

    def build(leg: str, overrides=()):
        cfg = compose(str(ROOT / "configs"), "eval", [
            f"experiment={UNIPC_EXP}",
            f"data.data_dir={DATA}",
            f"ckpt_path={CKPT}",
            f"model.ema_ckpt_path={recon_for_std('0.100')}",
            f"model.total_test_samples={SAMPLES}",
            f"paths.output_dir={WORK / leg}",
            "extras.print_config=false",
            *overrides,
        ])
        seed_everything(cfg.get("seed"))
        datamodule = instantiate(cfg.data)
        trainer, task, logger = build_trainer_and_task(cfg, WORK / leg)
        return cfg, datamodule, trainer, task

    # ---- shared template params (random init; the EMA recon replaces them) --
    log("building unipc16 trainer + params template")
    cfg, datamodule, trainer, task = build("eval_unipc16_cfg_sweep",
                                           ["sampler_steps=16"])
    first = next(iter(datamodule.test_dataloader()))
    like_params = trainer.init_state(first).params
    batch_size = datamodule.batch_size
    seed = int(cfg.get("seed") or 0)
    params = trainer.load_ema_params(recon_for_std("0.100"), like_params)

    # ---- phase 1: UniPC-16 guidance sweep, ONE compile (traced cond_scale) --
    sample_cs = jax.jit(task.make_sample_fn(with_cond_scale=True))
    sr = task.audio_sample_rate
    classes = task.test_classes(batch_size)

    def gen_leg_cs(leg: str, cs: float):
        """Mirror eval_grid_r04.gen_leg_heun: Trainer.test's loop with
        cond_scale traced; identical RNG chain (seed+2) to the grid legs."""
        if leg_complete(leg):
            log(f"leg {leg} already complete; skipping")
            return
        out = WORK / leg / "test_samples"
        out.mkdir(parents=True, exist_ok=True)
        done_iters = len(list(out.glob("*.wav"))) // batch_size
        iterations = max(SAMPLES // batch_size, 1)
        key = jax.random.key(seed + 2)
        t0 = time.time()
        n_new = 0
        for it in range(iterations):
            key, sub = jax.random.split(key)
            if it < done_iters:
                continue
            audio = jax.device_get(
                sample_cs(params, sub, classes, jnp.float32(cs)))
            for j in range(audio.shape[0]):
                fname = f"test_{int(classes[j])}_{it * batch_size + j}.wav"
                save_wav(str(out / fname), np.asarray(audio[j, :sr]), sr)
            n_new += audio.shape[0]
        write_leg_metrics(leg, n_new, time.time() - t0,
                          {"cond_scale": cs, "sampler": "unipc16",
                           "ema_params": recon_for_std("0.100")},
                          n_total=done_iters * batch_size + n_new)

    for cs in CFG_SWEEP:
        gen_leg_cs(f"eval_unipc16_cfg{cs}", float(cs))

    # ---- phase 2: UniPC step sweep at the 32-Heun winner scale --------------
    for steps in STEP_SWEEP:
        leg = f"eval_unipc_{steps}"
        if leg_complete(leg):
            log(f"leg {leg} already complete; skipping")
            continue
        _, dm, tr, _task = build(leg, [
            f"sampler_steps={steps}",
            f"model.sampler.cond_scale={CS_BASE}",
        ])
        t0 = time.time()
        metrics = tr.test(like_params, dm)
        log(f"leg {leg}: trainer.test -> {metrics} "
            f"({time.time() - t0:.0f}s wall)")
        (WORK / leg / "leg_meta.json").write_text(json.dumps(
            {"cond_scale": float(CS_BASE), "sampler": f"unipc{steps}",
             "ema_params": recon_for_std("0.100")}, indent=1))

    log("FRONTIER_EXT_DONE")
    (WORK / "FRONTIER_EXT_DONE").write_text("ok\n")


if __name__ == "__main__":
    main()
