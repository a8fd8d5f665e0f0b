#!/usr/bin/env python
"""Regenerate the int8 eval legs under the v2 activation-scale calibration.

Round-5 post-mortem: the v1 calibration probe ran cond_scale=1.0 only, so
the CFG null-embedding branch never reached the static scales; at serving
(cond_scale=2.0) the per-step scheme saturated the null prediction and CFG
amplified the clipped output (direct int8-vs-bf16 FAD 5477; the slack
global scales measured 287). calibrate_int8_scales now probes the
concatenated cond+null batch over every class (tasks/diffusion_task.py),
and this runner re-produces both int8 legs under the fixed probe so the
serving gate can be re-adjudicated on real evidence:

  * ``eval_heun32_int8``   — one global scale per module (ADT_INT8_PER_STEP=0)
  * ``eval_heun32_int8ps`` — per-sigma-grid-point scales (the serving default)

v1 leg directories are archived OUT of $WORK (soak_quality_report globs
``eval_*`` there), and their cached supervisor FADs are invalidated with
them (ADVICE r04: a removed leg must take its fad_leg_<leg>.txt along).

Both legs generate through Trainer.test, whose RNG chain (seed + 2) matches
the bf16 guidance-sweep leg A — the direct FAD against leg A therefore
measures quantization drift alone, to be judged against the pre-registered
1.5x seed-to-seed bf16 control threshold (bench.py:_int8_gate_default).

Reference capability: the sampler grid-search workflow of
/root/reference/configs/experiment/sc09_inference/ (README.md:54-58).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(ROOT))

WORK = Path(os.environ.get("WORK", "/tmp/soak_r04"))
ARCHIVE = Path(os.environ.get("ARCHIVE", "/tmp/soak_r04_archive"))
DATA = os.environ.get("DATA", "/tmp/sc09_soak_r03")
CKPT = os.environ.get("CKPT", "/tmp/soak_r03/train/checkpoints/last")
SAMPLES = int(os.environ.get("SAMPLES", "2048"))
HEUN_EXP = "sc09_inference/diffunet_complex_sc09_phema_eval_heun"
CS = os.environ.get("CS") or (WORK / "best_cond_scale.txt").read_text().strip()

LEGS = [("eval_heun32_int8", "0"), ("eval_heun32_int8ps", "1")]


def log(*a):
    print(f"[int8v2 {time.strftime('%H:%M:%S')}]", *a, flush=True)


def recon_for_std(std: str) -> str:
    cands = sorted(
        WORK.glob(f"phema/recon_phema-{std}_*"),
        key=lambda p: int(p.name.rsplit("_", 1)[1]),
    )
    return str(cands[-1])


def leg_is_v2_complete(leg: str) -> bool:
    d = WORK / leg
    meta = d / "leg_meta.json"
    if not meta.is_file():
        return False
    try:
        if json.loads(meta.read_text()).get("calib") != "v2":
            return False
    except ValueError:
        return False
    wavs = d / "test_samples"
    return wavs.is_dir() and len(list(wavs.glob("*.wav"))) >= SAMPLES


def archive_v1_leg(leg: str):
    d = WORK / leg
    if d.exists():
        ARCHIVE.mkdir(parents=True, exist_ok=True)
        dst = ARCHIVE / f"{leg}_calibv1"
        if dst.exists():
            shutil.rmtree(d)
        else:
            shutil.move(str(d), str(dst))
        log(f"archived v1 leg -> {dst}")
    # invalidate the supervisor's cached FAD + request marker together with
    # the samples they were computed on
    for stale in (WORK / f"fad_leg_{leg}.txt", WORK / f".fad_req_{leg}"):
        stale.unlink(missing_ok=True)


def main():
    import jax

    from audiodiffuser_tpu.config import compose, instantiate
    from audiodiffuser_tpu.utils import seed_everything
    from train import build_trainer_and_task

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

    for leg, per_step in LEGS:
        if leg_is_v2_complete(leg):
            log(f"{leg} already v2-complete; skipping")
            continue
        archive_v1_leg(leg)
        os.environ["ADT_INT8"] = "1"
        os.environ["ADT_INT8_PER_STEP"] = per_step
        try:
            cfg = compose(str(ROOT / "configs"), "eval", [
                f"experiment={HEUN_EXP}",
                f"data.data_dir={DATA}",
                f"ckpt_path={CKPT}",
                f"model.ema_ckpt_path={recon_for_std('0.100')}",
                f"model.total_test_samples={SAMPLES}",
                f"paths.output_dir={WORK / leg}",
                "extras.print_config=false",
                f"model.sampler.cond_scale={CS}",
            ])
            seed_everything(cfg.get("seed"))
            dm = instantiate(cfg.data)
            trainer, task, logger = build_trainer_and_task(cfg, WORK / leg)
            first = next(iter(dm.test_dataloader()))
            like_params = trainer.init_state(first).params
            t0 = time.time()
            metrics = trainer.test(like_params, dm)
            log(f"{leg}: trainer.test -> {metrics} ({time.time() - t0:.0f}s)")
        finally:
            os.environ.pop("ADT_INT8", None)
            os.environ.pop("ADT_INT8_PER_STEP", None)
        (WORK / leg / "leg_meta.json").write_text(json.dumps(
            {"cond_scale": float(CS), "int8": True,
             "per_step_scales": per_step == "1", "calib": "v2"}, indent=1))

    log("INT8_CALIBV2_DONE")


if __name__ == "__main__":
    main()
