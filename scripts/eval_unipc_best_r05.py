#!/usr/bin/env python
"""Round-5 combined-best quality leg: UniPC-16 at EMA sigma_rel 0.050.

The round-4 grid measured its two best quality levers independently —
UniPC-16 (FAD 434.66 vs the 32-Heun winner's 525.46, at a quarter of the
NFE) and the post-hoc phema reconstruction at sigma_rel 0.050 (FAD 448.16
vs 525.46 at the default 0.100) — both at the FAD-winning cond_scale 2.0.
This leg combines them: UniPC order-2 bh2, 16 steps, cond_scale 2.0,
generating from ``recon_phema-0.050_87500``. If the levers compose, this
is the new best-quality serving config, and it is ALSO the 29.58
samples/s/chip matched-quality throughput point (PROFILE.md).

Resume-safe like the grid legs (complete legs are skipped). Reference
capability: the sampler grid-search workflow of
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
CS = os.environ.get("CS") or (WORK / "best_cond_scale.txt").read_text().strip()
# SEED_OVERRIDE generates the same config under a different sampling seed
# (the leg name gets a _seedB suffix): the seed-to-seed control for the
# composed leg, mirroring eval_heun32_cfg2.0_seedB.
SEED_OVERRIDE = os.environ.get("SEED_OVERRIDE")
LEG = "eval_unipc16_emastd0.050" + ("_seedB" if SEED_OVERRIDE else "")


def log(*a):
    print(f"[unipc-best {time.strftime('%H:%M:%S')}]", *a, flush=True)


def recon_for_std(std: str) -> str:
    cands = sorted(
        WORK.glob(f"phema/recon_phema-{std}_*"),
        key=lambda p: int(p.name.rsplit("_", 1)[1]),
    )
    return str(cands[-1])


def main():
    from audiodiffuser_tpu.config import compose, instantiate
    from audiodiffuser_tpu.utils import seed_everything
    from train import build_trainer_and_task

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

    out = WORK / LEG / "test_samples"
    if out.is_dir() and len(list(out.glob("*.wav"))) >= SAMPLES:
        log(f"{LEG} already complete")
        return

    cfg = compose(str(ROOT / "configs"), "eval", [
        f"experiment={UNIPC_EXP}",
        "sampler_steps=16",
        f"data.data_dir={DATA}",
        f"ckpt_path={CKPT}",
        f"model.ema_ckpt_path={recon_for_std('0.050')}",
        f"model.total_test_samples={SAMPLES}",
        f"paths.output_dir={WORK / LEG}",
        "extras.print_config=false",
        f"model.sampler.cond_scale={CS}",
        *([f"seed={SEED_OVERRIDE}"] if SEED_OVERRIDE else []),
    ])
    seed_everything(cfg.get("seed"))
    dm = instantiate(cfg.data)
    trainer, task, logger = build_trainer_and_task(cfg, WORK / LEG)
    first = next(iter(dm.test_dataloader()))
    like_params = trainer.init_state(first).params
    t0 = time.time()
    metrics = trainer.test(like_params, dm)
    log(f"{LEG}: trainer.test -> {metrics} ({time.time() - t0:.0f}s)")
    (WORK / LEG / "leg_meta.json").write_text(json.dumps(
        {"cond_scale": float(CS), "sampler": "unipc16",
         "ema_params": recon_for_std("0.050")}, indent=1))
    log("UNIPC_BEST_DONE")


if __name__ == "__main__":
    main()
