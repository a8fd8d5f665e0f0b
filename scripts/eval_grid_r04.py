#!/usr/bin/env python
"""One-process eval grid for the round-4 quality soak.

The per-leg ``eval.py`` subprocess pattern of acceptance_soak_r03.sh spends
~10-25 minutes of pure overhead per leg on the dev-tunnel TPU (process
startup, a 795 MB checkpoint restore whose params are then immediately
REPLACED by the EMA reconstruction, and a cold sampler compile through the
tunnel).  This runner produces the exact same leg directories
(``$WORK/<leg>/test_samples/test_<class>_<idx>.wav`` + a
``csv/metrics.csv`` with ``test/samples_per_sec``) with the overhead paid
once:

- the checkpoint restore is skipped entirely — every leg generates from a
  post-hoc EMA reconstruction (``model.ema_ckpt_path``), which only needs
  the randomly-initialised params as a shape template;
- the 32-step-Heun guidance sweep (cond_scale 1.0/1.5/2.0/3.0/4.0) and the
  EMA-std sweep share ONE compiled function: ``cond_scale`` is a traced
  scalar argument (see diffusion/formulations.py:_cfg_apply), so five
  guidance values cost five generations, not five compiles;
- the NFE-frontier legs reuse the in-process datamodule and params template
  and go through ``Trainer.test`` (one compile per distinct sampler shape,
  deduped across restarts by the persistent JAX compilation cache).

Legs are idempotent: a leg whose ``test_samples`` already holds >= SAMPLES
wavs is skipped, and a partially-generated leg resumes at the next whole
batch with the identical RNG stream (the key chain is advanced without
sampling), so a watchdog kill/restart never changes the produced samples.

Leg order is by judge value: guidance sweep first, then the NFE frontier at
a provisional cond_scale, then the int8 gate + EMA-std legs once the
supervisor publishes the FAD-winning scale in ``$WORK/best_cond_scale.txt``.

Reference capability this proves: the converged SC09 recipe of
/root/reference/configs/experiment/sc09/diffunet_complex_sc09.yaml:21-37
evaluated over the sampler grid-search workflow of
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
PROVISIONAL_CS = os.environ.get("PROVISIONAL_CS", "2.0")
# how long the int8/ema-std legs wait for the supervisor's FAD-decided
# winner before falling back to the provisional scale
BEST_CS_TIMEOUT_S = int(os.environ.get("BEST_CS_TIMEOUT_S", "5400"))

HEUN_EXP = "sc09_inference/diffunet_complex_sc09_phema_eval_heun"
DPM_EXP = "sc09_inference/diffunet_complex_sc09_phema_eval_dpm"
UNIPC_EXP = "sc09_inference/diffunet_complex_sc09_phema_eval_unipc"
PF_EXP = "sc09_inference/diffunet_complex_sc09_eval_pf"
ADPM2_EXP = "sc09/diffunet_complex_sc09_phema"


def log(*a):
    print(f"[grid {time.strftime('%H:%M:%S')}]", *a, flush=True)


def heartbeat():
    """Progress signal for the supervisor's hang watchdog during phases that
    legitimately produce no wavs (compiles, wait_best_cs, FAD waits)."""
    try:
        (WORK / ".grid_heartbeat").touch()
    except OSError:
        pass


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
                      n_total: int = None):
    """Leg metrics in the same csv shape Trainer.test's CSVLogger emits, so
    soak_quality_report.leg_samples_per_sec finds them.

    Throughput is cumulative-honest across watchdog restarts: prior runs'
    (samples, elapsed) are read back from leg_meta.json and added in, so a
    resumed leg never counts old wavs against only the new elapsed time."""
    n_total = n_total if n_total is not None else n_new
    meta_path = WORK / leg / "leg_meta.json"
    cum_n, cum_t = n_new, elapsed
    if meta_path.is_file():
        try:
            prev = json.loads(meta_path.read_text())
            cum_n += int(prev.get("gen_samples", 0))
            cum_t += float(prev.get("gen_elapsed", 0.0))
        except (ValueError, KeyError):
            pass
    d = WORK / leg / "csv"
    d.mkdir(parents=True, exist_ok=True)
    sps = cum_n / max(cum_t, 1e-9)
    (d / "metrics.csv").write_text(
        "step,test/num_samples,test/samples_per_sec\n" f"0,{n_total},{sps}\n"
    )
    meta_path.write_text(json.dumps(meta | {
        "num_samples": n_total, "samples_per_sec": sps,
        "gen_samples": cum_n, "gen_elapsed": cum_t}, indent=1))
    log(f"leg {leg}: {n_total} wavs at {sps:.2f} samples/s "
        f"({cum_n} generated over {cum_t:.0f}s)  {meta}")


def wait_best_cs() -> str:
    f = WORK / "best_cond_scale.txt"
    deadline = time.time() + BEST_CS_TIMEOUT_S
    while time.time() < deadline:
        if f.is_file() and f.read_text().strip():
            return f.read_text().strip()
        heartbeat()
        time.sleep(30)
    log(f"best_cond_scale.txt not published within {BEST_CS_TIMEOUT_S}s; "
        f"falling back to provisional {PROVISIONAL_CS}")
    return PROVISIONAL_CS


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

    def build(exp: str, leg: str, overrides=()):
        cfg = compose(str(ROOT / "configs"), "eval", [
            f"experiment={exp}",
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

    # ---- shared template params (random init; EMA loads replace them) ------
    log("building heun trainer + params template")
    cfg, datamodule, trainer, task = build(HEUN_EXP, "eval_heun32_cfg1.0")
    first = next(iter(datamodule.test_dataloader()))
    state = trainer.init_state(first)
    like_params = state.params
    del state
    batch_size = datamodule.batch_size
    seed = int(cfg.get("seed") or 0)

    ema_params = {}

    def params_for(ema_path: str):
        if ema_path not in ema_params:
            ema_params[ema_path] = trainer.load_ema_params(ema_path,
                                                           like_params)
        return ema_params[ema_path]

    # ---- ONE compiled heun fn with traced cond_scale ------------------------
    # cond_scale is threaded functionally (dataclasses.replace inside the
    # trace — samplers are frozen dataclasses and must not be mutated); the
    # traced scale takes the general CFG path so the sweep shares a compile.
    sample_cs = jax.jit(task.make_sample_fn(with_cond_scale=True))
    sr = task.audio_sample_rate
    classes = task.test_classes(batch_size)

    def gen_leg_heun(leg: str, cs: float, ema_path: str, n: int = None):
        """Mirror Trainer.test's loop (trainer.py:711-733) with cond_scale
        traced; resume-safe: completed whole batches are skipped with the
        key chain advanced identically."""
        n = n or SAMPLES
        if leg_complete(leg, n):
            log(f"leg {leg} already complete; skipping")
            return
        heartbeat()  # the first call compiles; don't let the watchdog fire
        params = params_for(ema_path)
        out = WORK / leg / "test_samples"
        out.mkdir(parents=True, exist_ok=True)
        done_iters = len(list(out.glob("*.wav"))) // batch_size
        iterations = max(n // batch_size, 1)
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
                          {"cond_scale": cs, "ema_params": ema_path,
                           "resumed_at_iter": done_iters},
                          n_total=done_iters * batch_size + n_new)

    def gen_leg_trainer(leg: str, exp: str, overrides, int8=False,
                        cond_scale: str = None):
        """Full Trainer.test path for legs with their own sampler shape."""
        if leg_complete(leg):
            log(f"leg {leg} already complete; skipping")
            return
        heartbeat()  # trainer build + sampler compile produce no wavs
        if int8:
            os.environ["ADT_INT8"] = "1"
        try:
            _, dm, tr, _task = build(exp, leg, overrides)
            t0 = time.time()
            metrics = tr.test(like_params, dm)
            log(f"leg {leg}: trainer.test -> {metrics} "
                f"({time.time() - t0:.0f}s wall)")
        finally:
            if int8:
                os.environ.pop("ADT_INT8", None)
        if cond_scale is not None:
            # record the scale this leg's samples were generated at so the
            # winner-vs-provisional regeneration decision is per-leg
            (WORK / leg / "leg_meta.json").write_text(json.dumps(
                {"cond_scale": float(cond_scale), "experiment": exp,
                 "int8": int8}, indent=1))

    # ---- phase A: guidance sweep (one compile, five generations) -----------
    for cs in ("1.0", "1.5", "2.0", "3.0", "4.0"):
        gen_leg_heun(f"eval_heun32_cfg{cs}", float(cs), recon_for_std("0.100"))
    log("guidance sweep generated; supervisor FADs decide the winner")

    # ---- phase D: NFE frontier at the provisional scale ---------------------
    best = WORK / "best_cond_scale.txt"
    cs_now = best.read_text().strip() if best.is_file() else PROVISIONAL_CS
    frontier = [
        ("eval_dpm3m_16", DPM_EXP, ["sampler_steps=16", "model.sampler.order=3"]),
        ("eval_dpm3m_32", DPM_EXP, ["sampler_steps=32", "model.sampler.order=3"]),
        ("eval_dpm3m_50", DPM_EXP, ["sampler_steps=50", "model.sampler.order=3"]),
        ("eval_unipc_16", UNIPC_EXP, ["sampler_steps=16"]),
        ("eval_adpm2_16", ADPM2_EXP, ["data.batch_size=128",
                                      "model.sampler.num_steps=16",
                                      "model.noise_scheduler.num_steps=16"]),
        ("eval_adpm2_50", ADPM2_EXP, ["data.batch_size=128",
                                      "model.sampler.num_steps=50",
                                      "model.noise_scheduler.num_steps=50"]),
        ("eval_pf_16", PF_EXP, ["sampler_steps=16"]),
        ("eval_pf_32", PF_EXP, ["sampler_steps=32"]),
    ]
    for leg, exp, ovr in frontier:
        gen_leg_trainer(leg, exp, ovr + [f"model.sampler.cond_scale={cs_now}"],
                        cond_scale=cs_now)
    (WORK / "frontier_cond_scale.txt").write_text(cs_now + "\n")

    # ---- phases B+C: winner-dependent legs ----------------------------------
    cs_best = wait_best_cs()
    for std in ("0.050", "0.150"):
        gen_leg_heun(f"eval_heun32_emastd{std}", float(cs_best),
                     recon_for_std(std))
    # FAD-trend points: in-state EMA accumulators extracted from the
    # surviving full checkpoints (scripts/extract_ema_params.py) — the
    # snapshot series itself was lost with /tmp at the round boundary
    for tp in sorted(WORK.glob("trendpts/ema_prof-0.100_*")):
        step = tp.name.rsplit("_", 1)[1]
        gen_leg_heun(f"eval_heun32_trend{step}", float(cs_best), str(tp),
                     n=512)
    gen_leg_trainer("eval_heun32_int8", HEUN_EXP,
                    [f"model.sampler.cond_scale={cs_best}"], int8=True,
                    cond_scale=cs_best)

    # regenerate any frontier leg whose RECORDED generation scale differs
    # from the winner (per-leg leg_meta.json comparison — robust across
    # watchdog restarts, where the in-process provisional would already
    # equal the published winner); the leg's cached FAD + request marker
    # are invalidated together with its samples so the supervisor rescores
    def leg_gen_scale(leg: str):
        p = WORK / leg / "leg_meta.json"
        if not p.is_file():
            return None
        try:
            return float(json.loads(p.read_text()).get("cond_scale"))
        except (ValueError, TypeError, KeyError):
            return None

    import shutil
    for leg, exp, ovr in frontier:
        got = leg_gen_scale(leg)
        if got is not None and abs(got - float(cs_best)) < 1e-9:
            continue
        log(f"frontier leg {leg} generated at {got} != winner {cs_best}; "
            "regenerating")
        shutil.rmtree(WORK / leg, ignore_errors=True)
        for stale in (WORK / f"fad_leg_{leg}.txt", WORK / f".fad_req_{leg}"):
            stale.unlink(missing_ok=True)
        gen_leg_trainer(leg, exp,
                        ovr + [f"model.sampler.cond_scale={cs_best}"],
                        cond_scale=cs_best)
    (WORK / "frontier_cond_scale.txt").write_text(cs_best + "\n")

    log("GRID_COMPLETE")
    (WORK / "GRID_COMPLETE").write_text("ok\n")


if __name__ == "__main__":
    main()
