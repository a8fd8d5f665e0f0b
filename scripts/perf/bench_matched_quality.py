#!/usr/bin/env python
"""Matched-quality serving throughput: steady-state samples/sec/chip for the
FAD-measured serving configs from the converged-soak eval grid.

The headline bench (bench.py) is pinned to the reference-defined workload
(32-step Heun, BASELINE.md). This script measures the *quality-matched*
serving frontier on the same flagship model/pipeline, at the grid's
FAD-winning guidance (cond_scale=2.0, logs/soak_r04/QUALITY.md):

- ``heun32``  — EDM Heun 32 steps @ cfg 2.0: the grid-winner quality leg
  (FAD 525.46 on the converged checkpoint).
- ``unipc16`` — UniPC order-2 bh2, 16 steps @ cfg 2.0: BETTER measured FAD
  (434.66) at a quarter of the NFE.

Both legs run the full generation path (sampler -> iSTFT waveforms) at the
reference eval batch (128), steady-state (compile excluded), bf16 serving.
Prints one JSON line per leg plus a summary comparing the two — i.e. the
samples/sec available at matched-or-better quality than the 32-Heun grid
winner. Reference workload definition:
/root/reference/configs/experiment/sc09_inference/diffunet_complex_sc09_eval_dpm.yaml:33,77.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

_CACHE = ROOT / ".jax_cache"
_CACHE.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

BATCH = int(os.environ.get("BENCH_BATCH", 128))
MICROBATCH = int(os.environ.get("BENCH_MICROBATCH", 64))
ITERS = int(os.environ.get("BENCH_ITERS", 3))

# grid-measured FADs on the converged checkpoint (logs/soak_r04/fad_raw.json
# when present; the two original legs are pinned as fallbacks)
def _grid_fad(leg: str):
    pinned = {"heun32": 525.4592, "unipc16": 434.6595}
    raw = ROOT / "logs/soak_r04/fad_raw.json"
    if raw.is_file():
        d = json.loads(raw.read_text())
        key = {"heun32": "eval_heun32_cfg2.0", "unipc16": "eval_unipc_16"}.get(
            leg, f"eval_unipc_{leg[5:]}" if leg.startswith("unipc") else None)
        if key and key in d:
            return d[key]
    return pinned.get(leg)


def build_task(leg: str):
    """leg is 'heun<N>' or 'unipc<N>' — any step count."""
    from audiodiffuser_tpu.diffusion import EluDiffusion
    from audiodiffuser_tpu.models.unet2d import UNet2dBase
    from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
    from audiodiffuser_tpu.ops.schedules import KarrasSchedule
    from audiodiffuser_tpu.samplers.edm import EDMSampler, UniPCSampler
    from audiodiffuser_tpu.tasks.diffusion_task import DiffusionSpecTask

    if leg.startswith("heun"):
        steps = int(leg[4:])
        sampler = EDMSampler(
            s_churn=0.0, num_steps=steps, use_heun=True, cond_scale=2.0
        )
    elif leg.startswith("unipc"):
        steps = int(leg[5:])
        sampler = UniPCSampler(
            num_steps=steps, order=2, cond_scale=2.0, x0_pred=True
        )
    else:
        raise ValueError(leg)

    net = UNet2dBase(
        dim=128,
        num_classes=10,
        dim_mults=[1, 2, 2, 2],
        channels=2,
        num_resnet_blocks=2,
        resnet_groups=8,
        layer_attns=[False, False, True, True],
        layer_cross_attns=[False, False, True, True],
        attn_heads=2,
        ff_mult=2.0,
        memory_efficient=True,
        dtype=jnp.bfloat16,
    )
    return DiffusionSpecTask(
        net=net,
        diffusion=EluDiffusion(sigma_data=0.2),
        sampler=sampler,
        noise_scheduler=KarrasSchedule(
            sigma_min=0.002, sigma_max=80.0, rho=7.0, num_steps=steps
        ),
        noise_distribution=LogNormalDistribution(mean=-1.2, std=1.2),
        n_fft=510,
        hop_length=128,
        generated_frame_length=128,
        generated_sample_class=10,
        sample_microbatch=MICROBATCH if MICROBATCH > 0 else None,
    )


def run_leg(leg: str):
    task = build_task(leg)
    classes = jnp.arange(BATCH, dtype=jnp.int32) % 10
    x0 = jnp.zeros((1, 256, 128, 2))
    print(f"# {leg}: init...", file=sys.stderr, flush=True)
    params = task.net.init(
        jax.random.key(0), x0, jnp.zeros((1,)), classes=classes[:1]
    )["params"]
    sample_fn = jax.jit(task.make_sample_fn())
    key = jax.random.key(1)

    t0 = time.perf_counter()
    print(f"# {leg}: lowering...", file=sys.stderr, flush=True)
    lowered = sample_fn.lower(params, key, classes)
    print(f"# {leg}: lowered {time.perf_counter() - t0:.1f}s, compiling...",
          file=sys.stderr, flush=True)
    compiled = lowered.compile()
    print(f"# {leg} compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    out = compiled(params, key, classes)
    out.block_until_ready()

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = compiled(params, jax.random.fold_in(key, i), classes)
    float(jnp.sum(out))  # authoritative completion through remote tunnels
    elapsed = time.perf_counter() - t0
    rate = BATCH * ITERS / elapsed / max(jax.device_count(), 1)
    print(
        json.dumps(
            {
                "metric": f"sc09_matched_quality_throughput_{leg}_cfg2",
                "value": round(rate, 3),
                "unit": "samples/sec/chip",
                "fad_converged_ckpt": _grid_fad(leg),
                "batch": BATCH,
                "serving": "bf16",
            }
        )
    )
    return rate


def main():
    legs = sys.argv[1:] or ["heun32", "unipc16"]
    rates = {leg: run_leg(leg) for leg in legs}
    if {"heun32", "unipc16"} <= rates.keys():
        print(
            f"# matched-quality summary: UniPC-16 (FAD {_grid_fad('unipc16')}) "
            f"serves {rates['unipc16']:.2f} samples/s/chip = "
            f"{rates['unipc16'] / rates['heun32']:.2f}x the 32-Heun grid "
            f"winner (FAD {_grid_fad('heun32')}, {rates['heun32']:.2f}/s) "
            "at strictly better measured FAD",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
