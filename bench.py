#!/usr/bin/env python
"""Headline benchmark: SC09 complex-spectrogram generation throughput.

Workload (fixed by the reference, BASELINE.md): flagship Imagen-style UNet2d
(dim=128, mults [1,2,2,2], 256x128 complex STFT), EDM deterministic Heun
sampler at 32 steps (NFE = 63), batch 128, full pipeline ending in iSTFT
waveforms — the exact generation path of
``configs/experiment/sc09_inference/*`` at ``sampler_steps: 32``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured samples/sec/chip divided by an *estimated*
reference throughput on A100: the reference publishes no numbers
(BASELINE.md), so we estimate its eager-PyTorch fp16 A100 rate from this
model's analytic FLOPs/sample at 25% MFU of A100's 312 TFLOP/s peak — the
central estimate for eager (non-compiled) PyTorch conv UNets with
~128-channel 3x3 convolutions; measured eager conv-net MFUs on A100
typically land in 15-30%, with 40%+ requiring torch.compile/channels-last
tuning the reference does not do. A stderr comment prints the optimistic
(40% MFU) and pessimistic (15%) bounds alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).parent
sys.path.insert(0, str(ROOT))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# persistent compilation cache: repeated bench runs skip the (slow) compile
_CACHE = ROOT / ".jax_cache"
_CACHE.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# batch 128 = the reference-defined eval workload (BASELINE.md). The chip's
# activation sweet spot is 64, so generation microbatches as 2x64 inside the
# jit (task.sample_microbatch); a subprocess-isolated fallback ladder handles
# smaller-memory devices. Override with BENCH_BATCH / BENCH_MICROBATCH.
BATCH = int(os.environ.get("BENCH_BATCH", 128))
MICROBATCH = int(os.environ.get("BENCH_MICROBATCH", 64))
STEPS = 32

# serving configuration: the W8A8 static-scale int8 path is the default
# ONLY while the acceptance soak's quality gate holds (ADT_INT8=0/1 always
# wins). The gate is the direct int8-vs-bf16 FAD at the headline 32-Heun
# leg on the newest converged checkpoint, accepted iff <= 2x the
# real-vs-real floor (logs/soak_r*/fad_raw.json, written by
# scripts/acceptance_soak_r04.sh phase 6). A rejected OR MISSING gate
# artifact flips the headline to bf16 (fail-closed): honesty beats the
# bigger number. Analytic FLOPs are always counted on the full-precision
# formulation either way.


def _int8_gate_default() -> str:
    """FAIL-CLOSED: int8 serves only when the adjudicating artifact (a
    converged-checkpoint fad_raw.json with the direct int8-vs-bf16 FAD)
    exists and passes. Missing artifact, missing fields, or any exception
    -> bf16 headline. Pre-soak evidence never auto-accepts.

    Threshold (pre-registered 2026-08-19, BEFORE the per-step-int8 leg was
    scored): when the seed-to-seed bf16 control FAD is available
    (``direct_bf16_seedB_vs_A``, scripts/eval_extra_legs_r05.py), accept
    iff direct <= 1.5x that control — i.e. quantization noise is
    indistinguishable from resampling the same model with a different
    seed. A 2048-vs-2048 FAD between two sets from the SAME generator
    does not reach the real-vs-real floor (estimator bias at matched n,
    see fad_anchors.json), so the control is the honest yardstick.
    Without a control, the original 2x-real-floor rule applies."""
    try:
        runs = sorted(ROOT.glob("logs/soak_r*/fad_raw.json"))
        if not runs:
            print("# int8 gate: no fad_raw.json anywhere -> bf16 headline "
                  "(gate fails closed)", file=sys.stderr)
            return "0"
        data = json.loads(runs[-1].read_text())
        direct = data.get("direct_int8ps_vs_bf16_heun32",
                          data.get("direct_int8_vs_bf16_heun32"))
        control = data.get("direct_bf16_seedB_vs_A")
        floor = data.get("floor_real_vs_real")
        if not isinstance(direct, (int, float)):
            print(f"# int8 gate ({runs[-1]}): direct field missing "
                  "-> bf16 headline (gate fails closed)", file=sys.stderr)
            return "0"
        if isinstance(control, (int, float)) and control > 0:
            bar, rule = 1.5 * control, "1.5x seed-control"
        elif floor:
            bar, rule = 2.0 * floor, "2x real floor"
        else:
            print(f"# int8 gate ({runs[-1]}): no threshold fields "
                  "-> bf16 headline (gate fails closed)", file=sys.stderr)
            return "0"
        ok = direct <= bar
        print(
            f"# int8 gate ({runs[-1]}): direct int8-vs-bf16 FAD {direct} vs "
            f"{rule} {bar:.2f} -> {'ACCEPT' if ok else 'REJECT (bf16 headline)'}",
            file=sys.stderr,
        )
        return "1" if ok else "0"
    except Exception as e:
        print(f"# int8 gate: error reading artifact ({e}) -> bf16 headline",
              file=sys.stderr)
        return "0"


os.environ.setdefault("ADT_INT8", _int8_gate_default())
A100_PEAK_FLOPS = 312e12
A100_ASSUMED_MFU = 0.25  # central estimate for eager fp16 conv UNets


def build_task(dtype=jnp.bfloat16):
    from audiodiffuser_tpu.diffusion import EluDiffusion
    from audiodiffuser_tpu.models.unet2d import UNet2dBase
    from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
    from audiodiffuser_tpu.ops.schedules import KarrasSchedule
    from audiodiffuser_tpu.samplers.edm import EDMSampler
    from audiodiffuser_tpu.tasks.diffusion_task import DiffusionSpecTask

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
        dtype=dtype,
    )
    return DiffusionSpecTask(
        net=net,
        diffusion=EluDiffusion(sigma_data=0.2),
        sampler=EDMSampler(s_churn=0.0, num_steps=STEPS, use_heun=True, cond_scale=1.0),
        noise_scheduler=KarrasSchedule(
            sigma_min=0.002, sigma_max=80.0, rho=7.0, num_steps=STEPS
        ),
        noise_distribution=LogNormalDistribution(mean=-1.2, std=1.2),
        n_fft=510,
        hop_length=128,
        generated_frame_length=128,
        generated_sample_class=10,
        sample_microbatch=MICROBATCH if MICROBATCH > 0 else None,
    )


def main():
    if "--single" in sys.argv:
        return run(int(sys.argv[sys.argv.index("--single") + 1]))
    # a device fault can wedge the process's TPU client, so each ladder rung
    # runs in its own subprocess
    import subprocess

    ladder = [b for b in dict.fromkeys([BATCH, 64, 32, 16]) if b <= BATCH]
    for batch in ladder:
        proc = subprocess.run(
            [sys.executable, __file__, "--single", str(batch)],
            stdout=subprocess.PIPE,
        )
        if proc.returncode == 0:
            sys.stdout.buffer.write(proc.stdout)
            return
        print(f"# batch {batch} failed (rc={proc.returncode}); retrying smaller",
              file=sys.stderr)
    raise RuntimeError("all bench batch sizes failed")


def run(BATCH):
    task = build_task()
    classes = jnp.arange(BATCH, dtype=jnp.int32) % 10

    # init on a tiny batch (params are batch-size independent)
    x0 = jnp.zeros((1, 256, 128, 2))
    params = task.net.init(
        jax.random.key(0), x0, jnp.zeros((1,)), classes=classes[:1]
    )["params"]

    from audiodiffuser_tpu.ops.quant import int8_enabled

    if int8_enabled():
        # static-scale W8A8: calibrate per-layer activation scales over the
        # sigma grid once, so quantization fuses into the SiLU producers.
        # The scales are deterministic in (params, knobs, sigma grid), and
        # bench params are a fixed init — cache them next to the compile
        # cache so repeat runs skip the ~2-8 min probe.
        import hashlib
        import pickle

        fp = hashlib.sha1()
        leaves = jax.tree_util.tree_leaves(params)
        fp.update(repr([(l.shape, str(l.dtype)) for l in leaves]).encode())
        # content hash over a deterministic subsample of raw leaf bytes (an
        # abs-sum digest would let distinct param sets collide and silently
        # serve wrong activation scales if bench ever loads real checkpoints)
        for l in leaves:
            raw = np.ascontiguousarray(jax.device_get(l)).tobytes()
            fp.update(raw[:4096])
            fp.update(raw[-4096:])
            fp.update(str(len(raw)).encode())
        knobs = sorted(
            (k, v) for k, v in os.environ.items() if k.startswith("ADT_")
        )
        fp.update(repr(knobs).encode())
        fp.update(f"steps={STEPS}".encode())
        # the calibration granularity (per-step [S] leaves vs one global
        # scalar per module, ADT_INT8_PER_STEP) changes the scale tree:
        # key the cache on it so a pre-per-step pickle can't shadow the
        # new scheme
        fp.update(
            f"per_step={os.environ.get('ADT_INT8_PER_STEP', '1')}".encode()
        )
        # calibration-semantics version: v2 probes the CFG null branch
        # (cond_scale=2.0) and all classes — stale v1 scale pickles (cond-only,
        # 4 classes) must not shadow it
        fp.update(b"calib=v2")
        scale_cache = _CACHE / f"int8_scales_{fp.hexdigest()[:16]}.pkl"
        if scale_cache.exists():
            task.quant_scales = pickle.loads(scale_cache.read_bytes())
            print(f"# int8 calibration: cached ({scale_cache.name})",
                  file=sys.stderr)
        else:
            t0 = time.perf_counter()
            task.calibrate_int8_scales(params, jax.random.key(7))
            print(f"# int8 calibration: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            scale_cache.write_bytes(
                pickle.dumps(jax.device_get(task.quant_scales))
            )

    sample_fn = jax.jit(task.make_sample_fn())

    # analytic FLOPs (jaxpr walk; device cost_analysis is unreliable here)
    from audiodiffuser_tpu.ops.flops import count_flops

    key = jax.random.key(1)
    try:
        # count FLOPs on the reference formulation: the fused stem's
        # zero-padded kernels would inflate the analytic count (~2%), and
        # the fused-Block pallas_call hides its conv FLOPs from the jaxpr
        # walk entirely
        prev_stem = os.environ.get("ADT_FUSED_STEM")
        os.environ["ADT_FUSED_STEM"] = "0"
        prev_fused = os.environ.pop("ADT_FUSED_BLOCK", None)
        os.environ["ADT_FUSED_BLOCK"] = "0"
        total_flops_per_gen_batch = count_flops(
            task.make_sample_fn(), params, key, classes
        )
    except Exception:
        total_flops_per_gen_batch = 0.0
    finally:
        if prev_stem is None:
            os.environ.pop("ADT_FUSED_STEM", None)
        else:
            os.environ["ADT_FUSED_STEM"] = prev_stem
        if prev_fused is None:
            os.environ.pop("ADT_FUSED_BLOCK", None)
        else:
            os.environ["ADT_FUSED_BLOCK"] = prev_fused

    # warmup / compile
    t_compile = time.perf_counter()
    compiled = sample_fn.lower(params, key, classes).compile()
    print(
        f"# compile: {time.perf_counter() - t_compile:.1f}s", file=sys.stderr
    )

    out = compiled(params, key, classes)
    out.block_until_ready()

    # timed runs
    iters = int(os.environ.get("BENCH_ITERS", 3))
    t0 = time.perf_counter()
    for i in range(iters):
        out = compiled(params, jax.random.fold_in(key, i), classes)
    # force full completion (block_until_ready can be lazy through remote
    # device tunnels); a scalar reduction + host transfer is authoritative
    float(jnp.sum(out))
    elapsed = time.perf_counter() - t0

    n_chips = max(jax.device_count(), 1)
    samples_per_sec_chip = BATCH * iters / elapsed / n_chips

    if total_flops_per_gen_batch > 0:
        flops_per_sample = total_flops_per_gen_batch / BATCH
        a100_est = A100_PEAK_FLOPS * A100_ASSUMED_MFU / flops_per_sample
        vs_baseline = samples_per_sec_chip / a100_est
        lo = samples_per_sec_chip / (A100_PEAK_FLOPS * 0.40 / flops_per_sample)
        hi = samples_per_sec_chip / (A100_PEAK_FLOPS * 0.15 / flops_per_sample)
        print(
            f"# A100-estimate bounds: vs 40%-MFU baseline {lo:.2f}x, "
            f"vs 15%-MFU baseline {hi:.2f}x "
            f"(achieved {samples_per_sec_chip * flops_per_sample / 1e12:.1f} TFLOP/s/chip)",
            file=sys.stderr,
        )
    else:
        vs_baseline = 0.0

    print(
        "# matched-quality serving frontier (same converged-ckpt FADs, "
        "steady-state): UniPC-16 @ cfg2.0 = 29.58 samples/s/chip at FAD "
        "434.66 vs 32-Heun winner 7.57/s at FAD 525.46 — see PROFILE.md / "
        "scripts/perf/bench_matched_quality.py",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "sc09_generation_throughput_32step_heun",
                "value": round(samples_per_sec_chip, 3),
                "unit": "samples/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
                # achieved batch: the subprocess ladder can fall back to a
                # smaller batch on small-memory devices — record it so a
                # batch-16 run can't masquerade as the batch-128 workload
                "batch": BATCH,
                # serving precision actually used (int8 defaults from the
                # newest acceptance-soak quality gate; see _int8_gate_default)
                "serving": "int8"
                if os.environ.get("ADT_INT8") == "1"
                else "bf16",
            }
        )
    )


if __name__ == "__main__":
    main()
