"""In-model flash-attention comparison on the shipped long-sequence workload
(configs/experiment/sc09/dit_longseq_sc09.yaml: patch-1 DiT, 16384 tokens).

Runs ONE training step (loss + grads) of the long-seq DiT at --batch rows
under both attention paths and reports wall time + device peak memory:

  * ADT_FLASH_ATTENTION=0 — XLA fused attention, O(N^2) score/backward
    buffers (expected to OOM/thrash at realistic batch)
  * auto-dispatch (default) — Pallas flash kernels, O(N*D) memory

Each variant runs in its own subprocess so an OOM can't wedge the parent's
TPU client. Usage: python scripts/perf/probe_longseq_flash.py [--batch 4]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def run_variant(batch: int, steps: int) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from audiodiffuser_tpu.diffusion import EluDiffusion
    from audiodiffuser_tpu.models.dit import DiT
    from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
    from audiodiffuser_tpu.ops.schedules import KarrasSchedule
    from audiodiffuser_tpu.samplers.edm import EDMSampler
    from audiodiffuser_tpu.tasks.waveform_task import DiffusionWaveformTask

    task = DiffusionWaveformTask(
        net=DiT(
            input_size=[1, 16384], patch_size=[1, 1], in_channels=1,
            hidden_size=256, depth=8, num_heads=2, mlp_ratio=2.0,
            num_classes=10, label_cond=True, cond_drop_prob=0.1,
            dtype=jnp.bfloat16,
        ),
        diffusion=EluDiffusion(sigma_data=0.2),
        sampler=EDMSampler(s_churn=0.0, num_steps=32, use_heun=True),
        noise_scheduler=KarrasSchedule(
            sigma_min=0.002, sigma_max=80.0, rho=7.0, num_steps=32
        ),
        noise_distribution=LogNormalDistribution(mean=-1.2, std=1.2),
        generated_sample_length=16384,
        in_channels=1,
    )
    x = jnp.zeros((1, 16384, 1))
    params = task.net.init(
        jax.random.key(0), x, jnp.zeros((1,)),
        classes=jnp.zeros((1,), jnp.int32),
    )["params"]

    batch_data = {
        "audio": jax.random.normal(jax.random.key(1), (batch, 16384)),
        "label": jnp.arange(batch, dtype=jnp.int32) % 10,
    }

    @jax.jit
    def train_step(params, key):
        (loss, _), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
            params, batch_data, key
        )
        return loss, jax.tree.map(lambda g: jnp.mean(jnp.abs(g)), grads)

    # static memory accounting from the compiled module: device
    # memory_stats() is unavailable through the axon tunnel, but the
    # compiler's own allocation analysis shows the O(N^2)-vs-O(N*D)
    # backward-temporary difference directly.
    t0 = time.perf_counter()
    compiled = train_step.lower(params, jax.random.key(2)).compile()
    t_compile = time.perf_counter() - t0
    temp_gb = None
    try:
        mem = compiled.memory_analysis()
        temp_gb = round(mem.temp_size_in_bytes / 2**30, 2)
    except Exception:
        pass

    t0 = time.perf_counter()
    loss, _ = compiled(params, jax.random.key(2))
    float(loss)
    t_first = time.perf_counter() - t0 + t_compile

    t0 = time.perf_counter()
    for i in range(steps):
        loss, _ = compiled(params, jax.random.fold_in(jax.random.key(2), i))
    float(loss)
    t_step = (time.perf_counter() - t0) / steps

    stats = jax.devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)
    print(json.dumps({
        "flash": os.environ.get("ADT_FLASH_ATTENTION", "auto"),
        "batch": batch,
        "first_step_s": round(t_first, 1),
        "step_ms": round(t_step * 1e3, 1),
        "temp_mem_gb": temp_gb,
        "peak_mem_gb": round(peak / 2**30, 2),
        "loss": float(loss),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--variant", choices=["xla", "flash"], default=None)
    args = ap.parse_args()

    if args.variant:
        if args.variant == "xla":
            os.environ["ADT_FLASH_ATTENTION"] = "0"
        else:
            os.environ.pop("ADT_FLASH_ATTENTION", None)  # auto: N>=16384 -> flash
        return run_variant(args.batch, args.steps)

    for variant in ("flash", "xla"):
        print(f"=== {variant} (batch {args.batch}) ===", flush=True)
        proc = subprocess.run(
            [sys.executable, __file__, "--variant", variant,
             "--batch", str(args.batch), "--steps", str(args.steps)],
        )
        if proc.returncode != 0:
            print(json.dumps({
                "flash": variant, "batch": args.batch,
                "failed": True, "rc": proc.returncode,
            }))


if __name__ == "__main__":
    main()
