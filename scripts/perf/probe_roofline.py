#!/usr/bin/env python
"""Chip roofline probe through the axon tunnel.

Measures: bf16 matmul at several sizes, int8 matmul, fp32 matmul, the
flagship UNet conv shapes (NHWC 3x3), and the flagship denoiser forward in
isolation — to find the true ceiling and where the sampler loses time.

Timing rule for the tunnel: block_until_ready is unreliable; every timed
region ends with a scalar reduction + float() host transfer.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20, inner=1):
    out = fn(*args)
    float(jnp.sum(out))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / (iters * inner)


def report(name, secs, flops):
    print(f"{name:55s} {secs*1e3:9.3f} ms   {flops/secs/1e12:7.2f} TFLOP/s", flush=True)


def matmuls():
    for n in (4096, 8192):
        for dt in (jnp.bfloat16, jnp.float32):
            a = jnp.ones((n, n), dt)
            b = jnp.ones((n, n), dt)
            # chain a few matmuls to amortize dispatch
            @jax.jit
            def f(a, b):
                x = a
                for _ in range(4):
                    x = x @ b
                return x
            s = timed(f, a, b, iters=10, inner=4)
            report(f"matmul {n}x{n} {dt.__name__}", s, 2 * n**3)
    # int8 -> int32 matmul
    n = 8192
    a = jnp.ones((n, n), jnp.int8)
    b = jnp.ones((n, n), jnp.int8)

    @jax.jit
    def fi(a, b):
        x = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = jax.lax.dot_general(
            x.astype(jnp.int8), b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y

    s = timed(fi, a, b, iters=10, inner=2)
    report(f"matmul {n}x{n} int8->int32", s, 2 * n**3)


def convs():
    """Flagship UNet conv shapes, NHWC, bf16 (memory_efficient downsample-first)."""
    # (batch, H, W, Cin, Cout) per level at batch 64
    shapes = [
        (64, 256, 128, 2, 128),     # init conv
        (64, 128, 64, 128, 128),    # level 1 resnets (post-downsample)
        (64, 64, 32, 128, 256),     # level 2
        (64, 32, 16, 256, 256),     # level 3
        (64, 16, 8, 256, 256),      # level 4
    ]
    for (b, h, w, ci, co) in shapes:
        x = jnp.ones((b, h, w, ci), jnp.bfloat16)
        k = jnp.ones((3, 3, ci, co), jnp.bfloat16)
        k2 = jnp.ones((3, 3, co, co), jnp.bfloat16)
        # enough reps inside one jit call that the ~7ms tunnel dispatch floor
        # is negligible
        reps = max(8, int(2e12 / (2 * b * h * w * 9 * co * co)))
        reps = min(reps, 512)

        @jax.jit
        def f(x, k, k2):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            for _ in range(reps):
                y = jax.lax.conv_general_dilated(
                    y, k2, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            return y

        fl = 2 * b * h * w * 9 * (ci * co + reps * co * co)
        s = timed(f, x, k, k2, iters=3)
        report(f"conv3x3 chain b{b} {h}x{w} {ci}->{co}(x{reps} {co})", s, fl)


def denoiser():
    """Flagship denoiser forward alone (bf16, batch 64) + attention share."""
    sys.path.insert(0, str(ROOT))
    from bench import build_task
    from audiodiffuser_tpu.ops.flops import count_flops

    task = build_task()
    B = int(os.environ.get("PROBE_BATCH", "64"))
    classes = jnp.arange(B, dtype=jnp.int32) % 10
    x = jnp.ones((B, 256, 128, 2), jnp.float32)
    params = task.net.init(jax.random.key(0), x[:1], jnp.zeros((1,)), classes=classes[:1])["params"]

    @jax.jit
    def fwd(params, x):
        return task.net.apply({"params": params}, x, jnp.full((B,), 0.5), classes=classes)

    try:
        fl = count_flops(lambda p, x: fwd(p, x), params, x)
    except Exception as e:
        print("flops count failed:", e)
        fl = 134e9 * B
    s = timed(fwd, params, x, iters=10)
    report(f"flagship denoiser fwd b{B}", s, fl)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    if which in ("all", "matmul"):
        matmuls()
    if which in ("all", "conv"):
        convs()
    if which in ("all", "denoiser"):
        denoiser()
