#!/usr/bin/env python
"""Winograd Pallas kernel vs XLA conv at flagship UNet shapes (on-chip)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiodiffuser_tpu.ops.winograd_pallas import winograd_conv3x3


def timed(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


SHAPES = [
    (64, 128, 64, 128, 128),
    (64, 64, 32, 128, 256),
    (64, 64, 32, 256, 256),
    (64, 32, 16, 256, 256),
    (64, 16, 8, 256, 256),
]

REPS = 6  # chained convs per jit call to amortize tunnel dispatch

for (b, h, w_, ci, co) in SHAPES:
    if ci != co:
        continue  # chaining needs ci == co; the mixed case times like ci->ci
    x = jax.random.normal(jax.random.key(0), (b, h, w_, ci), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (3, 3, ci, co), jnp.bfloat16) * 0.05

    @jax.jit
    def f_xla(x, k):
        y = x
        for _ in range(REPS):
            y = jax.lax.conv_general_dilated(
                y, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
        return y

    @jax.jit
    def f_win(x, k):
        y = x
        for _ in range(REPS):
            y = winograd_conv3x3(y, k)
        return y

    fl = 2 * b * h * w_ * 9 * ci * co * REPS
    t_x = timed(f_xla, x, k)
    print(f"xla  conv b{b} {h}x{w_} {ci}->{co}: {t_x*1e3:8.2f} ms  "
          f"{fl/t_x/1e12:6.2f} TFLOP/s(dense-equiv)", flush=True)
    t_w = timed(f_win, x, k)
    print(f"wino conv b{b} {h}x{w_} {ci}->{co}: {t_w*1e3:8.2f} ms  "
          f"{fl/t_w/1e12:6.2f} TFLOP/s(dense-equiv)  speedup {t_x/t_w:.2f}x",
          flush=True)
