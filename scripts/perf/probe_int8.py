#!/usr/bin/env python
"""int8 conv/matmul rates vs bf16 at flagship shapes (XLA lowering)."""

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

import jax.numpy as jnp

REPS = 8


def timed(fn, *args, iters=6):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / (iters * REPS)


def conv(x, k, out_dtype):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


for (b, h, w_, c) in [(64, 128, 64, 128), (64, 64, 32, 256), (64, 16, 8, 256)]:
    fl = 2 * b * h * w_ * 9 * c * c * REPS

    xb = jnp.ones((b, h, w_, c), jnp.bfloat16)
    kb = jnp.ones((3, 3, c, c), jnp.bfloat16) * 0.01

    @jax.jit
    def f_bf16(x, k):
        y = x
        for _ in range(REPS):
            y = conv(y, k, jnp.bfloat16)
        return y

    t = timed(f_bf16, xb, kb)
    print(f"bf16 conv b{b} {h}x{w_} c{c}: {t*1e3:7.2f} ms {fl/t/1e12:6.1f} TFLOP/s", flush=True)

    xi = jnp.ones((b, h, w_, c), jnp.int8)
    ki = jnp.ones((3, 3, c, c), jnp.int8)

    @jax.jit
    def f_int8(x, k):
        y = x
        for _ in range(REPS):
            y32 = conv(y, k, jnp.int32)
            y = (y32 >> 8).astype(jnp.int8)  # cheap requant stand-in
        return y

    t = timed(f_int8, xi, ki)
    print(f"int8 conv b{b} {h}x{w_} c{c}: {t*1e3:7.2f} ms {fl/t/1e12:6.1f} TFLOP/s", flush=True)

    # int8 conv with fp32 requant (realistic: scale multiply + clip + round)
    @jax.jit
    def f_int8_rq(x, k):
        y = x
        for _ in range(REPS):
            y32 = conv(y, k, jnp.int32)
            yf = y32.astype(jnp.float32) * (1.0 / 256.0)
            y = jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)
        return y

    t = timed(f_int8_rq, xi, ki)
    print(f"int8+rq conv b{b} {h}x{w_} c{c}: {t*1e3:7.2f} ms {fl/t/1e12:6.1f} TFLOP/s", flush=True)
