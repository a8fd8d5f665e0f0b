#!/usr/bin/env python
"""Winograd v2 (channel-major polyphase) vs XLA conv, per flagship shape."""

from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl

import audiodiffuser_tpu.ops.winograd_pallas as wp
from audiodiffuser_tpu.ops.winograd import transform_kernel

REPS = 6


def timed(fn, *args, iters=6):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / (iters * REPS)


def bench_shape(b, h, w_, ci, co):
    x = jax.random.normal(jax.random.key(0), (b, h, w_, ci), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (3, 3, ci, co), jnp.bfloat16) * 0.05
    dense_fl = 2 * b * h * w_ * 9 * ci * co

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
            y = wp.winograd_conv3x3(y, k)
        return y

    # kernel-only: chain pallas_call on fixed phases (no pack/unpack between)
    th, tw = h // 2, w_ // 2
    s = wp._row_split(th, tw, ci, co)
    thb = th // s
    u = transform_kernel(k).reshape(16, ci, co).astype(jnp.bfloat16)
    call = pl.pallas_call(
        functools.partial(wp._winograd_kernel, th=thb, tw=tw, ci=ci, co=co,
                          out_dtype=jnp.bfloat16),
        grid=(b * s,),
        in_specs=[
            pl.BlockSpec((1, thb + 1, tw + 1, 4 * ci), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((16, ci, co), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, thb, tw, 4 * co), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * s, thb, tw, 4 * co), jnp.bfloat16),
    )

    @jax.jit
    def f_kernel(x, u):
        phases = wp.polyphase_decompose(x).astype(jnp.bfloat16)
        if s > 1:
            phases = jnp.concatenate(
                [phases[:, m * thb : m * thb + thb + 1] for m in range(s)], axis=0
            ).reshape(s, b, thb + 1, tw + 1, 4 * ci).transpose(1, 0, 2, 3, 4
            ).reshape(b * s, thb + 1, tw + 1, 4 * ci)
        y = None
        for _ in range(REPS):
            y = call(phases, u)
        return y

    t_x = timed(f_xla, x, k)
    t_k = timed(f_kernel, x, u)
    t_w = timed(f_win, x, k)
    print(
        f"b{b} {h}x{w_} {ci}->{co} (s={s}): xla {t_x*1e3:6.2f}ms "
        f"({dense_fl/t_x/1e12:5.1f}T) | kernel {t_k*1e3:6.2f}ms "
        f"({dense_fl/t_k/1e12:5.1f}T) | e2e {t_w*1e3:6.2f}ms "
        f"({dense_fl/t_w/1e12:5.1f}T) | kernel speedup {t_x/t_k:4.2f}x e2e {t_x/t_w:4.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    for (b, h, w_, ci, co) in [
        (64, 128, 64, 128, 128),
        (64, 64, 32, 256, 256),
        (64, 32, 16, 256, 256),
        (64, 16, 8, 256, 256),
    ]:
        bench_shape(b, h, w_, ci, co)
