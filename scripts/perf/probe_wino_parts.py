#!/usr/bin/env python
"""Decompose Winograd kernel time: full vs matmul-only vs transform-only,
plus a batched-dot variant. One shape (level-1 flagship: 64x(128x64)x128)."""

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

from audiodiffuser_tpu.ops.winograd import transform_kernel
from audiodiffuser_tpu.ops.winograd_pallas import polyphase_decompose

B, H, W, CI, CO = 64, 128, 64, 128, 128
TH, TWD = H // 2, W // 2
S = int(__import__("os").environ.get("WINO_S", 4))  # row split
THB = TH // S
REPS = 4


def timed(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / (iters * REPS)


def make_kernel(mode):
    def kernel(phases_ref, u_ref, out_ref):
        th, tw, ci, co = THB, TWD, CI, CO

        def d(i, j):
            return phases_ref[0, i % 2, j % 2, i // 2 : i // 2 + th,
                              j // 2 : j // 2 + tw, :].astype(jnp.float32)

        def bt_row(a, j):
            if a == 0:
                return d(0, j) - d(2, j)
            if a == 1:
                return d(1, j) + d(2, j)
            if a == 2:
                return d(2, j) - d(1, j)
            return d(1, j) - d(3, j)

        if mode == "copy_only":
            m_acc = [phases_ref[0, 0, 0, :th, :tw, :].reshape(th * tw, ci).astype(jnp.float32)
                     for _ in range(16)]
        elif mode == "matmul_only":
            vm0 = phases_ref[0, 0, 0, :th, :tw, :].reshape(th * tw, ci)
            m_acc = [
                jax.lax.dot_general(vm0, u_ref[p], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for p in range(16)
            ]
        elif mode == "batched_dot":
            vs = []
            for a in range(4):
                r = [bt_row(a, j) for j in range(4)]
                for v in (r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3]):
                    vs.append(v.reshape(th * tw, ci).astype(jnp.bfloat16))
            vstack = jnp.stack(vs)  # [16, tiles, ci]
            m = jax.lax.dot_general(
                vstack, u_ref[...], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m_acc = [m[p] for p in range(16)]
        else:  # full / transform_only
            m_acc = []
            for a in range(4):
                r = [bt_row(a, j) for j in range(4)]
                for b, v in enumerate((r[0] - r[2], r[1] + r[2],
                                       r[2] - r[1], r[1] - r[3])):
                    vm = v.reshape(th * tw, ci).astype(jnp.bfloat16)
                    if mode == "transform_only":
                        m_acc.append(vm.astype(jnp.float32))
                    else:
                        m_acc.append(jax.lax.dot_general(
                            vm, u_ref[a * 4 + b], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16).astype(jnp.float32))

        def mrow(p, b):
            i = lambda a: m_acc[a * 4 + b]
            return (i(0) + i(1) + i(2)) if p == 0 else (i(1) - i(2) - i(3))

        for p in range(2):
            rb = [mrow(p, b) for b in range(4)]
            y0 = rb[0] + rb[1] + rb[2]
            y1 = rb[1] - rb[2] - rb[3]
            out_ref[0, p, 0] = y0.reshape(th, tw, CO).astype(jnp.bfloat16)
            out_ref[0, p, 1] = y1.reshape(th, tw, CO).astype(jnp.bfloat16)

    return kernel


def run(mode):
    x = jax.random.normal(jax.random.key(0), (B, H, W, CI), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, CI, CO), jnp.bfloat16) * 0.05
    u = transform_kernel(w).reshape(16, CI, CO).astype(jnp.bfloat16)

    call = pl.pallas_call(
        make_kernel(mode),
        grid=(B * S,),
        in_specs=[
            pl.BlockSpec((1, 2, 2, THB + 1, TWD + 1, CI),
                         lambda i: (i, 0, 0, 0, 0, 0)),
            pl.BlockSpec((16, CI, CO), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, 2, THB, TWD, CO),
                               lambda i: (i, 0, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * S, 2, 2, THB, TWD, CO), jnp.bfloat16),
    )

    @jax.jit
    def f(x, u):
        phases = polyphase_decompose(x).astype(jnp.bfloat16)
        if S > 1:
            phases = jnp.concatenate(
                [phases[:, :, :, k * THB : k * THB + THB + 1] for k in range(S)],
                axis=0,
            ).reshape(S, B, 2, 2, THB + 1, TWD + 1, CI
            ).transpose(1, 0, 2, 3, 4, 5, 6
            ).reshape(B * S, 2, 2, THB + 1, TWD + 1, CI)
        y = None
        for _ in range(REPS):
            y = call(phases, u)
        return y

    t = timed(f, x, u)
    dense_fl = 2 * B * H * W * 9 * CI * CO
    print(f"{mode:16s} {t*1e3:8.2f} ms/conv  dense-equiv {dense_fl/t/1e12:6.2f} TFLOP/s",
          flush=True)


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["full", "matmul_only", "transform_only", "batched_dot"]:
        run(mode)
