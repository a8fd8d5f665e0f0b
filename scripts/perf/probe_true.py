#!/usr/bin/env python
"""Trustworthy re-measurement: every timed call gets a DIFFERENT input
scalar mixed into the data, so the tunnel cannot dedupe repeated identical
executions (suspected from impossible >peak TFLOP/s readings with fixed
args). Timing rule: scalar reduction + float() per batch of iters.
"""

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

REPS = 8


def timed(fn, *args, iters=6):
    """fn(seed_scalar, *args); a different seed per call defeats dedup."""
    out = fn(jnp.float32(0.5), *args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jnp.float32(1.0 + 0.001 * i), *args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / (iters * REPS)


def matmuls():
    n = 8192
    for dt, name in ((jnp.bfloat16, "bf16"), None, )[:1]:
        a = jnp.ones((n, n), dt) * 0.001
        b = jnp.ones((n, n), dt) * 0.001

        @jax.jit
        def f(s, a, b):
            x = a * s.astype(a.dtype)
            for _ in range(REPS):
                x = (x @ b).astype(a.dtype) * jnp.asarray(1e-3, a.dtype)
            return x

        t = timed(f, a, b)
        print(f"matmul {n} {name}: {t*1e3:7.3f} ms {2*n**3/t/1e12:6.1f} TFLOP/s", flush=True)

    a = jnp.ones((n, n), jnp.int8)
    b = jnp.ones((n, n), jnp.int8)

    @jax.jit
    def fi(s, a, b):
        x = (a + s.astype(jnp.int8)).astype(jnp.int8)
        for _ in range(REPS):
            y = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            x = (y >> 7).astype(jnp.int8)
        return x

    t = timed(fi, a, b)
    print(f"matmul {n} int8: {t*1e3:7.3f} ms {2*n**3/t/1e12:6.1f} TFLOP/s", flush=True)


def convs():
    for (bch, h, w_, c) in [(64, 128, 64, 128), (64, 64, 32, 256), (64, 16, 8, 256)]:
        fl = 2 * bch * h * w_ * 9 * c * c

        for dt, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
            x = jnp.ones((bch, h, w_, c), dt)
            k = jnp.ones((3, 3, c, c), dt)

            if dt == jnp.bfloat16:
                @jax.jit
                def f(s, x, k):
                    y = x * s.astype(x.dtype)
                    for _ in range(REPS):
                        y = jax.lax.conv_general_dilated(
                            y, k, (1, 1), "SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        ) * jnp.asarray(1e-3, x.dtype)
                    return y
            else:
                @jax.jit
                def f(s, x, k):
                    y = (x + s.astype(jnp.int8)).astype(jnp.int8)
                    for _ in range(REPS):
                        y32 = jax.lax.conv_general_dilated(
                            y, k, (1, 1), "SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.int32,
                        )
                        y = (y32 >> 7).astype(jnp.int8)
                    return y

            t = timed(f, x, k)
            print(f"{name} conv b{bch} {h}x{w_} c{c}: {t*1e3:7.3f} ms "
                  f"{fl/t/1e12:6.1f} TFLOP/s", flush=True)


def wino():
    import audiodiffuser_tpu.ops.winograd_pallas as wp
    from audiodiffuser_tpu.ops.winograd import transform_kernel

    for (bch, h, w_, c) in [(64, 128, 64, 128), (64, 64, 32, 256)]:
        fl = 2 * bch * h * w_ * 9 * c * c
        th, tw = h // 2, w_ // 2
        s = wp._row_split(th, tw, c, c)
        thb = th // s
        k = jnp.ones((3, 3, c, c), jnp.bfloat16) * 0.01
        u = transform_kernel(k).reshape(16, c, c).astype(jnp.bfloat16)
        x = jnp.ones((bch, h, w_, c), jnp.bfloat16)

        call = pl.pallas_call(
            functools.partial(wp._winograd_kernel, th=thb, tw=tw, ci=c, co=c,
                              out_dtype=jnp.bfloat16),
            grid=(bch * s,),
            in_specs=[
                pl.BlockSpec((1, thb + 1, tw + 1, 4 * c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((16, c, c), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, thb, tw, 4 * c), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bch * s, thb, tw, 4 * c), jnp.bfloat16),
        )

        @jax.jit
        def f(seed, x, u):
            phases = wp.polyphase_decompose(x * seed.astype(x.dtype)).astype(jnp.bfloat16)
            if s > 1:
                phases = jnp.concatenate(
                    [phases[:, m * thb : m * thb + thb + 1] for m in range(s)],
                    axis=0,
                ).reshape(s, bch, thb + 1, tw + 1, 4 * c).transpose(1, 0, 2, 3, 4
                ).reshape(bch * s, thb + 1, tw + 1, 4 * c)
            y = phases
            for _ in range(REPS):
                y2 = call(y[:, : thb + 1, : tw + 1, : 4 * c] * 1.0, u)
                # feed kernel output back as next input (pad to phase shape)
                y = jnp.pad(y2, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return y

        t = timed(f, x, u)
        print(f"wino kernel b{bch} {h}x{w_} c{c} (s={s}): {t*1e3:7.3f} ms "
              f"{fl/t/1e12:6.1f} TFLOP/s dense-equiv", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["matmul", "conv", "wino"]
    if "matmul" in which:
        matmuls()
    if "conv" in which:
        convs()
    if "wino" in which:
        wino()
