"""Microbench the flagship UNet's actual in-model attention shapes:
XLA fused sdpa vs the Pallas flash kernel, forward only (sampling path).

Flagship (bench.py): attn at L2 (64x32=2048 tokens), L3 (32x16=512), mid
(16x8=128); batch 64 microbatch, heads=2, head_dim=128.

Usage: python scripts/perf/probe_attn_shapes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from audiodiffuser_tpu.models.attention import sdpa_xla
from audiodiffuser_tpu.ops.flash_attention import flash_attention


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))  # forced sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    shapes = [
        # (B, H, N, D) — flagship in-model shapes at microbatch 64
        (64, 2, 2048, 128),
        (64, 2, 512, 128),
        (64, 2, 128, 128),
    ]
    for (b, h, n, d) in shapes:
        key = jax.random.key(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, n, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, h, n, d), jnp.bfloat16)
        scale = d**-0.5

        xla_fn = jax.jit(lambda q, k, v: sdpa_xla(q, k, v, scale=scale))
        t_xla = timeit(xla_fn, q, k, v)
        row = f"B={b} H={h} N={n} D={d}: xla {t_xla:.3f} ms"
        if n % 128 == 0 and n >= 256:
            fl_fn = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=scale))
            try:
                t_fl = timeit(fl_fn, q, k, v)
                row += f", flash {t_fl:.3f} ms ({t_xla / t_fl:.2f}x)"
            except Exception as e:
                row += f", flash FAILED ({type(e).__name__})"
        print(row)


if __name__ == "__main__":
    main()
