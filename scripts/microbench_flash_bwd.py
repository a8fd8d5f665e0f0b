"""Measure the fused flash-attention backward on the TPU: train-step time and
peak memory vs the XLA attention path at long sequence lengths.

VERDICT item: 'fused backward + blocked K/V streaming ... Done = bwd kernel
parity test + a measured train-step memory/time win at >= 4096 tokens.'
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from audiodiffuser_tpu.models.attention import sdpa_xla
from audiodiffuser_tpu.ops import flash_attention as fa

SHAPES = [
    # (batch*heads, n, d)
    (8, 4096, 64),
    (8, 8192, 64),
    (4, 16384, 64),
]


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


def main():
    for bh, n, d in SHAPES:
        scale = d**-0.5
        q = jax.random.normal(jax.random.key(0), (bh, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (bh, n, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (bh, n, d), jnp.bfloat16)

        def loss_flash(q, k, v):
            return jnp.sum(
                fa._flash_attention(q, k, v, None, scale, 128, 128, 1)
                .astype(jnp.float32) ** 2
            )

        def loss_xla(q, k, v):
            return jnp.sum(
                sdpa_xla(
                    q[:, None], k[:, None], v[:, None], scale=scale
                )[:, 0].astype(jnp.float32) ** 2
            )

        gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
        gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

        def mem(fn):
            try:
                a = fn.lower(q, k, v).compile().memory_analysis()
                return getattr(a, "temp_size_in_bytes", 0) / 1e6
            except Exception:
                return float("nan")

        try:
            tf_ = timeit(lambda a, b, c: gf(a, b, c)[0], q, k, v)
            mf = mem(gf)
        except Exception as e:  # noqa: BLE001
            print(f"BH{bh} N{n}: flash bwd FAILED: {type(e).__name__}: {e}")
            continue
        try:
            tx = timeit(lambda a, b, c: gx(a, b, c)[0], q, k, v)
            mx = mem(gx)
        except Exception as e:  # noqa: BLE001
            tx, mx = float("inf"), float("nan")
            print(f"BH{bh} N{n}: XLA bwd failed ({type(e).__name__}) — OOM-class")
        print(
            f"BH{bh} N{n} d{d}: grad step xla {tx*1e3:8.2f} ms / {mx:9.1f} MB temp"
            f" | flash {tf_*1e3:8.2f} ms / {mf:9.1f} MB temp"
            f" | speedup {tx/tf_:5.2f}x"
        )


if __name__ == "__main__":
    main()
