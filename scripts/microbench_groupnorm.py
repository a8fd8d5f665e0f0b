"""Microbenchmark: GroupNorm stats cost at flagship Block shapes.

Isolates the stats (reduce) pass vs the full GroupNorm+SiLU, to size the
opportunity for a fused one-pass Pallas stats kernel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from flax import linen as nn

SHAPES = [
    (64, 256, 128, 128),
    (64, 128, 64, 128),
    (64, 64, 32, 256),
]


def timeit(fn, *args, iters=30):
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    for b, h, w, c in SHAPES:
        x = jax.random.normal(jax.random.key(0), (b, h, w, c), jnp.bfloat16)
        gn = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=jnp.bfloat16)
        p = gn.init(jax.random.key(1), x)

        full = jax.jit(lambda x: nn.silu(gn.apply(p, x)))

        def stats_only(x):
            xr = x.reshape(b, h * w, 8, c // 8).astype(jnp.float32)
            s1 = jnp.sum(xr, axis=(1, 3))
            s2 = jnp.sum(xr * xr, axis=(1, 3))
            return s1 + s2

        st = jax.jit(stats_only)
        t_full = timeit(full, x)
        t_stats = timeit(st, x)
        nbytes = b * h * w * c * 2
        print(
            f"{(b,h,w,c)}: full GN+SiLU {t_full*1e3:7.3f} ms "
            f"({nbytes*3/t_full/1e9:5.0f} GB/s eff) | stats-only {t_stats*1e3:7.3f} ms "
            f"({nbytes/t_stats/1e9:5.0f} GB/s read)"
        )


if __name__ == "__main__":
    main()
