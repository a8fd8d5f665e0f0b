"""Microbenchmark: fused Block Pallas kernel vs composite XLA path.

Times GroupNorm -> FiLM -> SiLU -> conv3x3 at the flagship UNet Block
shapes (batch = the 64-sample generation microbatch) both ways.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from audiodiffuser_tpu.ops.fused_block import (
    _ref_block,
    fused_gn_film_silu_conv3x3,
)

# (B, H, W, C) -> Co at the 64-microbatch; counts from the flagship trace
SHAPES = [
    (4, (64, 256, 128, 128), 128),
    (9, (64, 128, 64, 128), 128),
    (9, (64, 64, 32, 256), 256),
    (9, (64, 32, 16, 256), 256),
    (13, (64, 16, 8, 256), 256),
    (3, (64, 128, 64, 256), 128),
    (3, (64, 64, 32, 512), 256),
    (3, (64, 32, 16, 512), 256),
]


def timeit(fn, *args, iters=20):
    # device execution is serialized, so draining the last call's output to
    # host (sum + transfer) bounds all prior calls; block_until_ready alone
    # can be lazy through the remote device tunnel
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    total_x, total_f = 0.0, 0.0
    for count, (b, h, w, c), co in SHAPES:
        k = jax.random.key(0)
        x = jax.random.normal(k, (b, h, w, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        scale = 1.0 + 0.1 * jax.random.normal(k, (b, 1, 1, c), jnp.float32)
        shift = 0.1 * jax.random.normal(k, (b, 1, 1, c), jnp.float32)
        wk = jax.random.normal(k, (3, 3, c, co), jnp.bfloat16) * 0.05
        bias = jnp.zeros((co,), jnp.float32)

        ref = jax.jit(lambda *a: _ref_block(*a, groups=8))
        fused = jax.jit(lambda *a: fused_gn_film_silu_conv3x3(*a, 8))
        args = (x, gamma, beta, scale, shift, wk, bias)

        t_ref = timeit(ref, *args)
        t_fused = timeit(fused, *args)
        flops = 2 * b * h * w * 9 * c * co
        total_x += count * t_ref
        total_f += count * t_fused
        print(
            f"{count:2d}x ({b},{h:3d},{w:3d},{c:3d})->{co:3d}: "
            f"xla {t_ref*1e3:7.3f} ms ({flops/t_ref/1e12:5.1f} TF/s) | "
            f"fused {t_fused*1e3:7.3f} ms ({flops/t_fused/1e12:5.1f} TF/s) | "
            f"{t_ref/t_fused:4.2f}x"
        )
    print(
        f"\nweighted total per NFE: xla {total_x*1e3:.2f} ms, "
        f"fused {total_f*1e3:.2f} ms, speedup {total_x/total_f:.3f}x"
    )


if __name__ == "__main__":
    main()
