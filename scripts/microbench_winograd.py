"""Microbenchmark: fused Winograd Pallas kernel vs XLA conv at the flagship
UNet Block shapes (GroupNorm-epilogue scale/shift + SiLU + 3x3 SAME conv).

Shapes are the post-downsample resolutions of the memory-efficient
UNet2dBase(dim=128, dim_mults=[1,2,2,2]) on a 256x128 complex STFT
(configs/experiment/sc09/diffunet_complex_sc09.yaml).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from audiodiffuser_tpu.ops.winograd_pallas import winograd_conv3x3

SHAPES = [
    # (B, H, W, Cin, Cout)
    (64, 128, 64, 128, 128),
    (64, 64, 32, 256, 256),
    (64, 32, 16, 256, 256),
    (64, 16, 8, 256, 256),
    (128, 128, 64, 128, 128),
]


def xla_fused(x, w, scale, shift):
    y = jax.nn.silu(x * scale + shift)
    return jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def wino_fused(x, w, scale, shift):
    return winograd_conv3x3(x, w, scale=scale, shift=shift, silu=True)


def timeit(fn, *args, iters=20):
    # block_until_ready can be lazy through remote device tunnels; a scalar
    # reduction + host transfer is authoritative (same strategy as bench.py)
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    for b, h, wd, ci, co in SHAPES:
        kx = jax.random.key(0)
        x = jax.random.normal(kx, (b, h, wd, ci), jnp.bfloat16)
        w = (jax.random.normal(jax.random.key(1), (3, 3, ci, co)) * 0.05).astype(
            jnp.bfloat16
        )
        scale = jnp.ones((ci,), jnp.bfloat16) * 1.1
        shift = jnp.zeros((ci,), jnp.bfloat16) + 0.05
        fx = jax.jit(xla_fused)
        fw = jax.jit(wino_fused)
        try:
            tw_ = timeit(fw, x, w, scale, shift)
        except Exception as e:  # noqa: BLE001
            print(f"{(b,h,wd,ci,co)}: winograd FAILED: {type(e).__name__}: {e}")
            continue
        tx = timeit(fx, x, w, scale, shift)
        flops = 2 * b * h * wd * ci * co * 9
        print(
            f"B{b} {h}x{wd} {ci}->{co}: xla {tx*1e3:7.3f} ms ({flops/tx/1e12:5.1f} TF/s) | "
            f"wino {tw_*1e3:7.3f} ms ({flops/tw_/1e12:5.1f} TF/s-equiv) | "
            f"speedup {tx/tw_:4.2f}x"
        )
        # parity check at bf16 tolerance
        ref = fx(x, w, scale, shift)
        got = fw(x, w, scale, shift)
        err = float(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max())
        print(f"    max|err| {err:.4f} (scale {float(jnp.abs(ref).max()):.2f})")


if __name__ == "__main__":
    main()
