"""Bisect flash-attention kernel health across (N, d, block) on real TPU.

The longseq probe (DiT 16384 tokens, hidden 256 / 2 heads => d=128) died with
a poisoned-client FAILED_PRECONDITION, i.e. some earlier kernel launch
faulted on device. This driver runs each shape in a SUBPROCESS so one fault
cannot wedge the sweep, covering forward-only and forward+backward at the
shapes between the known-good microbench (d=64) and the probe (d=128).

Usage: python scripts/perf/diag_flash_shapes.py
"""
import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
sys.path.insert(0, ROOT)


def run_case(n, d, bh, bwd, block_q=0, block_k=0):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    from audiodiffuser_tpu.ops.flash_attention import flash_attention

    kw = {}
    if block_q:
        kw["block_q"] = block_q
    if block_k:
        kw["block_k"] = block_k
    q = jax.random.normal(jax.random.key(0), (1, bh, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (1, bh, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (1, bh, n, d), jnp.bfloat16)

    if bwd:
        def loss(q, k, v):
            return flash_attention(q, k, v, scale=d ** -0.5, **kw).astype(jnp.float32).sum()

        out = jax.jit(jax.grad(loss))(q, k, v)
        val = float(jnp.abs(out).mean())
    else:
        out = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=d ** -0.5, **kw))(q, k, v)
        val = float(jnp.abs(out.astype(jnp.float32)).mean())
    print(json.dumps({"n": n, "d": d, "bh": bh, "bwd": bwd,
                      "block_q": block_q, "block_k": block_k,
                      "ok": True, "mean_abs": round(val, 4)}))


def main():
    if len(sys.argv) > 1:
        n, d, bh, bwd, bq, bk = map(int, sys.argv[1:7])
        return run_case(n, d, bh, bool(bwd), bq, bk)

    cases = [
        # known-good microbench regime first (sanity)
        (8192, 64, 8, 0, 0, 0), (8192, 64, 8, 1, 0, 0),
        # the probe's failing regime, decomposed
        (16384, 64, 8, 0, 0, 0), (16384, 64, 8, 1, 0, 0),
        (8192, 128, 8, 0, 0, 0), (8192, 128, 8, 1, 0, 0),
        (16384, 128, 2, 0, 0, 0), (16384, 128, 2, 1, 0, 0),
        (16384, 128, 8, 0, 0, 0), (16384, 128, 8, 1, 0, 0),
        # smaller blocks at the failing shape
        (16384, 128, 8, 1, 256, 512), (16384, 128, 8, 1, 128, 128),
    ]
    for c in cases:
        p = subprocess.run(
            [sys.executable, __file__, *map(str, c)],
            capture_output=True, text=True, timeout=900,
        )
        line = next((l for l in reversed(p.stdout.strip().splitlines())
                     if l.startswith("{")), None)
        if p.returncode == 0 and line:
            print(line, flush=True)
        else:
            tail = (p.stderr or "").strip().splitlines()[-3:]
            print(json.dumps({"case": c, "ok": False, "rc": p.returncode,
                              "err": " | ".join(tail)[-300:]}), flush=True)


if __name__ == "__main__":
    main()
