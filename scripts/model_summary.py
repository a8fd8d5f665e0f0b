#!/usr/bin/env python
"""Model summary: parameter counts and analytic forward FLOPs for any
experiment config.

Usage: python scripts/model_summary.py experiment=sc09/diffunet_complex_sc09 [overrides...]
"""
import os
import sys
from pathlib import Path

ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

import jax.numpy as jnp

from audiodiffuser_tpu.config import compose, instantiate
from audiodiffuser_tpu.ops.flops import count_flops


def main(argv=None):
    overrides = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(str(ROOT / "configs"), "train", overrides)
    model_cfg = dict(cfg.model)
    model_cfg.pop("optimizer", None)
    model_cfg.pop("scheduler", None)
    task = instantiate(model_cfg)

    shape = task.noise_shape(1)
    x = jnp.zeros(shape)
    t = jnp.zeros((1,))
    classes = jnp.zeros((1,), jnp.int32)
    params = task.net.init(jax.random.key(0), x, t, classes=classes)["params"]

    import numpy as np

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    fwd_flops = count_flops(
        lambda p, x, t, c: task.net.apply({"params": p}, x, t, classes=c),
        params, x, t, classes,
    )
    print(f"net:            {type(task.net).__name__}")
    print(f"input shape:    {shape[1:]} (per sample)")
    print(f"parameters:     {n_params:,}")
    print(f"forward FLOPs:  {fwd_flops/1e9:.2f} GFLOP / sample")
    n_steps = len(task.sigmas)
    print(f"sampler:        {type(task.sampler).__name__} ({n_steps}-step grid)")


if __name__ == "__main__":
    main()
