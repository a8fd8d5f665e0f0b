#!/usr/bin/env python
"""Pre-warm the persistent compile cache for the soak's eval sampler grid.

Builds each eval config's task, initialises throwaway params, and lowers +
compiles the generation closure — the persistent cache then serves eval.py
instantly. Compiles run on the AOT helper, so this can overlap training.

Usage: python scripts/warm_compile_eval.py [idx ...]
"""
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from audiodiffuser_tpu.config import compose, instantiate
from train import build_trainer_and_task

JOBS = [
    (["experiment=sc09/diffunet_complex_sc09_phema",
      "model.sampler.num_steps=16", "model.noise_scheduler.num_steps=16"], {}),
    (["experiment=sc09/diffunet_complex_sc09_phema"], {}),
    (["experiment=sc09_inference/diffunet_complex_sc09_phema_eval_dpm",
      "sampler_steps=16"], {}),
    (["experiment=sc09_inference/diffunet_complex_sc09_phema_eval_dpm"], {}),
    (["experiment=sc09_inference/diffunet_complex_sc09_phema_eval_dpm"],
     {"ADT_INT8": "1"}),
]


def main():
    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(JOBS)))
    for i in idxs:
        overrides, env = JOBS[i]
        os.environ.pop("ADT_INT8", None)
        os.environ.update(env)
        cfg = compose(str(ROOT / "configs"), "eval",
                      overrides + ["ckpt_path=/dev/null", "data.data_dir=/tmp/x",
                                   "paths.output_dir=/tmp/warm"])
        task = build_trainer_and_task(cfg, Path("/tmp/warm"))[1]
        task.sample_microbatch = 64
        classes = jnp.arange(128, dtype=jnp.int32) % 10
        params = task.net.init(
            jax.random.key(0), jnp.zeros((1, 256, 128, 2)), jnp.zeros((1,)),
            classes=classes[:1],
        )["params"]
        if env.get("ADT_INT8") == "1":
            task.calibrate_int8_scales(params, jax.random.key(7))
        t0 = time.perf_counter()
        jax.jit(task.make_sample_fn()).lower(
            params, jax.random.key(1), classes
        ).compile()
        print(f"job {i} ({' '.join(overrides)[:70]}): "
              f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
