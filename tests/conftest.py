"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Mirrors the reference's CPU DDP-simulation strategy
(``tests/test_train.py:52-61`` uses ddp_spawn on 2 CPU procs); on JAX the
equivalent is ``xla_force_host_platform_device_count`` so multi-chip sharding
code paths run in-process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site customisation may pin JAX_PLATFORMS to a TPU plugin regardless of the
# environment variable; the config update after import always wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
