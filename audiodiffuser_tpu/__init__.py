"""AudioDiffuser-TPU: a TPU-native JAX framework for score-based audio generation.

A ground-up rebuild of the capabilities of ``AgentCooper2002/AudioDiffuser``
(PyTorch/Lightning/Hydra) as an idiomatic JAX/Flax/Pallas stack:

- ``ops``        pure-jnp numerics: noise schedules, sigma distributions, STFT,
                 Brownian-bridge noise, attention kernels (XLA + Pallas).
- ``diffusion``  diffusion formulations (EDM, VE, VP, v-objective, rectified
                 flow) as pure loss/denoise functions.
- ``samplers``   ODE/SDE solvers compiled as ``lax.scan`` loops.
- ``models``     Flax denoiser backbones (UNet1d, UNet2d, ADM UNet, DiT,
                 WaveNet) + conditioning + DAC codec.
- ``tasks``      task modules gluing frontend (STFT), diffusion, sampler.
- ``training``   optax train loop, EMA (incl. power-function EMA), orbax
                 checkpointing.
- ``parallel``   device mesh / sharding utilities (data-parallel over ICI).
- ``data``       host-side audio data pipeline.
- ``config``     YAML + ``_target_`` component-injection config system.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Point JAX at the repo-local persistent compilation cache.

    Flagship compiles take minutes through the TPU AOT helper; every entry
    point (train/eval/generate/enhance/bench) shares this cache so repeat
    runs skip them. Opt out with ADT_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("ADT_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        cache = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


_enable_persistent_compile_cache()
