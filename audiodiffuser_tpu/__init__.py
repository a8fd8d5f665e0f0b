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
