"""Latent diffusion over a (frozen) DAC codec's continuous latents.

The reference ships the DAC codec + RVQ + fine-tune VAE as latent-diffusion
support code (``src/models/backbones/dac/``, ``dac_vae.py``) without a task
module wiring them up; this task completes that path:

- frontend: audio -> frozen DAC encoder -> continuous latent z [B, T', D]
  (optionally through the fine-tune VAE bottleneck),
- diffusion runs over z with any formulation/sampler/backbone (1D nets
  consume [B, T', D] directly),
- generation: sampled z -> DAC decoder -> waveform, all inside the jitted
  sampling program.

Codec parameters load from an orbax checkpoint (``codec_ckpt_path``) and are
treated as constants (no gradients).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@dataclass
class DiffusionLatentTask:
    net: Any
    diffusion: Any
    sampler: Any
    noise_scheduler: Any
    noise_distribution: Any
    codec: Any  # DAC flax module
    codec_ckpt_path: Optional[str] = None
    codec_params: Any = None  # alternatively pass the pytree directly
    latent_scale: float = 1.0  # scales z into a ~unit-variance range
    generated_latent_length: int = 64
    generated_sample_class: int = 10
    audio_sample_rate: int = 16000
    total_test_samples: Optional[int] = None
    use_ema: bool = True
    use_phema: bool = False
    num_ema_snapshot_item: int = 96000
    ema_ckpt_path: Optional[str] = None

    def __post_init__(self):
        self.sigmas = self.noise_scheduler()
        if self.codec_params is None and self.codec_ckpt_path:
            import orbax.checkpoint as ocp
            from pathlib import Path

            self.codec_params = ocp.PyTreeCheckpointer().restore(
                str(Path(self.codec_ckpt_path).absolute())
            )
        if self.codec_params is None:
            raise ValueError("provide codec_params or codec_ckpt_path")
        self._latent_dim = self.codec.latent_dim or self.codec.encoder_dim * (
            2 ** len(self.codec.encoder_rates)
        )

    # -- frozen codec frontend -------------------------------------------------
    def audio_to_spec(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, T', D] scaled continuous latents (stop-gradient)."""
        x = audio[..., None] if audio.ndim == 2 else audio
        z = self.codec.apply(
            {"params": self.codec_params},
            x,
            method=lambda m, a: m.encoder(a),
        )
        return jax.lax.stop_gradient(z) * self.latent_scale

    def spec_to_audio(self, z: jnp.ndarray) -> jnp.ndarray:
        audio = self.codec.apply(
            {"params": self.codec_params},
            z / self.latent_scale,
            method=lambda m, zz: m.decode(zz),
        )
        return audio[..., 0]

    # -- network binding / loss / generation -----------------------------------
    def _net_fn(self, params, train: bool, cond_key=None):
        def net_fn(x, c_noise, cond_drop_prob=0.0, cond_drop_mask=None, **cond):
            rngs = {"cond": cond_key} if (train and cond_key is not None) else None
            return self.net.apply(
                {"params": params},
                x,
                c_noise,
                cond_drop_prob=cond_drop_prob,
                cond_drop_mask=cond_drop_mask,
                rngs=rngs,
                **cond,
            )

        return net_fn

    def loss_fn(self, params, batch, key):
        k_sigma, k_noise, k_cond = jax.random.split(key, 3)
        z = self.audio_to_spec(batch["audio"])
        sigmas = self.noise_distribution(k_sigma, z.shape[0])
        net_fn = self._net_fn(params, train=True, cond_key=k_cond)
        losses = self.diffusion.loss(
            z, net_fn, sigmas, key=k_noise, classes=batch["label"]
        )
        return jnp.mean(losses), losses

    def synthesize_from_noise(self, params, initial_noise, classes, key=None):
        net_fn = self._net_fn(params, train=False)
        fn = partial(
            self.diffusion.denoise_fn, net=net_fn, inference=True, classes=classes
        )
        z = self.sampler(initial_noise, fn, self.sigmas, key=key)
        return self.spec_to_audio(z)

    def noise_shape(self, batch_size: int):
        return (batch_size, self.generated_latent_length, self._latent_dim)

    def make_sample_fn(self) -> Callable:
        def sample(params, key, classes):
            k_noise, k_sampler = jax.random.split(key)
            noise = jax.random.normal(k_noise, self.noise_shape(classes.shape[0]))
            return self.synthesize_from_noise(params, noise, classes, key=k_sampler)

        return sample

    def test_classes(self, batch_size: int) -> jnp.ndarray:
        if self.generated_sample_class > 1:
            return jnp.arange(batch_size, dtype=jnp.int32) % self.generated_sample_class
        return jnp.zeros(batch_size, dtype=jnp.int32)
