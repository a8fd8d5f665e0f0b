"""Raw-waveform diffusion task (no STFT frontend).

Covers the reference's waveform experiments — UNet1dBase on raw 16384-sample
clips (``configs/experiment/sc09/reflowunet_sc09_cfg.yaml``) and the
DiffWave/WaveNet backbone — with the same pure-function surface as
DiffusionSpecTask. The network consumes [B, T, in_channels] (or [B, T] for
WaveNet-style nets that handle their own channel dim).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@dataclass
class DiffusionWaveformTask:
    net: Any
    diffusion: Any
    sampler: Any
    noise_scheduler: Any
    noise_distribution: Any
    generated_sample_length: int = 16384
    generated_sample_class: int = 10
    in_channels: int = 1
    audio_sample_rate: int = 16000
    total_test_samples: Optional[int] = None
    use_ema: bool = True
    use_phema: bool = False
    num_ema_snapshot_item: int = 96000
    ema_ckpt_path: Optional[str] = None

    def __post_init__(self):
        self.sigmas = self.noise_scheduler()

    def audio_to_spec(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, T, C] network input (name kept for trainer parity)."""
        if self.in_channels == 1 and audio.ndim == 2:
            return audio[..., None]
        return audio

    def spec_to_audio(self, x: jnp.ndarray) -> jnp.ndarray:
        return x[..., 0] if x.ndim == 3 else x

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
        x = self.audio_to_spec(batch["audio"])
        sigmas = self.noise_distribution(k_sigma, x.shape[0])
        net_fn = self._net_fn(params, train=True, cond_key=k_cond)
        losses = self.diffusion.loss(
            x, net_fn, sigmas, key=k_noise, classes=batch["label"]
        )
        return jnp.mean(losses), losses

    def synthesize_from_noise(self, params, initial_noise, classes, key=None):
        net_fn = self._net_fn(params, train=False)
        fn = partial(
            self.diffusion.denoise_fn, net=net_fn, inference=True, classes=classes
        )
        x = self.sampler(initial_noise, fn, self.sigmas, key=key)
        return self.spec_to_audio(x)

    def noise_shape(self, batch_size: int):
        return (batch_size, self.generated_sample_length, self.in_channels)

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
