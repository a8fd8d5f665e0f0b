"""Log-mel-spectrogram diffusion task (ADM-UNet mel workload).

Same pure-function surface as DiffusionSpecTask, but the frontend is an
on-device log-mel transform and generation inverts mel -> linear magnitude
(filterbank pseudo-inverse) -> Griffin-Lim phase recovery -> waveform, all
inside the jitted sampling program. The network consumes [B, n_mels, T, 1].
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.mel import griffin_lim, log_mel_spectrogram, mel_filterbank, mel_to_linear


@dataclass
class DiffusionMelTask:
    net: Any
    diffusion: Any
    sampler: Any
    noise_scheduler: Any
    noise_distribution: Any
    n_fft: int = 510
    hop_length: int = 128
    n_mels: int = 80
    generated_frame_length: int = 128
    generated_sample_class: int = 10
    audio_sample_rate: int = 16000
    mel_eps: float = 1e-5
    mel_scale: float = 0.15  # scales log-mel into a ~unit-variance range
    mel_shift: float = 5.0   # recentres log(mel+eps) (~[-11.5, ...]) near 0
    griffin_lim_iters: int = 32
    total_test_samples: Optional[int] = None
    use_ema: bool = True
    use_phema: bool = False
    num_ema_snapshot_item: int = 96000
    ema_ckpt_path: Optional[str] = None

    def __post_init__(self):
        self.sigmas = self.noise_scheduler()
        self.fb = jnp.asarray(
            mel_filterbank(self.audio_sample_rate, self.n_fft, self.n_mels)
        )

    # -- frontend -------------------------------------------------------------
    def audio_to_spec(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, n_mels, frames, 1] normalized log-mel."""
        mel = log_mel_spectrogram(audio, self.fb, self.n_fft, self.hop_length, self.mel_eps)
        return ((mel + self.mel_shift) * self.mel_scale)[..., None]

    def spec_to_audio(self, x: jnp.ndarray, key=None) -> jnp.ndarray:
        """[B, n_mels, frames, 1] -> [B, T] via pinv filterbank + Griffin-Lim."""
        mel = jnp.exp(x[..., 0] / self.mel_scale - self.mel_shift) - self.mel_eps
        mel = jnp.maximum(mel, 0.0)
        mag = mel_to_linear(mel, self.fb)
        return griffin_lim(
            mag, self.n_fft, self.hop_length, self.griffin_lim_iters, key=key
        )

    # -- network binding ------------------------------------------------------
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
        spec = self.audio_to_spec(batch["audio"])
        sigmas = self.noise_distribution(k_sigma, spec.shape[0])
        net_fn = self._net_fn(params, train=True, cond_key=k_cond)
        losses = self.diffusion.loss(
            spec, net_fn, sigmas, key=k_noise, classes=batch["label"]
        )
        return jnp.mean(losses), losses

    def synthesize_from_noise(self, params, initial_noise, classes, key=None):
        net_fn = self._net_fn(params, train=False)
        fn = partial(
            self.diffusion.denoise_fn, net=net_fn, inference=True, classes=classes
        )
        x = self.sampler(initial_noise, fn, self.sigmas, key=key)
        return self.spec_to_audio(x, key=key)

    def noise_shape(self, batch_size: int):
        return (batch_size, self.n_mels, self.generated_frame_length, 1)

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
