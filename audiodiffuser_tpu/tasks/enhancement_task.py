"""Diffusion-based speech enhancement / source extraction task.

The reference ships mixture-augmentation utilities (``src/utils/audio.py``:
SegmentMixer, dynamic_loudnorm, HighPass/LowPass — see
``data/audio_utils.py`` here) but no task consuming them; this task completes
that path with conditional diffusion enhancement in the compressed
complex-STFT domain (the SGMSE recipe shape, with this framework's EDM-style
preconditioning):

- the denoiser is conditioned on ``spec(mixture)`` through the backbone's
  condition-encoder branch (``UNet2dBase(use_condition_block=True)``, the
  reference's condition-UNet pattern; ``inj_channels``) and learns the
  clean spec;
- training mixtures are synthesized **inside the jitted step** by
  ``mix_batch`` — a lax-friendly SegmentMixer: each item is summed with
  loudness-scaled rolls of the rest of the batch at random SNRs, then
  peak-renormalized. Host-side SegmentMixer output is used instead whenever
  the batch already carries a ``"mixture"`` key;
- ``enhance(params, mixture, key)`` is the deployment entry: mixture
  waveform in, enhanced waveform out, one jittable program.

CFG is intentionally not used here (``cond_scale=1``): the conditioning is
dense (the mixture spec) rather than a droppable label.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, istft, spec_back, spec_fwd, stft


def mix_batch(
    key: jax.Array,
    audio: jnp.ndarray,
    max_mix_num: int = 3,
    lower_db: float = -10.0,
    higher_db: float = 10.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jit-native SegmentMixer (reference src/utils/audio.py:171-232 recipe):
    [B, T] clean -> (clean', mixture). Interference for item n is the other
    batch items (jnp.roll) each rescaled to a random energy ratio in
    [lower_db, higher_db] relative to the clean item; both outputs share one
    peak renorm so the pair stays aligned."""
    b = audio.shape[0]
    k_num, k_db = jax.random.split(key)
    # per-item number of interferers in [1, max_mix_num - 1]
    n_per_item = jax.random.randint(k_num, (b,), 1, max_mix_num)
    dbs = jax.random.uniform(
        k_db, (max_mix_num - 1, b), minval=lower_db, maxval=higher_db
    )

    energy = jnp.mean(audio**2, axis=-1, keepdims=True) + 1e-10
    noise = jnp.zeros_like(audio)
    for i in range(1, max_mix_num):
        other = jnp.roll(audio, i, axis=0)
        other_energy = jnp.mean(other**2, axis=-1, keepdims=True) + 1e-10
        # rescale `other` so its energy sits dbs[i-1] dB relative to clean
        gain = jnp.sqrt(energy / other_energy) * 10.0 ** (
            dbs[i - 1][:, None] / 20.0
        )
        mask = (i <= n_per_item)[:, None].astype(audio.dtype)
        noise = noise + other * gain * mask

    mixture = audio + noise
    peak = jnp.max(jnp.abs(mixture), axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, 0.9 / jnp.maximum(peak, 1e-9))
    return audio * scale, mixture * scale


@dataclass
class DiffusionEnhancementTask:
    """Conditional diffusion enhancement over compressed complex STFTs.

    ``net`` must accept ``inj_channels`` with the mixture spec's channel
    count — e.g. UNet2dBase(channels=2, use_condition_block=True).
    """

    net: Any
    diffusion: Any
    sampler: Any
    noise_scheduler: Any
    noise_distribution: Any
    spec_abs_exponent: float = 0.5
    spec_factor: float = 0.3
    n_fft: int = 510
    hop_length: int = 128
    max_mix_num: int = 3
    snr_lower_db: float = -10.0
    snr_higher_db: float = 10.0
    generated_frame_length: int = 128
    generated_sample_class: int = 1
    audio_sample_rate: int = 16000
    total_test_samples: Optional[int] = None
    use_ema: bool = True
    use_phema: bool = False
    num_ema_snapshot_item: int = 96000
    ema_ckpt_path: Optional[str] = None

    def __post_init__(self):
        self.window = hann_window(self.n_fft)
        self.sigmas = self.noise_scheduler()

    # -- frontend (same compressed complex STFT as DiffusionSpecTask) ---------
    def audio_to_spec(self, audio: jnp.ndarray) -> jnp.ndarray:
        spec = stft(
            audio, self.n_fft, self.hop_length, window=self.window, normalized=True
        )
        spec = spec_fwd(spec, self.spec_abs_exponent, self.spec_factor)
        return jnp.stack([spec.real, spec.imag], axis=-1)

    def spec_to_audio(self, spec2: jnp.ndarray) -> jnp.ndarray:
        spec = jax.lax.complex(spec2[..., 0], spec2[..., 1])
        spec = spec_back(spec, self.spec_abs_exponent, self.spec_factor)
        return istft(
            spec, self.n_fft, self.hop_length, window=self.window, normalized=True
        )

    # -- network binding: mixture spec through the condition-encoder branch ---
    def _net_fn(self, params, cond_spec: jnp.ndarray):
        def net_fn(x, c_noise, cond_drop_prob=0.0, cond_drop_mask=None, **cond):
            return self.net.apply(
                {"params": params}, x, c_noise, inj_channels=cond_spec, **cond
            )

        return net_fn

    def loss_fn(self, params, batch, key):
        k_mix, k_sigma, k_noise = jax.random.split(key, 3)
        audio = jnp.asarray(batch["audio"])
        if "mixture" in batch:  # host-side SegmentMixer already ran
            clean, mixture = audio, jnp.asarray(batch["mixture"])
        else:
            clean, mixture = mix_batch(
                k_mix,
                audio,
                self.max_mix_num,
                self.snr_lower_db,
                self.snr_higher_db,
            )
        spec_clean = self.audio_to_spec(clean)
        spec_mix = self.audio_to_spec(mixture)
        sigmas = self.noise_distribution(k_sigma, spec_clean.shape[0])
        net_fn = self._net_fn(params, spec_mix)
        losses = self.diffusion.loss(spec_clean, net_fn, sigmas, key=k_noise)
        return jnp.mean(losses), losses

    # -- deployment entry ------------------------------------------------------
    def enhance(self, params, mixture: jnp.ndarray, key) -> jnp.ndarray:
        """[B, T] noisy waveform -> [B, T] enhanced waveform (jittable)."""
        spec_mix = self.audio_to_spec(mixture)
        k_noise, k_sampler = jax.random.split(key)
        # unit noise: the sampler applies the sigma_max scaling itself
        noise = jax.random.normal(k_noise, spec_mix.shape)
        fn = partial(self.diffusion.denoise_fn, net=self._net_fn(params, spec_mix), inference=True)
        spec2 = self.sampler(noise, fn, self.sigmas, key=k_sampler)
        audio = self.spec_to_audio(spec2)
        return audio[:, : mixture.shape[-1]]

    # -- Trainer hooks ----------------------------------------------------------
    def init_params(self, key, example_batch):
        audio = jnp.asarray(example_batch["audio"][:1])
        spec = self.audio_to_spec(audio)
        return self.net.init(
            {"params": key, "cond": key},
            spec,
            jnp.zeros((1,)),
            inj_channels=spec,
        )["params"]

    def make_sample_fn(self) -> Callable:
        """Val-audio smoke hook: enhances a unit-Gaussian 'mixture'. Real
        evaluation should call ``enhance`` on actual noisy audio."""

        def sample(params, key, classes):
            k_mix, k_run = jax.random.split(key)
            t = (self.generated_frame_length - 1) * self.hop_length
            mixture = 0.1 * jax.random.normal(k_mix, (classes.shape[0], t))
            return self.enhance(params, mixture, k_run)

        return sample

    def test_classes(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros(batch_size, dtype=jnp.int32)
