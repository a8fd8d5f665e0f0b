"""Neural-codec (DAC) training task.

The reference ships the DAC codec, RVQ and fine-tune VAE as support code
(``src/models/backbones/dac/dac.py``, ``dac_vae.py``) without a task that
trains them; this task completes the latent-diffusion workflow so a codec can
be trained inside this framework and its frozen parameters fed to
:class:`tasks.latent_task.DiffusionLatentTask`:

    train codec -> scripts/export_codec_params.py -> latent diffusion

Losses (descript-audio-codec recipe minus the adversarial terms, which need
a discriminator the reference does not ship): waveform L1 + multi-scale STFT
magnitude/log-magnitude L1 + RVQ commitment (0.25) and codebook (1.0)
losses. Everything is jit-compiled; the multi-scale STFTs are static-shape
rfft banks that XLA fuses with the surrounding elementwise work.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, stft


def multiscale_stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_sizes: Sequence[int] = (2048, 512),
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Mean L1 between |STFT| and log|STFT| of x and y at several resolutions.

    [B, T] inputs; hop = n_fft // 4 (reference codec recipe's window/hop
    ratio). Returns a scalar.
    """
    total = 0.0
    for n_fft in fft_sizes:
        win = hann_window(n_fft, x.dtype)
        sx = jnp.abs(stft(x, n_fft, n_fft // 4, window=win, normalized=False))
        sy = jnp.abs(stft(y, n_fft, n_fft // 4, window=win, normalized=False))
        total = total + jnp.mean(jnp.abs(sx - sy))
        total = total + jnp.mean(
            jnp.abs(jnp.log(sx + eps) - jnp.log(sy + eps))
        )
    return total / len(fft_sizes)


@dataclass
class CodecTask:
    """Trains a DAC codec with the generic Trainer (reconstruction objective).

    ``net`` is the :class:`models.dac.DAC` module; ``make_sample_fn`` decodes
    unit-Gaussian latents as a decoder smoke signal for the val-audio hook.
    """

    net: Any
    waveform_weight: float = 1.0
    stft_weight: float = 1.0
    commitment_weight: float = 0.25
    codebook_weight: float = 1.0
    stft_fft_sizes: Sequence[int] = field(default_factory=lambda: (2048, 512))
    generated_latent_length: int = 64
    generated_sample_class: int = 1
    audio_sample_rate: int = 16000
    total_test_samples: Optional[int] = None
    use_ema: bool = False
    use_phema: bool = False
    num_ema_snapshot_item: int = 96000
    ema_ckpt_path: Optional[str] = None

    def __post_init__(self):
        self._latent_dim = self.net.latent_dim or self.net.encoder_dim * (
            2 ** len(self.net.encoder_rates)
        )

    # identity frontend: the codec consumes raw waveforms
    def audio_to_spec(self, audio: jnp.ndarray) -> jnp.ndarray:
        return audio[..., None] if audio.ndim == 2 else audio

    def init_params(self, key, example_batch):
        """Trainer hook: the codec's signature is (audio, n_quantizers, train),
        not the diffusion nets' (x, t, classes)."""
        audio = self.audio_to_spec(jnp.asarray(example_batch["audio"][:1]))
        return self.net.init(
            {"params": key, "quantizer": key}, audio, train=False
        )["params"]

    def loss_fn(self, params, batch, key):
        audio = jnp.asarray(batch["audio"])
        x = self.audio_to_spec(audio)
        out = self.net.apply(
            {"params": params}, x, train=True, rngs={"quantizer": key}
        )
        recon = out["audio"][..., 0]
        l1 = jnp.mean(jnp.abs(recon - audio))
        spec = multiscale_stft_loss(recon, audio, self.stft_fft_sizes)
        loss = (
            self.waveform_weight * l1
            + self.stft_weight * spec
            + self.commitment_weight * out["vq/commitment_loss"]
            + self.codebook_weight * out["vq/codebook_loss"]
        )
        return loss, {
            "recon/l1": l1,
            "recon/stft": spec,
            "vq/commitment_loss": out["vq/commitment_loss"],
            "vq/codebook_loss": out["vq/codebook_loss"],
        }

    def reconstruct(self, params, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, T] through the full encode/quantize/decode path."""
        out = self.net.apply(
            {"params": params}, self.audio_to_spec(audio), train=False
        )
        return out["audio"][..., 0]

    # -- Trainer sampling hooks (decoder smoke test; a codec has no prior) ----
    def make_sample_fn(self) -> Callable:
        def sample(params, key, classes):
            z = jax.random.normal(
                key, (classes.shape[0], self.generated_latent_length, self._latent_dim)
            )
            audio = self.net.apply(
                {"params": params}, z, method=lambda m, zz: m.decode(zz)
            )
            return audio[..., 0]

        return sample

    def test_classes(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros(batch_size, dtype=jnp.int32)
