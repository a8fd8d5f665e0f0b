"""On-device STFT / iSTFT with torch.stft-compatible semantics.

The reference computes its complex-spectrogram frontend with
``torch.stft(audio, n_fft, hop_length, center=True, window=hann(n_fft,
periodic=True), normalized=True, return_complex=True)`` and the matching
``torch.istft`` (``src/models/diffunet_complex_module.py:47-48,97-99,109-110``),
plus amplitude compression ``spec_fwd``/``spec_back``
(``src/models/utils.py:8-28``).

This module reimplements those semantics as pure jnp functions that jit and
run on TPU (framing as a gather + batched rfft on the MXU-adjacent FFT unit;
overlap-add as a scatter-add), so the whole frontend fuses into the training
step with no host round-trip:

- center=True reflect-padding by n_fft//2.
- ``normalized=True`` scales the forward transform by n_fft**-0.5 and the
  inverse by n_fft**0.5 (frame-length normalisation, matching torch).
- iSTFT divides by the overlap-added squared-window envelope and trims the
  centre padding; output length is (num_frames - 1) * hop_length.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, identical to torch.hann_window(n, periodic=True)."""
    k = jnp.arange(n, dtype=dtype)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * k / n))


def _frame_indices(num_frames: int, n_fft: int, hop_length: int) -> jnp.ndarray:
    starts = jnp.arange(num_frames) * hop_length
    offs = jnp.arange(n_fft)
    return starts[:, None] + offs[None, :]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "normalized", "center"))
def stft(
    audio: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray | None = None,
    normalized: bool = True,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT of [B, T] (or [T]) real audio -> [B, n_fft//2+1, frames]."""
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    if window is None:
        window = hann_window(n_fft, audio.dtype)

    if center:
        pad = n_fft // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")

    t = audio.shape[-1]
    num_frames = 1 + (t - n_fft) // hop_length
    idx = _frame_indices(num_frames, n_fft, hop_length)
    frames = audio[:, idx] * window  # [B, N, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)  # [B, N, F]
    if normalized:
        spec = spec * (n_fft**-0.5)
    spec = jnp.swapaxes(spec, -1, -2)  # [B, F, N]
    return spec[0] if squeeze else spec


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "normalized", "center", "length"))
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray | None = None,
    normalized: bool = True,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse of :func:`stft`. spec [B, n_fft//2+1, frames] -> audio [B, T]."""
    squeeze = spec.ndim == 2
    if squeeze:
        spec = spec[None]
    if window is None:
        window = hann_window(n_fft, jnp.float32)

    if normalized:
        spec = spec * (n_fft**0.5)

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)  # [B, N, n_fft]
    frames = frames * window

    num_frames = frames.shape[1]
    t_pad = n_fft + (num_frames - 1) * hop_length
    idx = _frame_indices(num_frames, n_fft, hop_length)

    audio = jnp.zeros((frames.shape[0], t_pad), frames.dtype)
    audio = audio.at[:, idx].add(frames)
    env = jnp.zeros((t_pad,), frames.dtype).at[idx].add(window**2)

    if center:
        pad = n_fft // 2
        audio = audio[:, pad : t_pad - pad]
        env = env[pad : t_pad - pad]
    audio = audio / jnp.maximum(env, 1e-11)

    if length is not None:
        audio = audio[:, :length]
    return audio[0] if squeeze else audio


def spec_fwd(
    spec: jnp.ndarray, spec_abs_exponent: float = 0.5, spec_factor: float = 0.3
) -> jnp.ndarray:
    """Amplitude-compress a complex spec: |s|^e * exp(i angle(s)) * factor."""
    if spec_abs_exponent != 1:
        e = spec_abs_exponent
        mag = jnp.abs(spec)
        # |s|^e * s/|s| = |s|^(e-1) * s, guarded at 0 (phase of 0 is 0).
        scale = jnp.where(mag > 0, mag ** (e - 1.0), 0.0)
        spec = spec * scale
    return spec * spec_factor


def spec_back(
    spec: jnp.ndarray, spec_abs_exponent: float = 0.5, spec_factor: float = 0.3
) -> jnp.ndarray:
    """Inverse of :func:`spec_fwd`."""
    spec = spec / spec_factor
    if spec_abs_exponent != 1:
        e = spec_abs_exponent
        mag = jnp.abs(spec)
        scale = jnp.where(mag > 0, mag ** (1.0 / e - 1.0), 0.0)
        spec = spec * scale
    return spec
