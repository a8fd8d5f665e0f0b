"""On-device mel-spectrogram frontend and Griffin-Lim inversion.

Supports the mel-diffusion workload (ADM UNet over log-mel spectrograms with
the STFT/mel frontend fused into the jitted step; BASELINE config 2). The
filterbank is the Slaney-normalized triangular bank; inversion goes
mel -> linear magnitude via the non-negative pseudo-inverse, then Griffin-Lim
phase recovery as a ``lax.fori_loop`` over the framework's stft/istft — the
whole generation pipeline stays on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .stft import istft, stft


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """[n_mels, n_fft//2+1] Slaney-style triangular filterbank (numpy)."""
    fmax = fmax or sr / 2

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)), np.float64)
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    enorm = 2.0 / (hz[2:] - hz[:-2])
    return (fb * enorm[:, None]).astype(np.float32)


def log_mel_spectrogram(
    audio: jnp.ndarray,
    fb: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """[B, T] -> [B, n_mels, frames] log-mel magnitudes."""
    spec = stft(audio, n_fft, hop_length, normalized=True)
    mag = jnp.abs(spec)  # [B, F, T]
    mel = jnp.einsum("mf,bft->bmt", fb, mag)
    return jnp.log(mel + eps)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "n_iter", "momentum"))
def griffin_lim(
    mag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    n_iter: int = 32,
    key: jax.Array | None = None,
    momentum: float = 0.99,
) -> jnp.ndarray:
    """Phase recovery from a linear magnitude spectrogram [B, F, T] -> [B, T].

    Fast Griffin-Lim (momentum-accelerated projections)."""
    if key is None:
        key = jax.random.key(0)
    phase = jax.random.uniform(key, mag.shape, minval=-jnp.pi, maxval=jnp.pi)
    spec = mag * jnp.exp(1j * phase)

    def project(spec):
        audio = istft(spec, n_fft, hop_length, normalized=True)
        return stft(audio, n_fft, hop_length, normalized=True)

    def body(_, carry):
        spec, prev_proj = carry
        proj = project(spec)
        accel = proj + momentum * (proj - prev_proj)
        angle = accel / jnp.maximum(jnp.abs(accel), 1e-10)
        return mag * angle, proj

    spec, _ = jax.lax.fori_loop(0, n_iter, body, (spec, spec))
    return istft(spec, n_fft, hop_length, normalized=True)


def mel_to_linear(mel: jnp.ndarray, fb: jnp.ndarray) -> jnp.ndarray:
    """Least-squares non-negative inversion of the filterbank [B,M,T]->[B,F,T]."""
    pinv = jnp.asarray(np.linalg.pinv(np.asarray(fb, np.float64)).astype(np.float32))
    lin = jnp.einsum("fm,bmt->bft", pinv, mel)
    return jnp.maximum(lin, 0.0)
