"""Learned audio embedder for FAD: VGGish architecture in Flax.

FAD's original recipe embeds audio with VGGish (Hershey et al. 2017: 16 kHz
mono -> 64-band log-mel at 25 ms / 10 ms -> 96x64 patches -> VGG-style conv
stack -> 128-d embedding). The public VGGish checkpoint cannot be fetched in
this environment (zero egress), so this module ships the exact architecture
plus a training head, and ``scripts/train_embedder.py`` fits it as an SC09
digit classifier — the classifier-embedding construction FID/FAD are built
on. With the official weights available, load them into the same module
(layer names and shapes match the slim checkpoint's conv/fc stacking order).

Embeddings from different embedder checkpoints are not comparable; FAD
reports must pin the embedder checksum (scripts/compute_fad.py logs it).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .fad import mel_filterbank

# --- VGGish log-mel frontend (16 kHz, 25 ms / 10 ms, 64 mels, 96 frames) ----

SAMPLE_RATE = 16000
WIN = 400  # 25 ms
HOP = 160  # 10 ms
N_FFT = 512
N_MELS = 64
PATCH_FRAMES = 96
MEL_FMIN, MEL_FMAX = 125.0, 7500.0
LOG_OFFSET = 0.01


def log_mel_patches(audio: jnp.ndarray) -> jnp.ndarray:
    """[B, T] waveforms -> [B*P, 96, 64] log-mel patches (jit-safe).

    Clips shorter than 0.975 s are zero-padded to one patch; longer clips
    contribute floor(frames/96) patches.
    """
    audio = jnp.atleast_2d(audio)
    b, t = audio.shape
    n_frames = max(1 + (t - WIN) // HOP, PATCH_FRAMES)
    need = WIN + (n_frames - 1) * HOP
    audio = jnp.pad(audio, ((0, 0), (0, max(need - t, 0))))
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(WIN)[None]
    frames = audio[:, idx]  # [B, F, WIN]
    window = jnp.asarray(np.hanning(WIN + 1)[:-1], jnp.float32)
    spec = jnp.abs(jnp.fft.rfft(frames * window, n=N_FFT, axis=-1))
    fb = jnp.asarray(
        mel_filterbank(SAMPLE_RATE, N_FFT, N_MELS, MEL_FMIN, MEL_FMAX).T,
        jnp.float32,
    )
    mel = jnp.log(spec**2 @ fb + LOG_OFFSET)  # [B, F, 64]
    p = n_frames // PATCH_FRAMES
    mel = mel[:, : p * PATCH_FRAMES].reshape(b * p, PATCH_FRAMES, N_MELS)
    return mel


class VGGish(nn.Module):
    """VGGish conv stack -> 128-d embedding (+ optional classifier head).

    ``width_mult`` < 1 shrinks every layer for tests / small datasets.
    """

    num_classes: int = 0  # >0 adds a classification head for training
    width_mult: float = 1.0
    embedding_dim: int = 128

    @nn.compact
    def __call__(self, patches: jnp.ndarray, train: bool = False):
        """[B, 96, 64] log-mel -> (embeddings [B, D], logits or None)."""
        w = lambda c: max(int(c * self.width_mult), 8)
        x = patches[..., None]  # NHWC
        for i, (blocks, ch) in enumerate([(1, 64), (1, 128), (2, 256), (2, 512)]):
            for j in range(blocks):
                x = nn.Conv(w(ch), (3, 3), name=f"conv{i+1}_{j+1}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(w(4096), name="fc1_1")(x))
        x = nn.relu(nn.Dense(w(4096), name="fc1_2")(x))
        emb = nn.Dense(self.embedding_dim, name="fc2")(x)
        logits = None
        if self.num_classes:
            logits = nn.Dense(self.num_classes, name="classifier")(nn.relu(emb))
        return emb, logits


class VGGishEmbedder:
    """Callable [B, T] waveform -> [N_patches, 128] embeddings for
    ``evaluation.fad.compute_fad`` (numpy in/out, jit inside)."""

    def __init__(self, params, width_mult: float = 1.0, num_classes: int = 0):
        self.model = VGGish(num_classes=num_classes, width_mult=width_mult)
        self.params = params
        # the log-mel frontend must live INSIDE the jit: eager jnp frontend
        # ops dispatch one-by-one, which is pathological on a remote device
        # (measured ~50 min for one 2.5k-clip FAD through the TPU tunnel)
        self._fwd = jax.jit(
            lambda p, audio: self.model.apply(
                {"params": p}, log_mel_patches(audio)
            )[0]
        )

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        return np.asarray(self._fwd(self.params, jnp.asarray(batch, jnp.float32)))


def load_embedder(ckpt_path: str, width_mult: float = 1.0) -> VGGishEmbedder:
    """Restore a trained embedder checkpoint (orbax dir from
    scripts/train_embedder.py)."""
    import orbax.checkpoint as ocp
    from pathlib import Path

    restored = ocp.PyTreeCheckpointer().restore(str(Path(ckpt_path).absolute()))
    params = restored["params"] if "params" in restored else restored
    wm = restored.get("width_mult", width_mult) if isinstance(restored, dict) else width_mult
    return VGGishEmbedder(params, width_mult=float(wm))
