"""Frechet Audio Distance (FAD) evaluation harness.

The benchmark definition (BASELINE.md) calls for FAD parity on SC09
generations. This module provides:

- the Frechet distance between Gaussian embedding statistics
  (mu/Sigma of real vs generated sets) with a stable matrix sqrt,
- a pluggable embedding interface: any callable mapping a [B, T] waveform
  batch to [B, D] embeddings can be used (e.g. a VGGish/CLAP port when its
  weights are available),
- a built-in ``LogMelEmbedder`` default: per-frame log-mel frames as
  embedding vectors — the classical FAD recipe with a spectral front end
  instead of a learned network. Distances are comparable *within* a fixed
  embedder only (as with any FAD variant).

CLI: ``python scripts/compute_fad.py --real DIR --fake DIR``.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterable, Tuple

import numpy as np
from scipy import linalg

from ..data.sc09 import load_wav


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2}), numerically guarded."""
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    # guard tiny asymmetries
    tr_covmean = np.trace(covmean)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_covmean)


def gaussian_stats(embeddings: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = embeddings.mean(axis=0)
    sigma = np.cov(embeddings, rowvar=False)
    return mu, np.atleast_2d(sigma)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float = None
) -> np.ndarray:
    """Slaney-style triangular mel filterbank [n_mels, n_fft//2+1]."""
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
    return fb * enorm[:, None]


@dataclass
class LogMelEmbedder:
    """Log-mel frame embeddings (the spectral-frontend FAD recipe)."""

    sample_rate: int = 16000
    n_fft: int = 512
    hop: int = 256
    n_mels: int = 64
    frames_per_embedding: int = 8  # stack consecutive frames

    def __post_init__(self):
        self.fb = mel_filterbank(self.sample_rate, self.n_fft, self.n_mels)
        self.window = np.hanning(self.n_fft + 1)[:-1]

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        """[B, T] -> [B*num_windows, n_mels*frames_per_embedding]."""
        batch = np.atleast_2d(np.asarray(batch, np.float64))
        embs = []
        for audio in batch:
            n_frames = 1 + (len(audio) - self.n_fft) // self.hop
            if n_frames < self.frames_per_embedding:
                audio = np.pad(
                    audio, (0, self.n_fft + self.hop * self.frames_per_embedding)
                )
                n_frames = 1 + (len(audio) - self.n_fft) // self.hop
            idx = (
                np.arange(n_frames)[:, None] * self.hop + np.arange(self.n_fft)[None]
            )
            frames = audio[idx] * self.window
            power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
            mel = np.log(power @ self.fb.T + 1e-8)  # [n_frames, n_mels]
            k = self.frames_per_embedding
            usable = (n_frames // k) * k
            emb = mel[:usable].reshape(-1, k * self.n_mels)
            embs.append(emb)
        return np.concatenate(embs, axis=0)


def compute_fad(
    real: Iterable[np.ndarray],
    generated: Iterable[np.ndarray],
    embedder: Callable[[np.ndarray], np.ndarray] = None,
) -> float:
    """FAD between two iterables of waveform batches."""
    embedder = embedder or LogMelEmbedder()
    real_emb = np.concatenate([embedder(b) for b in real], axis=0)
    gen_emb = np.concatenate([embedder(b) for b in generated], axis=0)
    mu_r, s_r = gaussian_stats(real_emb)
    mu_g, s_g = gaussian_stats(gen_emb)
    return frechet_distance(mu_r, s_r, mu_g, s_g)


def _iter_dir(path, batch_size=128):
    files = sorted(Path(path).rglob("*.wav"))
    for i in range(0, len(files), batch_size):
        chunk = files[i : i + batch_size]
        audios = [load_wav(str(f))[1] for f in chunk]
        n = min(len(a) for a in audios)
        yield np.stack([a[:n] for a in audios])


def _dir_fingerprint(path) -> str:
    """Content fingerprint of a wav directory: hash over sorted
    (relative name, size, mtime) — stat-only, no file reads. Regenerating
    samples in place (same filenames) changes mtimes and invalidates it."""
    import hashlib

    root = Path(path)
    h = hashlib.sha1()
    count = total = 0
    for f in sorted(root.rglob("*.wav")):
        st = f.stat()
        # relative path (not basename): moving wavs between subdirectories
        # with preserved name/size/mtime must invalidate the cache
        h.update(f"{f.relative_to(root)}:{st.st_size}:{st.st_mtime_ns}\n".encode())
        count += 1
        total += st.st_size
    h.update(f"n={count};bytes={total}".encode())
    return h.hexdigest()


def dir_stats(
    path, embedder=None, cache_key: str = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Gaussian (mu, sigma) of a directory's embeddings.

    With ``cache_key`` (e.g. the embedder checkpoint fingerprint), the stats
    are memoised in ``<dir>/.fad_stats_<key>.npz`` so repeated comparisons
    against the same corpus (one real set vs many generated sets) embed it
    only once. Stats from different embedders never collide: the key must
    identify the embedder. The cache also records a content fingerprint of
    the directory and is discarded when the wav set changes — an eval re-run
    that regenerates samples in place must not serve the old distribution.
    """
    cache = Path(path) / f".fad_stats_{cache_key}.npz" if cache_key else None
    fp = _dir_fingerprint(path) if cache is not None else None
    if cache is not None and cache.exists():
        z = np.load(cache)
        if "dir_fp" in z and str(z["dir_fp"]) == fp:
            return z["mu"], z["sigma"]
    embedder = embedder or LogMelEmbedder()
    emb = np.concatenate([embedder(b) for b in _iter_dir(path)], axis=0)
    mu, sigma = gaussian_stats(emb)
    if cache is not None:
        import os

        tmp = cache.with_name(cache.name + ".tmp.npz")
        np.savez(tmp, mu=mu, sigma=sigma, dir_fp=fp)
        os.replace(tmp, cache)
    return mu, sigma


def fad_between_dirs(real_dir, fake_dir, embedder=None, cache_key=None) -> float:
    mu_r, s_r = dir_stats(real_dir, embedder, cache_key)
    mu_g, s_g = dir_stats(fake_dir, embedder, cache_key)
    return frechet_distance(mu_r, s_r, mu_g, s_g)
