"""Audio processing utilities (augmentation / enhancement-task support).

Capability parity with the reference ``src/data/audio_processing_utils.py``:
load_audio / load_waveform with random-window loading and resampling
(:14-68, torchaudio+julius replaced by scipy polyphase resampling),
add_reverb_noise (:70-96), STFT-mask HighPass/LowPass filters (:99-169),
SegmentMixer loudness-normalized mixture augmentation (:171-232),
dynamic_loudnorm / random_loudness_norm (:235-277; pyloudnorm replaced by a
built-in ITU-R BS.1770 K-weighted integrated loudness meter).

These are host-side numpy/scipy utilities (data-pipeline augmentation);
the on-device STFT lives in ``ops.stft``.
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np
from scipy import signal
from scipy.io import wavfile

MAX_INT16 = 32768.0


# -----------------------------------------------------------------------------
# loading / resampling
# -----------------------------------------------------------------------------


def load_audio(filepath, start=None, end=None):
    """mmap-backed segment read -> float32 [-1, 1] (reference :14-25)."""
    sr, raw = wavfile.read(filepath, mmap=True)
    seg = raw[start:end]
    is_int = np.issubdtype(seg.dtype, np.integer)
    waveform = np.asarray(seg, np.float32)
    if is_int:
        waveform = waveform / MAX_INT16
    if waveform.ndim > 1:
        waveform = waveform.mean(axis=1)
    return waveform, sr


def resample(waveform: np.ndarray, src_sr: int, tar_sr: int) -> np.ndarray:
    """Polyphase resampling (replaces julius.ResampleFrac)."""
    if src_sr == tar_sr:
        return waveform
    g = np.gcd(src_sr, tar_sr)
    return signal.resample_poly(waveform, tar_sr // g, src_sr // g).astype(np.float32)


def load_waveform(
    filepath,
    tar_sr: Optional[int] = None,
    tar_len: Optional[int] = None,
    start_idx: Optional[int] = None,
    return_start_idx: bool = False,
):
    """Random-window load + resample + pad/crop (reference :27-68)."""
    sr, full = wavfile.read(filepath, mmap=True)
    src_len = full.shape[0]
    tar_sr = tar_sr or sr

    if tar_len is not None:
        load_len = int(np.ceil(tar_len / tar_sr * sr))
        start = (
            random.randint(0, max(src_len - load_len, 0))
            if start_idx is None
            else start_idx
        )
        waveform, _ = load_audio(filepath, start=start, end=start + load_len)
    else:
        waveform, _ = load_audio(filepath)
        start = 0

    waveform = resample(waveform, sr, tar_sr)

    if tar_len is not None:
        if waveform.shape[0] < tar_len:
            waveform = np.pad(waveform, (0, tar_len - waveform.shape[0]))
        else:
            waveform = waveform[:tar_len]
    return (waveform, start) if return_start_idx else waveform


# -----------------------------------------------------------------------------
# noise / reverb augmentation
# -----------------------------------------------------------------------------


def add_noise_snr(audio: np.ndarray, noise: np.ndarray, snr_db: float) -> np.ndarray:
    """Mix noise at the given SNR (torchaudio.functional.add_noise semantics)."""
    n = min(len(audio), len(noise))
    audio, noise = audio[:n], noise[:n]
    p_audio = np.mean(audio**2)
    p_noise = max(np.mean(noise**2), 1e-12)
    scale = np.sqrt(p_audio / (p_noise * 10 ** (snr_db / 10)))
    return audio + scale * noise


def add_reverb_noise(audio, reverb=None, noise=None, snr_db=0.0, target_len=1):
    """Noise + normalized-RIR convolution (reference :70-96)."""
    noisy = add_noise_snr(audio, noise, snr_db) if noise is not None else audio
    if reverb is not None:
        reverb = np.asarray(reverb, np.float64)
        reverb = reverb / max(np.linalg.norm(reverb), 1e-12)
        reverb = reverb / max(np.abs(reverb).max(), 1e-12)
        noisy = signal.fftconvolve(noisy, reverb)
    if len(noisy) > target_len:
        noisy = noisy[:target_len]
    return noisy.astype(np.float32)


# -----------------------------------------------------------------------------
# STFT-mask filters
# -----------------------------------------------------------------------------


class _MaskFilter:
    def __init__(self, nfft: int, hop: int, ratio: Sequence[float], highpass: bool):
        self.nfft = nfft
        self.hop = hop
        self.window = signal.get_window("hann", nfft)
        nbins = nfft // 2 + 1
        filt = np.ones((len(ratio), nbins), np.float32)
        for i, r in enumerate(ratio):
            if highpass:
                filt[i, : int(nbins * r)] = 0.0
            else:
                filt[i, int(nbins * r) :] = 0.0
        self.filters = filt

    def __call__(self, x: np.ndarray, r) -> np.ndarray:
        """x: [T] or [B, T]; r: filter index per batch item."""
        x = np.atleast_2d(np.asarray(x, np.float32))
        r = np.atleast_1d(np.asarray(r, int))
        t_len = x.shape[1]
        x = np.pad(x, ((0, 0), (0, self.nfft)))
        _, _, spec = signal.stft(
            x,
            nperseg=self.nfft,
            noverlap=self.nfft - self.hop,
            window=self.window,
            boundary="zeros",
            padded=True,
        )
        spec = spec * self.filters[r][:, :, None]
        _, out = signal.istft(
            spec,
            nperseg=self.nfft,
            noverlap=self.nfft - self.hop,
            window=self.window,
            boundary="zeros",
        )
        out = out[:, :t_len].astype(np.float32)
        return out[0] if out.shape[0] == 1 else out


class HighPass(_MaskFilter):
    """Zero low STFT bins below a per-item cutoff ratio (reference :99-133)."""

    def __init__(self, nfft=1024, hop=256, ratio=(1/6, 1/3, 1/2, 2/3, 3/4, 4/5, 5/6, 1.0)):
        super().__init__(nfft, hop, ratio, highpass=True)


class LowPass(_MaskFilter):
    """Zero high STFT bins above a per-item cutoff ratio (reference :136-169)."""

    def __init__(self, nfft=1024, hop=256, ratio=(1/6, 1/3, 1/2, 2/3, 3/4, 4/5, 5/6, 1.0)):
        super().__init__(nfft, hop, ratio, highpass=False)


# -----------------------------------------------------------------------------
# loudness
# -----------------------------------------------------------------------------


def get_energy(x: np.ndarray) -> float:
    return float(np.mean(x**2))


def get_energy_ratio(segment1, segment2) -> float:
    ratio = (get_energy(segment1) / max(get_energy(segment2), 1e-10)) ** 0.5
    return float(np.clip(ratio, 0.02, 50.0))


def rescale_to_match_energy(segment1, segment2):
    return segment1 / get_energy_ratio(segment1, segment2)


def dynamic_loudnorm(audio, reference, lower_db=-10, higher_db=10):
    """Energy-match then random +-dB gain (reference :255-260)."""
    rescaled = rescale_to_match_energy(audio, reference)
    delta = random.randint(lower_db, higher_db)
    return rescaled * 10.0 ** (delta / 20.0)


def integrated_loudness(audio: np.ndarray, sr: int) -> float:
    """ITU-R BS.1770 integrated loudness in LUFS (replaces pyloudnorm).

    K-weighting (shelving + RLB high-pass biquads) followed by gated mean
    square over 400 ms blocks with 75% overlap and the -70/-10 LU gates.
    """
    audio = np.asarray(audio, np.float64)

    # pre-filter 1: spherical-head shelving filter, BS.1770 table 1 (48k
    # coefficients bilinear-rescaled to sr)
    f0, gain_db, q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
    k = np.tan(np.pi * f0 / sr)
    vh = 10 ** (gain_db / 20.0)
    vb = vh**0.4996667741545416
    a0 = 1.0 + k / q + k * k
    b_shelf = np.array([vh + vb * k / q + k * k, 2.0 * (k * k - vh), vh - vb * k / q + k * k]) / a0
    a_shelf = np.array([1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0])

    # pre-filter 2: RLB high-pass
    f0, q = 38.13547087602444, 0.5003270373238773
    k = np.tan(np.pi * f0 / sr)
    a0 = 1.0 + k / q + k * k
    b_hp = np.array([1.0, -2.0, 1.0]) / a0
    a_hp = np.array([1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0])

    x = signal.lfilter(b_shelf, a_shelf, audio)
    x = signal.lfilter(b_hp, a_hp, x)

    block = int(0.400 * sr)
    hop = int(0.100 * sr)
    if len(x) < block:
        ms = np.array([np.mean(x**2)])
    else:
        n_blocks = 1 + (len(x) - block) // hop
        ms = np.array(
            [np.mean(x[i * hop : i * hop + block] ** 2) for i in range(n_blocks)]
        )
    loud = -0.691 + 10.0 * np.log10(np.maximum(ms, 1e-12))

    gate1 = loud > -70.0
    if not gate1.any():
        return -np.inf
    ref = -0.691 + 10.0 * np.log10(np.mean(ms[gate1]))
    gate2 = loud > (ref - 10.0)
    if not gate2.any():
        return -np.inf
    return float(-0.691 + 10.0 * np.log10(np.mean(ms[gate1 & gate2])))


def loudness_normalize(audio: np.ndarray, sr: int, target_lufs: float) -> np.ndarray:
    cur = integrated_loudness(audio, sr)
    if not np.isfinite(cur):
        return audio
    gain = 10.0 ** ((target_lufs - cur) / 20.0)
    return (audio * gain).astype(np.float32)


def random_loudness_norm(audio, lower_db=-35, higher_db=-15, sr=32000):
    """Normalize to a random LUFS target (reference :263-277)."""
    return loudness_normalize(audio, sr, random.randint(lower_db, higher_db))


class SegmentMixer:
    """Loudness-normalized mixture augmentation (reference :171-232)."""

    def __init__(self, max_mix_num: int, lower_db: float, higher_db: float):
        self.max_mix_num = max_mix_num
        self.lower_db = int(lower_db)
        self.higher_db = int(higher_db)

    def __call__(self, waveforms: np.ndarray, noise_waveforms: np.ndarray):
        batch_size = waveforms.shape[0]
        noise_indices = np.random.permutation(batch_size)

        segments, mixtures = [], []
        for n in range(batch_size):
            segment = waveforms[n].copy()
            noise = dynamic_loudnorm(
                noise_waveforms[noise_indices[n]], segment, self.lower_db, self.higher_db
            )
            mix_num = random.randint(2, self.max_mix_num)
            for i in range(1, mix_num):
                next_segment = waveforms[(n + i) % batch_size]
                noise = noise + dynamic_loudnorm(
                    next_segment, segment, self.lower_db, self.higher_db
                )
            noise = dynamic_loudnorm(noise, segment, self.lower_db, self.higher_db)
            mixture = segment + noise
            max_value = np.abs(mixture).max()
            if max_value > 1:
                segment = segment * (0.9 / max_value)
                mixture = mixture * (0.9 / max_value)
            segments.append(segment)
            mixtures.append(mixture)
        return np.stack(segments), np.stack(mixtures)
