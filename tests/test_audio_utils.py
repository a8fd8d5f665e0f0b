"""Tests for the host-side audio utility library."""

import numpy as np
import pytest

from audiodiffuser_tpu.data.audio_utils import (
    HighPass,
    LowPass,
    SegmentMixer,
    add_noise_snr,
    dynamic_loudnorm,
    integrated_loudness,
    load_waveform,
    loudness_normalize,
    resample,
)
from audiodiffuser_tpu.data.sc09 import save_wav


def test_resample_halves_length():
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(tone, sr, sr // 2)
    assert abs(len(out) - sr // 2) <= 1
    # 440 Hz survives a 8 kHz rate
    spec = np.abs(np.fft.rfft(out))
    peak_hz = np.argmax(spec) * (sr // 2) / len(out)
    assert abs(peak_hz - 440) < 10


def test_load_waveform_crop_pad_resample(tmp_path):
    sr = 8000
    audio = np.random.default_rng(0).standard_normal(sr).astype(np.float32) * 0.1
    path = tmp_path / "a.wav"
    save_wav(str(path), audio, sr)

    out = load_waveform(str(path), tar_sr=16000, tar_len=16000, start_idx=0)
    assert out.shape == (16000,)
    # short target -> crop
    out2 = load_waveform(str(path), tar_sr=8000, tar_len=4000, start_idx=0)
    assert out2.shape == (4000,)
    # longer than source -> zero pad
    out3 = load_waveform(str(path), tar_sr=8000, tar_len=12000, start_idx=0)
    assert out3.shape == (12000,)
    assert np.all(out3[9000:] == 0)


def test_add_noise_snr():
    rng = np.random.default_rng(1)
    sig = rng.standard_normal(8000).astype(np.float32)
    noise = rng.standard_normal(8000).astype(np.float32)
    noisy = add_noise_snr(sig, noise, snr_db=0.0)
    resid = noisy - sig
    snr = 10 * np.log10(np.mean(sig**2) / np.mean(resid**2))
    assert abs(snr) < 0.5


def test_lowpass_highpass_masks():
    rng = np.random.default_rng(2)
    sr = 16000
    t = np.arange(sr) / sr
    low_tone = np.sin(2 * np.pi * 200 * t)
    high_tone = np.sin(2 * np.pi * 6000 * t)
    x = (low_tone + high_tone).astype(np.float32)

    lp = LowPass(nfft=1024, hop=256)
    out = lp(x, 0)  # ratio 1/6 -> cutoff ~1333 Hz
    spec = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(len(out), 1 / sr)
    assert spec[np.argmin(np.abs(freqs - 200))] > 50
    assert spec[np.argmin(np.abs(freqs - 6000))] < 5

    hp = HighPass(nfft=1024, hop=256)
    outh = hp(x, 0)
    spech = np.abs(np.fft.rfft(outh))
    assert spech[np.argmin(np.abs(freqs - 6000))] > 50
    assert spech[np.argmin(np.abs(freqs - 200))] < 5


def test_integrated_loudness_gain_relation():
    rng = np.random.default_rng(3)
    sr = 16000
    x = (rng.standard_normal(sr * 2) * 0.1).astype(np.float64)
    l1 = integrated_loudness(x, sr)
    l2 = integrated_loudness(x * 2, sr)
    # doubling amplitude = +6.02 dB loudness
    assert abs((l2 - l1) - 6.02) < 0.3

    normed = loudness_normalize(x, sr, -23.0)
    assert abs(integrated_loudness(normed, sr) - (-23.0)) < 0.5


def test_segment_mixer_shapes_and_clipping():
    rng = np.random.default_rng(4)
    w = (rng.standard_normal((4, 4000)) * 0.5).astype(np.float32)
    n = (rng.standard_normal((4, 4000)) * 0.5).astype(np.float32)
    mixer = SegmentMixer(max_mix_num=3, lower_db=-5, higher_db=5)
    seg, mix = mixer(w, n)
    assert seg.shape == mix.shape == w.shape
    assert np.abs(mix).max() <= 1.0 + 1e-6


def test_dynamic_loudnorm_energy_bounds():
    rng = np.random.default_rng(5)
    a = rng.standard_normal(1000).astype(np.float32)
    ref = rng.standard_normal(1000).astype(np.float32) * 0.1
    out = dynamic_loudnorm(a, ref, lower_db=0, higher_db=0)
    # energy matched exactly at delta=0
    np.testing.assert_allclose(np.mean(out**2), np.mean(ref**2), rtol=0.05)
