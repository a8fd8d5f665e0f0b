"""STFT/iSTFT parity vs torch.stft (CPU oracle) and round-trip accuracy."""

import numpy as np
import pytest
import jax.numpy as jnp

import torch

from audiodiffuser_tpu.ops.stft import hann_window, istft, spec_back, spec_fwd, stft

N_FFT, HOP = 510, 128


def _torch_stft(audio_np):
    win = torch.hann_window(N_FFT, periodic=True)
    return torch.stft(
        torch.from_numpy(audio_np),
        n_fft=N_FFT,
        hop_length=HOP,
        center=True,
        window=win,
        normalized=True,
        return_complex=True,
    ).numpy()


def test_hann_window_matches_torch():
    got = np.asarray(hann_window(N_FFT))
    expect = torch.hann_window(N_FFT, periodic=True).numpy()
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16384)).astype(np.float32) * 0.3
    expect = _torch_stft(audio)
    got = np.asarray(stft(jnp.asarray(audio), N_FFT, HOP))
    assert got.shape == expect.shape == (2, N_FFT // 2 + 1, 129)
    np.testing.assert_allclose(got.real, expect.real, atol=2e-5)
    np.testing.assert_allclose(got.imag, expect.imag, atol=2e-5)


def test_istft_matches_torch():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 16384)).astype(np.float32) * 0.3
    spec = _torch_stft(audio)
    win = torch.hann_window(N_FFT, periodic=True)
    expect = torch.istft(
        torch.from_numpy(spec),
        n_fft=N_FFT,
        hop_length=HOP,
        center=True,
        window=win,
        normalized=True,
    ).numpy()
    got = np.asarray(istft(jnp.asarray(spec), N_FFT, HOP))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_roundtrip():
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((1, 16384)).astype(np.float32) * 0.5
    spec = stft(jnp.asarray(audio), N_FFT, HOP)
    back = np.asarray(istft(spec, N_FFT, HOP))
    np.testing.assert_allclose(back[:, : audio.shape[1]], audio[:, : back.shape[1]], atol=1e-4)


def test_spec_fwd_back_roundtrip():
    rng = np.random.default_rng(3)
    spec = (rng.standard_normal((4, 16)) + 1j * rng.standard_normal((4, 16))).astype(
        np.complex64
    )
    f = spec_fwd(jnp.asarray(spec), 0.5, 0.3)
    b = np.asarray(spec_back(f, 0.5, 0.3))
    np.testing.assert_allclose(b, spec, atol=1e-5)
    # magnitude compression: |f| = |s|^0.5 * 0.3, phase preserved
    np.testing.assert_allclose(
        np.abs(np.asarray(f)), np.abs(spec) ** 0.5 * 0.3, atol=1e-5
    )
    np.testing.assert_allclose(np.angle(np.asarray(f)), np.angle(spec), atol=1e-4)


def test_spec_fwd_matches_torch_formula():
    rng = np.random.default_rng(4)
    spec = (rng.standard_normal((8,)) + 1j * rng.standard_normal((8,))).astype(
        np.complex64
    )
    ts = torch.from_numpy(spec)
    expect = (ts.abs() ** 0.5 * torch.exp(1j * ts.angle()) * 0.3).numpy()
    got = np.asarray(spec_fwd(jnp.asarray(spec), 0.5, 0.3))
    np.testing.assert_allclose(got, expect, atol=1e-5)
