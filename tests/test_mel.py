"""Mel frontend + Griffin-Lim tests and the mel task round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.ops.mel import (
    griffin_lim,
    log_mel_spectrogram,
    mel_filterbank,
    mel_to_linear,
)
from audiodiffuser_tpu.ops.stft import stft


def test_log_mel_shapes():
    fb = jnp.asarray(mel_filterbank(16000, 510, 80))
    audio = jax.random.normal(jax.random.key(0), (2, 16256)) * 0.1
    mel = log_mel_spectrogram(audio, fb, 510, 128)
    assert mel.shape == (2, 80, 128)
    assert np.isfinite(np.asarray(mel)).all()


def test_griffin_lim_recovers_tone():
    """GL from the true magnitude of a tone should reproduce it closely."""
    sr, n_fft, hop = 16000, 510, 128
    t = np.arange(sr, dtype=np.float32) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t))[None]
    mag = jnp.abs(stft(jnp.asarray(tone), n_fft, hop))
    rec = np.asarray(griffin_lim(mag, n_fft, hop, n_iter=48))[0]
    # compare magnitude spectra (phase-invariant)
    spec_r = np.abs(np.fft.rfft(rec[:8192]))
    spec_t = np.abs(np.fft.rfft(tone[0][:8192]))
    peak = np.argmax(spec_t)
    assert abs(np.argmax(spec_r) - peak) <= 2
    corr = np.corrcoef(spec_r, spec_t)[0, 1]
    assert corr > 0.9


def test_mel_to_linear_pseudo_inverse():
    fb = jnp.asarray(mel_filterbank(16000, 510, 80))
    rng = np.random.default_rng(0)
    mag = jnp.asarray(np.abs(rng.standard_normal((1, 256, 16))).astype(np.float32))
    mel = jnp.einsum("mf,bft->bmt", fb, mag)
    lin = mel_to_linear(mel, fb)
    assert lin.shape == mag.shape
    assert float(lin.min()) >= 0.0
    # re-projecting through the filterbank approximately reproduces mel
    mel2 = jnp.einsum("mf,bft->bmt", fb, lin)
    err = float(jnp.abs(mel2 - mel).max() / jnp.abs(mel).max())
    assert err < 0.15


def test_mel_task_end_to_end_tiny():
    import optax

    from audiodiffuser_tpu.diffusion import EluDiffusion
    from audiodiffuser_tpu.models.unet2d_adm import UNetModel
    from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
    from audiodiffuser_tpu.ops.schedules import KarrasSchedule
    from audiodiffuser_tpu.samplers.edm import EDMSampler
    from audiodiffuser_tpu.tasks.mel_task import DiffusionMelTask

    task = DiffusionMelTask(
        net=UNetModel(
            image_size=16,
            in_channels=1,
            out_channels=1,
            model_channels=32,
            num_res_blocks=1,
            attention_resolutions="8",
            channel_mult=(1, 2),
            num_classes=10,
            num_heads=2,
        ),
        diffusion=EluDiffusion(sigma_data=0.5),
        sampler=EDMSampler(s_churn=0.0, num_steps=3, use_heun=False),
        noise_scheduler=KarrasSchedule(0.01, 10.0, num_steps=3),
        noise_distribution=LogNormalDistribution(-1.2, 1.2),
        n_fft=62,
        hop_length=16,
        n_mels=16,
        generated_frame_length=16,
        griffin_lim_iters=4,
    )
    batch = {
        "audio": np.random.default_rng(1).standard_normal((2, 240)).astype(np.float32)
        * 0.1,
        "label": np.asarray([1, 2], np.int32),
    }
    spec = task.audio_to_spec(jnp.asarray(batch["audio"]))
    assert spec.shape == (2, 16, 16, 1)
    params = task.net.init(
        jax.random.key(0), spec, jnp.zeros((2,)), classes=jnp.asarray(batch["label"])
    )["params"]
    loss, _ = jax.jit(task.loss_fn)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    audio = jax.jit(task.make_sample_fn())(
        params, jax.random.key(2), jnp.asarray([0, 1])
    )
    assert audio.shape[0] == 2 and np.isfinite(np.asarray(audio)).all()
