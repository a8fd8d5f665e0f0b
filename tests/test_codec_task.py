"""Codec-training lifecycle: train a tiny DAC with the generic Trainer,
export its params (scripts/export_codec_params.py), and feed them to the
latent-diffusion task — the two-stage workflow the shipped configs describe."""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiodiffuser_tpu.diffusion import EluDiffusion
from audiodiffuser_tpu.models.dac import DAC
from audiodiffuser_tpu.models.unet1d import UNet1dBase
from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
from audiodiffuser_tpu.ops.schedules import KarrasSchedule
from audiodiffuser_tpu.samplers.edm import EDMSampler
from audiodiffuser_tpu.tasks.codec_task import CodecTask, multiscale_stft_loss
from audiodiffuser_tpu.tasks.latent_task import DiffusionLatentTask
from audiodiffuser_tpu.parallel.mesh import shard_batch
from audiodiffuser_tpu.training.trainer import Trainer

REPO = Path(__file__).resolve().parents[1]

TINY_CODEC = dict(
    encoder_dim=4,
    encoder_rates=(2, 2),
    latent_dim=8,
    decoder_dim=16,
    decoder_rates=(2, 2),
    n_codebooks=2,
    codebook_size=8,
    codebook_dim=4,
    quantizer_dropout=0.5,
)


def _batch(n=8, t=256, seed=0):
    rng = np.random.default_rng(seed)
    ph = rng.uniform(0, 2 * np.pi, (n, 1))
    tt = np.arange(t) / t
    audio = 0.3 * np.sin(2 * np.pi * 8 * tt[None] + ph)
    return {
        "audio": audio.astype(np.float32),
        "label": np.zeros((n,), np.int32),
    }


def test_multiscale_stft_loss_basics():
    x = jnp.asarray(_batch(2, 4096)["audio"])
    assert float(multiscale_stft_loss(x, x, (512, 128))) == 0.0
    y = x + 0.1
    assert float(multiscale_stft_loss(x, y, (512, 128))) > 0.0


def test_codec_train_export_latent_lifecycle(tmp_path):
    codec = DAC(**TINY_CODEC)
    task = CodecTask(
        net=codec,
        stft_fft_sizes=(64,),
        generated_latent_length=16,
        use_ema=False,
    )
    trainer = Trainer(
        task=task, optimizer=optax.adamw(1e-3), output_dir=str(tmp_path / "run")
    )
    state = trainer.init_state(_batch())
    trainer._compile()

    key = jax.random.key(0)
    losses = []
    for i in range(20):
        key, sub = jax.random.split(key)
        sharded = shard_batch(trainer.mesh, _batch(seed=i))
        state, m = trainer._compiled_train_step(state, sharded, sub)
        losses.append(float(jax.device_get(m["train/loss"])))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])  # codec learns

    # decoder smoke signal used by the trainer's val-audio hook
    audio = jax.jit(task.make_sample_fn())(
        state.params, jax.random.key(1), jnp.zeros((2,), jnp.int32)
    )
    assert audio.shape[0] == 2 and np.isfinite(np.asarray(audio)).all()

    # full round trip through encode/quantize/decode
    recon = task.reconstruct(state.params, jnp.asarray(_batch(2)["audio"]))
    assert recon.shape == (2, 256) and np.isfinite(np.asarray(recon)).all()

    trainer.save_checkpoint(state, "last")

    # stage boundary: export frozen params with the CLI script
    out = tmp_path / "codec_params"
    res = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "export_codec_params.py"),
            "--ckpt",
            str(tmp_path / "run" / "checkpoints" / "last"),
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    assert res.returncode == 0, res.stderr
    assert "exported" in res.stdout

    # stage 2: latent diffusion restores the export via codec_ckpt_path
    net = UNet1dBase(
        channels=16,
        class_cond=True,
        num_classes=4,
        num_filters=16,
        in_channels=8,
        out_channels=8,
        multipliers=[1, 2],
        factors=[2],
        num_blocks=[1],
        attentions=[False],
        attention_heads=2,
        resnet_groups=4,
        use_attention_bottleneck=False,
    )
    latent = DiffusionLatentTask(
        net=net,
        diffusion=EluDiffusion(sigma_data=0.5),
        sampler=EDMSampler(s_churn=0.0, num_steps=3, use_heun=False),
        noise_scheduler=KarrasSchedule(0.01, 10.0, num_steps=3),
        noise_distribution=LogNormalDistribution(-1.2, 1.2),
        codec=DAC(**TINY_CODEC),
        codec_ckpt_path=str(out),
        generated_latent_length=16,
        generated_sample_class=4,
    )
    z = latent.audio_to_spec(jnp.asarray(_batch(2)["audio"]))
    assert z.shape == (2, 64, 8)
    params = net.init(
        jax.random.key(2), z, jnp.zeros((2,)), classes=jnp.zeros((2,), jnp.int32)
    )["params"]
    loss, _ = jax.jit(latent.loss_fn)(params, _batch(2), jax.random.key(3))
    assert np.isfinite(float(loss))
    gen = jax.jit(latent.make_sample_fn())(
        params, jax.random.key(4), jnp.asarray([0, 1])
    )
    # generated_latent_length 16 x total decoder upsample 4 -> 64 samples
    assert gen.shape == (2, 16 * 4) and np.isfinite(np.asarray(gen)).all()
