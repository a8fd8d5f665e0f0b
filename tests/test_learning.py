"""Learning-dynamics test: the jitted train step must actually reduce the
diffusion loss on structured (learnable) data."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiodiffuser_tpu.diffusion import EluDiffusion
from audiodiffuser_tpu.models.unet1d import UNet1dBase
from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
from audiodiffuser_tpu.ops.schedules import KarrasSchedule
from audiodiffuser_tpu.samplers.edm import EDMSampler
from audiodiffuser_tpu.tasks.waveform_task import DiffusionWaveformTask
from audiodiffuser_tpu.parallel.mesh import create_mesh, shard_batch
from audiodiffuser_tpu.training.trainer import Trainer


def test_training_reduces_loss():
    net = UNet1dBase(
        channels=32,
        class_cond=False,
        num_filters=32,
        window_length=4,
        stride=2,
        in_channels=1,
        multipliers=[1, 2],
        factors=[2],
        num_blocks=[1],
        attentions=[False],
        attention_heads=2,
        attention_multiplier=2,
        resnet_groups=8,
        kernel_multiplier_downsample=2,
        use_nearest_upsample=False,
        use_skip_scale=True,
        use_attention_bottleneck=False,
    )
    task = DiffusionWaveformTask(
        net=net,
        diffusion=EluDiffusion(sigma_data=0.3),
        sampler=EDMSampler(s_churn=0.0, num_steps=4, use_heun=False),
        noise_scheduler=KarrasSchedule(0.01, 10.0, num_steps=4),
        noise_distribution=LogNormalDistribution(-1.2, 1.2),
        generated_sample_length=256,
        generated_sample_class=1,
        use_ema=True,  # exercise EMA in the loop too
        use_phema=False,
    )
    trainer = Trainer(
        task=task, optimizer=optax.adamw(2e-3), output_dir="/tmp/learn_test"
    )

    # structured data: random-phase 3-harmonic tones (learnable statistics)
    rng = np.random.default_rng(0)
    t = np.arange(256) / 256.0

    def make_batch(n=16):
        ph = rng.uniform(0, 2 * np.pi, (n, 3, 1))
        freqs = np.array([4.0, 8.0, 16.0])[None, :, None]
        audio = 0.2 * np.sin(2 * np.pi * freqs * t[None, None, :] + ph).sum(1)
        return {
            "audio": audio.astype(np.float32),
            "label": np.zeros((n,), np.int32),
        }

    state = trainer.init_state(make_batch())
    trainer._compile()
    key = jax.random.key(1)

    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        sharded = shard_batch(trainer.mesh, make_batch())
        state, m = trainer._compiled_train_step(state, sharded, sub)
        losses.append(float(jax.device_get(m["train/loss"])))

    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < early * 0.8, f"loss did not decrease: {early:.4f} -> {late:.4f}"
    # EMA tracked alongside without breaking anything
    assert state.ema_state is not None
    ema_leaf = jax.tree.leaves(state.ema_state)[0]
    assert np.isfinite(np.asarray(jax.device_get(ema_leaf))).all()
