"""Latent-diffusion task over a frozen DAC codec (tiny end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.diffusion import EluDiffusion
from audiodiffuser_tpu.models.dac import DAC
from audiodiffuser_tpu.models.unet1d import UNet1dBase
from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
from audiodiffuser_tpu.ops.schedules import KarrasSchedule
from audiodiffuser_tpu.samplers.edm import EDMSampler
from audiodiffuser_tpu.tasks.latent_task import DiffusionLatentTask


def test_latent_task_end_to_end():
    codec = DAC(
        encoder_dim=4,
        encoder_rates=(2, 2),
        latent_dim=8,
        decoder_dim=16,
        decoder_rates=(2, 2),
        n_codebooks=2,
        codebook_size=8,
        codebook_dim=4,
    )
    audio0 = jnp.zeros((1, 64, 1))
    codec_params = codec.init(jax.random.key(0), audio0)["params"]

    net = UNet1dBase(
        channels=16,
        class_cond=True,
        num_classes=4,
        num_filters=16,
        window_length=3,
        stride=1,
        in_channels=8,
        out_channels=8,
        multipliers=[1, 2],
        factors=[2],
        num_blocks=[1],
        attentions=[False],
        attention_heads=2,
        attention_multiplier=2,
        resnet_groups=4,
        kernel_multiplier_downsample=2,
        use_nearest_upsample=False,
        use_skip_scale=True,
        use_attention_bottleneck=False,
    )
    task = DiffusionLatentTask(
        net=net,
        diffusion=EluDiffusion(sigma_data=0.5),
        sampler=EDMSampler(s_churn=0.0, num_steps=3, use_heun=False),
        noise_scheduler=KarrasSchedule(0.01, 10.0, num_steps=3),
        noise_distribution=LogNormalDistribution(-1.2, 1.2),
        codec=codec,
        codec_params=codec_params,
        generated_latent_length=16,
        generated_sample_class=4,
    )

    batch = {
        "audio": np.random.default_rng(0).standard_normal((2, 64)).astype(np.float32)
        * 0.2,
        "label": np.asarray([1, 3], np.int32),
    }
    z = task.audio_to_spec(jnp.asarray(batch["audio"]))
    assert z.shape == (2, 16, 8)  # T/4 latents, D=8

    params = net.init(
        jax.random.key(1), z, jnp.zeros((2,)), classes=jnp.asarray(batch["label"])
    )["params"]
    loss, _ = jax.jit(task.loss_fn)(params, batch, jax.random.key(2))
    assert np.isfinite(float(loss))

    # frozen codec: no gradient leaks into codec params (they're constants)
    g = jax.grad(lambda p: task.loss_fn(p, batch, jax.random.key(3))[0])(params)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))

    audio = jax.jit(task.make_sample_fn())(
        params, jax.random.key(4), jnp.asarray([0, 2])
    )
    assert audio.shape == (2, 64)
    assert np.isfinite(np.asarray(audio)).all()
