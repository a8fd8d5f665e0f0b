"""Diffusion-enhancement task: jit-native mixer semantics, training step,
and the enhance() deployment entry."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiodiffuser_tpu.diffusion import EluDiffusion
from audiodiffuser_tpu.models.unet2d import UNet2dBase
from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
from audiodiffuser_tpu.ops.schedules import KarrasSchedule
from audiodiffuser_tpu.samplers.edm import EDMSampler
from audiodiffuser_tpu.tasks.enhancement_task import (
    DiffusionEnhancementTask,
    mix_batch,
)
from audiodiffuser_tpu.parallel.mesh import shard_batch
from audiodiffuser_tpu.training.trainer import Trainer


def _tones(n=8, t=2048, seed=0):
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(4, 40, (n, 1))
    ph = rng.uniform(0, 2 * np.pi, (n, 1))
    tt = np.arange(t)[None] / t
    return (0.3 * np.sin(2 * np.pi * freqs * tt + ph)).astype(np.float32)


def test_mix_batch_semantics():
    audio = jnp.asarray(_tones())
    clean, mixture = jax.jit(mix_batch)(jax.random.key(0), audio)
    assert clean.shape == mixture.shape == audio.shape
    # interference was added: mixture differs from clean
    assert float(jnp.max(jnp.abs(mixture - clean))) > 1e-3
    # shared peak renorm keeps |mixture| <= ~0.9 and the pair aligned
    assert float(jnp.max(jnp.abs(mixture))) <= 0.9 + 1e-5
    # clean only ever scaled down (never amplified) by the shared renorm
    assert float(jnp.max(jnp.abs(clean) - jnp.abs(audio))) <= 1e-6
    # deterministic under the key
    c2, m2 = jax.jit(mix_batch)(jax.random.key(0), audio)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mixture))


def _task():
    net = UNet2dBase(
        dim=8,
        dim_mults=[1, 2],
        channels=2,
        num_classes=0,
        use_condition_block=True,
        channel_infuse_mode="conv",
        layer_attns=False,
        layer_cross_attns=False,
        attend_at_middle=False,
    )
    return DiffusionEnhancementTask(
        net=net,
        diffusion=EluDiffusion(sigma_data=0.2),
        sampler=EDMSampler(s_churn=0.0, num_steps=3, use_heun=False),
        noise_scheduler=KarrasSchedule(0.01, 10.0, num_steps=3),
        noise_distribution=LogNormalDistribution(-1.2, 1.2),
        n_fft=62,
        hop_length=16,
        generated_frame_length=32,
        use_ema=False,
    )


def test_enhancement_train_and_enhance(tmp_path):
    task = _task()
    trainer = Trainer(
        task=task, optimizer=optax.adamw(1e-3), output_dir=str(tmp_path)
    )
    batch = {"audio": _tones(8, 496), "label": np.zeros((8,), np.int32)}
    state = trainer.init_state(batch)
    trainer._compile()

    key = jax.random.key(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        sharded = shard_batch(trainer.mesh, batch)
        state, m = trainer._compiled_train_step(state, sharded, sub)
        assert np.isfinite(float(jax.device_get(m["train/loss"])))

    # precomputed host-side mixtures are honored
    clean, mixture = mix_batch(jax.random.key(9), jnp.asarray(batch["audio"]))
    with_mix = {
        "audio": np.asarray(clean),
        "mixture": np.asarray(mixture),
        "label": batch["label"],
    }
    loss, _ = jax.jit(task.loss_fn)(state.params, with_mix, jax.random.key(1))
    assert np.isfinite(float(loss))

    # deployment entry: noisy waveform in, enhanced waveform out, jittable
    noisy = jnp.asarray(_tones(2, 496, seed=3))
    out = jax.jit(task.enhance)(state.params, noisy, jax.random.key(2))
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()

    # trainer val-audio hook shape contract
    audio = jax.jit(task.make_sample_fn())(
        state.params, jax.random.key(3), jnp.zeros((2,), jnp.int32)
    )
    assert audio.shape[0] == 2 and np.isfinite(np.asarray(audio)).all()


def test_conditioning_branch_is_live():
    """The mixture must reach the denoiser: nonzero grads through the
    condition encoder (away from the zero-init final conv) and enhance()
    output that depends on the mixture."""
    task = _task()
    rng = np.random.default_rng(0)
    batch = {
        "audio": rng.standard_normal((4, 496)).astype(np.float32) * 0.2,
        "label": np.zeros((4,), np.int32),
    }
    p0 = task.init_params(jax.random.key(0), batch)
    params = jax.tree.map(lambda a: a + 0.01, p0)

    g = jax.grad(lambda p: task.loss_fn(p, batch, jax.random.key(1))[0])(params)
    for key_name in ("init_conv_cond", "down_cond_0"):
        norm = sum(
            float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g[key_name])
        )
        assert norm > 0.0, f"no gradient through condition branch {key_name}"

    m1 = jnp.asarray(batch["audio"][:1])
    m2 = jnp.asarray(batch["audio"][1:2])
    o1 = task.enhance(params, m1, jax.random.key(2))
    o2 = task.enhance(params, m2, jax.random.key(2))  # same key, new mixture
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-4
