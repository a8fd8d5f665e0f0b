"""Data-parallel correctness on the 8-device virtual CPU mesh (the JAX
equivalent of the reference's ddp_spawn CPU simulation,
tests/test_train.py:52-61)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiodiffuser_tpu.diffusion import EluDiffusion
from audiodiffuser_tpu.models.unet1d import UNet1dBase
from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
from audiodiffuser_tpu.ops.schedules import KarrasSchedule
from audiodiffuser_tpu.parallel.mesh import (
    create_mesh,
    replicate,
    shard_batch,
)
from audiodiffuser_tpu.samplers.edm import EDMSampler
from audiodiffuser_tpu.tasks.waveform_task import DiffusionWaveformTask
from audiodiffuser_tpu.training.trainer import Trainer


def _tiny_task():
    net = UNet1dBase(
        channels=16,
        class_cond=False,
        num_filters=16,
        window_length=4,
        stride=2,
        in_channels=1,
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
    return DiffusionWaveformTask(
        net=net,
        diffusion=EluDiffusion(sigma_data=0.2),
        sampler=EDMSampler(s_churn=0.0, num_steps=4, use_heun=False),
        noise_scheduler=KarrasSchedule(0.01, 10.0, num_steps=4),
        noise_distribution=LogNormalDistribution(-1.2, 1.2),
        generated_sample_length=256,
        generated_sample_class=1,
        use_ema=False,
    )


def _batch(n):
    rng = np.random.default_rng(0)
    return {
        "audio": rng.standard_normal((n, 256)).astype(np.float32) * 0.1,
        "label": np.zeros((n,), np.int32),
    }


def test_mesh_creation_shapes():
    mesh = create_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh2 = create_mesh({"data": -1, "model": 2})
    assert mesh2.axis_names == ("data", "model")
    assert mesh2.devices.shape == (len(jax.devices()) // 2, 2)


def test_sharded_loss_matches_single_device():
    """The data-parallel loss must equal the single-device loss exactly."""
    task = _tiny_task()
    batch = _batch(8)
    key = jax.random.key(3)
    x = task.audio_to_spec(jnp.asarray(batch["audio"][:1]))
    params = task.net.init(jax.random.key(0), x, jnp.zeros((1,)))["params"]

    loss_1, _ = jax.jit(task.loss_fn)(params, jax.tree.map(jnp.asarray, batch), key)

    mesh = create_mesh()
    params_r = replicate(mesh, params)
    sharded = shard_batch(mesh, batch)
    loss_8, _ = jax.jit(task.loss_fn)(params_r, sharded, key)

    np.testing.assert_allclose(
        np.asarray(jax.device_get(loss_1)),
        np.asarray(jax.device_get(loss_8)),
        rtol=1e-5,
    )


def test_sharded_generation_harness(tmp_path):
    """trainer.test partitions the generation batch over the 8-device mesh."""
    task = _tiny_task()
    mesh = create_mesh()
    trainer = Trainer(
        task=task, optimizer=optax.adamw(1e-3), mesh=mesh, output_dir=str(tmp_path)
    )
    batch = _batch(8)
    state = trainer.init_state(batch)
    metrics = trainer.test(state, batch_size=8)
    assert metrics["test/num_samples"] == 8
    wavs = list((tmp_path / "test_samples").glob("*.wav"))
    assert len(wavs) == 8


def test_fsdp_sharding_matches_replicated():
    """FSDP-sharded training step == replicated step (same loss), with large
    params actually partitioned across devices."""
    task = _tiny_task()
    mesh = create_mesh()
    batch = _batch(8)
    key = jax.random.key(1)

    results = {}
    for mode in ("replicated", "fsdp"):
        trainer = Trainer(
            task=task,
            optimizer=optax.adamw(1e-3),
            mesh=mesh,
            output_dir=f"/tmp/fsdp_test_{mode}",
            param_sharding=mode,
            fsdp_min_size=256,
        )
        state = trainer.init_state(batch)
        trainer._compile()
        _, metrics = trainer._compiled_train_step(
            state, shard_batch(mesh, batch), key
        )
        results[mode] = float(jax.device_get(metrics["train/loss"]))
        if mode == "fsdp":
            shardings = [
                leaf.sharding for leaf in jax.tree.leaves(state.params)
                if leaf.size >= 256
            ]
            assert shardings, "no large params found"
            assert any(not s.is_fully_replicated for s in shardings), (
                "fsdp mode left every large param replicated"
            )
    np.testing.assert_allclose(results["fsdp"], results["replicated"], rtol=1e-5)


def test_trainer_step_on_mesh_updates_params():
    task = _tiny_task()
    mesh = create_mesh()
    trainer = Trainer(
        task=task, optimizer=optax.adamw(1e-3), mesh=mesh, output_dir="/tmp/tp_test"
    )
    batch = _batch(8)
    state = trainer.init_state(batch)
    trainer._compile()
    before = jax.device_get(jax.tree.leaves(state.params)[0]).copy()
    state, metrics = trainer._compiled_train_step(
        state, shard_batch(mesh, batch), jax.random.key(1)
    )
    after = jax.device_get(jax.tree.leaves(state.params)[0])
    assert np.isfinite(float(metrics["train/loss"]))
    assert np.abs(after - before).max() > 0
    # params stay replicated (same value on every device)
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_2d_mesh_weight_sharded_tp_loss_parity():
    """2D (data x model) mesh: batch sharded over 'data', large params
    sharded over 'model' (GSPMD partitions the matmuls/convs and inserts the
    collectives). Loss must match the single-device value."""
    from audiodiffuser_tpu.parallel.mesh import shard_params_fsdp

    task = _tiny_task()
    batch = _batch(8)
    key = jax.random.key(9)
    x = task.audio_to_spec(jnp.asarray(batch["audio"][:1]))
    params = task.net.init(jax.random.key(0), x, jnp.zeros((1,)))["params"]
    loss_ref, _ = jax.jit(task.loss_fn)(params, jax.tree.map(jnp.asarray, batch), key)

    mesh2d = create_mesh({"data": 4, "model": 2})
    params_tp = shard_params_fsdp(mesh2d, params, axis="model", min_size=256)
    sharded = shard_batch(mesh2d, batch, axis="data")
    loss_tp, _ = jax.jit(task.loss_fn)(params_tp, sharded, key)

    np.testing.assert_allclose(
        float(jax.device_get(loss_tp)), float(jax.device_get(loss_ref)), rtol=1e-5
    )
    # some large param is actually split over the model axis
    shardings = [
        leaf.sharding
        for leaf in jax.tree.leaves(params_tp)
        if leaf.size >= 256
    ]
    assert any(not s.is_fully_replicated for s in shardings)
