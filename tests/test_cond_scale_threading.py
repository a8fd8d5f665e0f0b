"""Functional cond_scale threading through the task's sample path.

The round-4 eval grid sweeps guidance scales through ONE compiled sample
function with the scale as a traced operand. Samplers are frozen dataclasses
(mutation raises FrozenInstanceError), so DiffusionSpecTask threads an
override via dataclasses.replace inside the trace. These tests pin:

- a traced cond_scale produces bitwise the SAME samples as a sampler
  statically configured with that scale (same key chain);
- cond_scale=None leaves the default path untouched;
- the sweep really shares one compilation across scales.

Reference capability: the guidance-scale grid search of
/root/reference/configs/experiment/sc09_inference/*.yaml (cond_scale
override per eval run).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _mk_task(cond_scale: float = 1.0):
    from audiodiffuser_tpu.diffusion import EluDiffusion
    from audiodiffuser_tpu.models.unet2d import UNet2dBase
    from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
    from audiodiffuser_tpu.ops.schedules import KarrasSchedule
    from audiodiffuser_tpu.samplers.edm import EDMSampler
    from audiodiffuser_tpu.tasks.diffusion_task import DiffusionSpecTask

    return DiffusionSpecTask(
        net=UNet2dBase(
            dim=128, num_classes=4, dim_mults=[1, 2], channels=2,
            num_resnet_blocks=1, resnet_groups=8,
            layer_attns=[False, False], layer_cross_attns=[False, False],
            memory_efficient=True,
        ),
        diffusion=EluDiffusion(sigma_data=0.2),
        sampler=EDMSampler(
            s_churn=0.0, num_steps=3, use_heun=False, cond_scale=cond_scale
        ),
        noise_scheduler=KarrasSchedule(
            sigma_min=0.01, sigma_max=10.0, rho=7.0, num_steps=3
        ),
        noise_distribution=LogNormalDistribution(mean=-1.2, std=1.2),
        n_fft=62, hop_length=16, generated_frame_length=16,
        generated_sample_class=4,
    )


@pytest.fixture(scope="module")
def task_and_params():
    task = _mk_task()
    x0 = jnp.zeros((1, 32, 16, 2))
    params = task.net.init(
        jax.random.key(0), x0, jnp.zeros((1,)),
        classes=jnp.zeros((1,), jnp.int32),
    )["params"]
    return task, params


def test_sampler_is_frozen(task_and_params):
    task, _ = task_and_params
    with pytest.raises(dataclasses.FrozenInstanceError):
        task.sampler.cond_scale = 2.0


def test_traced_cond_scale_matches_static(task_and_params):
    task, params = task_and_params
    classes = jnp.arange(2, dtype=jnp.int32)
    key = jax.random.key(7)
    sample_cs = jax.jit(task.make_sample_fn(with_cond_scale=True))
    for cs in (1.5, 3.0):
        swept = sample_cs(params, key, classes, jnp.float32(cs))
        static_task = _mk_task(cond_scale=cs)
        static = jax.jit(static_task.make_sample_fn())(params, key, classes)
        np.testing.assert_array_equal(
            np.asarray(swept), np.asarray(static),
            err_msg=f"traced cond_scale={cs} diverges from static sampler",
        )


def test_sweep_shares_one_compilation(task_and_params):
    task, params = task_and_params
    classes = jnp.arange(2, dtype=jnp.int32)
    key = jax.random.key(7)
    sample_cs = jax.jit(task.make_sample_fn(with_cond_scale=True))
    for cs in (1.0, 2.0, 4.0):
        sample_cs(params, key, classes, jnp.float32(cs))
    assert sample_cs._cache_size() == 1


def test_default_path_unchanged(task_and_params):
    task, params = task_and_params
    classes = jnp.arange(2, dtype=jnp.int32)
    key = jax.random.key(7)
    noise = jax.random.normal(jax.random.split(key)[0], task.noise_shape(2))
    k_sampler = jax.random.split(key)[1]
    # threading cond_scale=None must be the identity on the sample path
    plain = task.synthesize_from_noise(params, noise, classes, key=k_sampler)
    via_none = task.synthesize_from_noise(
        params, noise, classes, key=k_sampler, cond_scale=None
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(via_none))
