"""Golden numeric tests for noise schedules against independently computed
closed forms (numpy float64)."""

import math

import numpy as np
import jax.numpy as jnp

from audiodiffuser_tpu.ops import (
    GeometricSchedule,
    KarrasSchedule,
    LinearSchedule,
    RFEDMSchedule,
    VESchedule,
    VPSchedule,
    VSchedule,
)


def test_karras_schedule_closed_form():
    s = KarrasSchedule(sigma_min=0.002, sigma_max=80.0, rho=7.0, num_steps=32)
    got = np.asarray(s())
    i = np.arange(32, dtype=np.float64)
    expect = (
        80.0 ** (1 / 7) + i / 31 * (0.002 ** (1 / 7) - 80.0 ** (1 / 7))
    ) ** 7
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got[0], 80.0, rtol=1e-5)
    np.testing.assert_allclose(got[-1], 0.002, rtol=1e-5)
    assert np.all(np.diff(got) < 0), "sigma grid must be decreasing"


def test_linear_schedule():
    got = np.asarray(LinearSchedule(start=1.0, end=0.0, num_steps=11)())
    np.testing.assert_allclose(got, np.linspace(1.0, 0.0, 11), atol=1e-7)


def test_geometric_and_ve_schedules():
    geo = np.asarray(GeometricSchedule(sigma_max=100.0, sigma_min=0.02, num_steps=16)())
    i = np.arange(16, dtype=np.float64)
    expect = 100.0**2 * ((0.02**2 / 100.0**2) ** (i / 15))
    np.testing.assert_allclose(geo, expect, rtol=2e-5)
    ve = np.asarray(VESchedule(sigma_max=100.0, sigma_min=0.02, num_steps=16)())
    np.testing.assert_allclose(ve, np.sqrt(expect), rtol=2e-5)


def test_vp_schedule():
    got = np.asarray(
        VPSchedule(start=1.0, end=1e-3, beta_d=19.9, beta_min=0.1, num_steps=8)()
    )
    t = np.linspace(1.0, 1e-3, 8)
    expect = np.sqrt(np.exp(0.5 * 19.9 * t**2 + 0.1 * t) - 1.0)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-5)


def test_v_schedule_is_sigma_over_alpha():
    got = np.asarray(VSchedule(logsnr_min=-15, logsnr_max=15, shift=0.0, num_steps=10)())
    t_min = math.atan(math.exp(-7.5))
    t_max = math.atan(math.exp(7.5))
    t = np.linspace(1.0, 0.0, 10)
    logsnr = -2.0 * np.log(np.tan(t_min + t * (t_max - t_min)))
    sigmoid = lambda v: 1.0 / (1.0 + np.exp(-v))
    expect = np.sqrt(sigmoid(-logsnr)) / np.sqrt(sigmoid(logsnr))
    np.testing.assert_allclose(got, expect, rtol=2e-4)


def test_rfedm_schedule():
    got = np.asarray(RFEDMSchedule(start=0.996, end=0.0, num_steps=5)())
    t = np.linspace(0.996, 0.0, 5, dtype=np.float32)
    np.testing.assert_allclose(got, t / (1 - t), rtol=1e-5)
