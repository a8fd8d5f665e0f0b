"""Trajectory parity for the v-objective and rectified-flow families against
independent float64 numpy references (published update rules)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.samplers import rf as rf_s
from audiodiffuser_tpu.samplers import vobj as vobj_s

MU, S = 0.25, 0.4
SHAPE = (4, 8)
NOISE = jax.random.normal(jax.random.key(21), SHAPE)


def _logsnr(t, lo=-15.0, hi=15.0, shift=0.0):
    t_min = math.atan(math.exp(-0.5 * hi))
    t_max = math.atan(math.exp(-0.5 * lo))
    return -2.0 * np.log(np.tan(t_min + t * (t_max - t_min))) + 2 * shift


def _vobj_oracle_np(x, lam):
    alpha = np.sqrt(1 / (1 + np.exp(-lam)))
    sig = np.sqrt(1 / (1 + np.exp(lam)))
    x0_hat = (alpha * S**2 * x + sig**2 * MU) / (alpha**2 * S**2 + sig**2)
    return (alpha * x - x0_hat) / sig


def vobj_oracle_jax(x, sigma=None, cond_scale=1.0):
    lam = jnp.asarray(sigma)
    lam = lam.reshape((-1,) + (1,) * (x.ndim - 1)) if lam.ndim > 0 else lam
    alpha = jnp.sqrt(jax.nn.sigmoid(lam))
    sig = jnp.sqrt(jax.nn.sigmoid(-lam))
    x0_hat = (alpha * S**2 * x + sig**2 * MU) / (alpha**2 * S**2 + sig**2)
    return (alpha * x - x0_hat) / sig


def test_veuler_trajectory_parity():
    """v-space Euler+Heun vs numpy fp64, same t-grid/shift."""
    n = 16
    t_grid = jnp.linspace(1.0, 0.0, n + 1)[:-1]
    sampler = vobj_s.VEulerSampler(num_steps=n, use_heun=True, shift=0.0)
    ours = np.asarray(sampler(NOISE, vobj_oracle_jax, t_grid))

    ts = np.concatenate([np.asarray(t_grid, np.float64), [0.0]])
    x = np.asarray(NOISE, np.float64)
    for i in range(n - 1):
        lam_t, lam_s = _logsnr(ts[i]), _logsnr(ts[i + 1])
        v = _vobj_oracle_np(x, lam_t)
        a_t = np.sqrt(1 / (1 + np.exp(-lam_t)))
        s_t = np.sqrt(1 / (1 + np.exp(lam_t)))
        score = -a_t * s_t * v
        x_next = x + 0.5 * (lam_s - lam_t) * score
        v2 = _vobj_oracle_np(x_next, lam_s)
        a_s = np.sqrt(1 / (1 + np.exp(-lam_s)))
        s_s = np.sqrt(1 / (1 + np.exp(lam_s)))
        x = x + 0.25 * (lam_s - lam_t) * (score + (-a_s * s_s * v2))
    # final step: x0 readout
    lam_t = _logsnr(ts[n - 1])
    v = _vobj_oracle_np(x, lam_t)
    a_t = np.sqrt(1 / (1 + np.exp(-lam_t)))
    s_t = np.sqrt(1 / (1 + np.exp(lam_t)))
    x = np.clip(a_t * x - s_t * v, -1, 1)

    np.testing.assert_allclose(ours, x, rtol=1e-4, atol=1e-5)


def test_rf_euler_trajectory_parity():
    """Rectified-flow Heun over the t-grid vs numpy fp64."""

    def rf_oracle_np(x, t):
        var = (1 - t) ** 2 * S**2 + t**2
        resid = x - (1 - t) * MU
        x0_hat = MU + (1 - t) * S**2 / var * resid
        z1_hat = t / var * resid
        return z1_hat - x0_hat

    def rf_oracle_jax(x, sigma=None, cond_scale=1.0):
        t = jnp.asarray(sigma)
        t = t.reshape((-1,) + (1,) * (x.ndim - 1)) if t.ndim > 0 else t
        var = (1 - t) ** 2 * S**2 + t**2
        resid = x - (1 - t) * MU
        x0_hat = MU + (1 - t) * S**2 / var * resid
        return t / var * resid - x0_hat

    n = 16
    grid = jnp.linspace(1.0, 0.0, n + 1)
    sampler = rf_s.ReflowEulerSampler(num_steps=n, use_heun=True)
    ours = np.asarray(sampler(NOISE, rf_oracle_jax, grid))

    g = np.asarray(grid, np.float64)
    x = np.asarray(NOISE, np.float64) * g[0]
    for i in range(n - 1):
        t_c, t_n = g[i], g[i + 1]
        v = rf_oracle_np(x, t_c)
        x_e = x + (t_n - t_c) * v
        v2 = rf_oracle_np(x_e, t_n)
        x = x + 0.5 * (t_n - t_c) * (v + v2)
    # peeled final Euler step
    v = rf_oracle_np(x, g[n - 1])
    x = np.clip(x + (g[n] - g[n - 1]) * v, -1, 1)

    np.testing.assert_allclose(ours, x, rtol=1e-4, atol=1e-5)
