"""Statistical and structural tests for the training sigma distributions."""

import jax
import numpy as np

from audiodiffuser_tpu.ops import (
    LogitDistribution,
    LogNormalDistribution,
    LogUniformDistribution,
    UniformDistribution,
)


def test_lognormal_moments():
    d = LogNormalDistribution(mean=-3.0, std=1.0)
    x = np.asarray(d(jax.random.key(0), 200_000))
    logs = np.log(x)
    assert abs(logs.mean() + 3.0) < 0.02
    assert abs(logs.std() - 1.0) < 0.02


def test_uniform_range_and_moments():
    d = UniformDistribution(vmin=0.2, vmax=0.9)
    x = np.asarray(d(jax.random.key(1), 100_000))
    assert x.min() >= 0.2 and x.max() <= 0.9
    assert abs(x.mean() - 0.55) < 0.01


def test_loguniform_log_is_uniform():
    d = LogUniformDistribution(sigma_min=1e-3, sigma_max=100.0)
    x = np.asarray(d(jax.random.key(2), 100_000))
    assert x.min() >= 1e-3 and x.max() <= 100.0
    logs = np.log(x)
    lo, hi = np.log(1e-3), np.log(100.0)
    assert abs(logs.mean() - (lo + hi) / 2) < 0.05


def test_logit_plain_uniform():
    d = LogitDistribution(ln_scale=False)
    x = np.asarray(d(jax.random.key(3), 50_000))
    assert x.min() >= 0.0 and x.max() <= 1.0
    assert abs(x.mean() - 0.5) < 0.01


def test_logit_lognormal_sigmoid():
    d = LogitDistribution(logit_mean=0.0, logit_std=1.0, ln_scale=True)
    x = np.asarray(d(jax.random.key(4), 100_000))
    assert np.all((x > 0) & (x < 1))
    # logit(x) should be ~N(0,1)
    z = np.log(x / (1 - x))
    assert abs(z.mean()) < 0.02
    assert abs(z.std() - 1.0) < 0.02


def test_logit_stratified_covers_strata():
    n = 1024
    d = LogitDistribution(logit_mean=0.0, logit_std=1.0, ln_scale=True, stratified=True)
    x = np.asarray(d(jax.random.key(5), n))
    z = np.log(x / (1 - x))
    # stratified normal draws: empirical CDF should be near-perfectly uniform
    from scipy.stats import norm

    u = norm.cdf(z)
    u_sorted = np.sort(u)
    grid = (np.arange(n) + 0.5) / n
    assert np.max(np.abs(u_sorted - grid)) < 2.0 / n
