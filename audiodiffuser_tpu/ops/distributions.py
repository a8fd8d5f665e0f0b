"""Training-time noise-level distributions (explicit-PRNG-key driven).

Capability parity with the reference ``src/models/components/distribution.py``:
LogNormalDistribution (:9-16), UniformDistribution (:18-25),
LogUniformDistribution (:27-40), LogitDistribution incl. stratified erfinv
sampling (:42-68). Each is a frozen dataclass called as ``dist(key, n) -> [n]``;
all randomness flows through the passed-in ``jax.random`` key so training steps
stay pure and reproducible under jit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.scipy.special import erfinv


@dataclass(frozen=True)
class LogNormalDistribution:
    """sigma = exp(mean + std * N(0,1)) — the EDM training default."""

    mean: float
    std: float

    def __call__(self, key: jax.Array, num_samples: int) -> jnp.ndarray:
        normal = self.mean + self.std * jax.random.normal(key, (num_samples,))
        return jnp.exp(normal)


@dataclass(frozen=True)
class UniformDistribution:
    """Uniform over [vmin, vmax] (t-space for VP / v-objective / reflow)."""

    vmin: float = 0.0
    vmax: float = 1.0

    def __call__(self, key: jax.Array, num_samples: int) -> jnp.ndarray:
        u = jax.random.uniform(key, (num_samples,))
        return (self.vmin - self.vmax) * u + self.vmax


@dataclass(frozen=True)
class LogUniformDistribution:
    """sigma log-uniform over [sigma_min, sigma_max]."""

    sigma_min: float = 0.001
    sigma_max: float = 100.0

    def __call__(self, key: jax.Array, num_samples: int) -> jnp.ndarray:
        u = jax.random.uniform(key, (num_samples,))
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** u


@dataclass(frozen=True)
class LogitDistribution:
    """t = sigmoid(N(mean, std)) with optional stratified sampling.

    With ``stratified=True`` the unit interval is split into ``n`` strata, one
    uniform draw taken per stratum, then mapped through the normal inverse CDF
    (erfinv) — lower-variance coverage of the logit-normal.
    With ``ln_scale=False`` it degenerates to plain U[0, 1].
    """

    logit_mean: float = 0.0
    logit_std: float = 1.0
    ln_scale: bool = False
    stratified: bool = False

    def __call__(self, key: jax.Array, num_samples: int) -> jnp.ndarray:
        if not self.ln_scale:
            return jax.random.uniform(key, (num_samples,))
        if self.stratified:
            quantiles = jnp.linspace(0.0, 1.0, num_samples + 1)[:-1]
            z = quantiles + jax.random.uniform(key, (num_samples,)) / num_samples
            z = erfinv(2.0 * z - 1.0) * math.sqrt(2.0)
            z = z * self.logit_std + self.logit_mean
            return jax.nn.sigmoid(z)
        nt = jax.random.normal(key, (num_samples,)) * self.logit_std + self.logit_mean
        return jax.nn.sigmoid(nt)
