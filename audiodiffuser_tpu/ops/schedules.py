"""Sampling-time noise schedules.

Each schedule is a frozen dataclass whose ``__call__()`` returns the length-
``num_steps`` grid of noise levels (sigma, t or sigma/alpha ratios depending on
the formulation the consuming sampler expects).

Capability parity with the reference ``src/models/components/scheduler.py``:
KarrasSchedule (:6-22), LinearSchedule (:24-37), GeometricSchedule (:39-51),
VPSchedule (:53-71), VESchedule (:73-85), VSchedule (:87-103),
RFEDMSchedule (:105-119). The math is the published closed form in each case
(EDM eq.5 for Karras rho-spacing, shifted-cosine logSNR for VSchedule, etc.).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class KarrasSchedule:
    """rho-spaced sigma grid, EDM (arXiv:2206.00364) eq. 5."""

    sigma_min: float
    sigma_max: float
    rho: float = 7.0
    num_steps: int = 50

    def __call__(self) -> jnp.ndarray:
        rho_inv = 1.0 / self.rho
        steps = jnp.arange(self.num_steps, dtype=jnp.float32)
        lo, hi = self.sigma_min**rho_inv, self.sigma_max**rho_inv
        return (hi + steps / (self.num_steps - 1) * (lo - hi)) ** self.rho


@dataclass(frozen=True)
class LinearSchedule:
    """Evenly spaced grid from start to end (t-grid for VP/RF samplers)."""

    start: float = 1.0
    end: float = 0.0
    num_steps: int = 50

    def __call__(self) -> jnp.ndarray:
        return jnp.linspace(self.start, self.end, self.num_steps, dtype=jnp.float32)


@dataclass(frozen=True)
class GeometricSchedule:
    """Geometric grid of sigma^2 between sigma_max^2 and sigma_min^2 (SMLD)."""

    sigma_max: float = 100.0
    sigma_min: float = 0.02
    num_steps: int = 50

    def __call__(self) -> jnp.ndarray:
        steps = jnp.arange(self.num_steps, dtype=jnp.float32)
        ratio = self.sigma_min**2 / self.sigma_max**2
        return (self.sigma_max**2) * ratio ** (steps / (self.num_steps - 1))


@dataclass(frozen=True)
class VPSchedule:
    """VP sigma(t) grid over a linear t-grid (EDM table 1 VP column)."""

    start: float = 1.0
    end: float = 1e-3
    beta_d: float = 19.9
    beta_min: float = 0.1
    num_steps: int = 50

    def __call__(self) -> jnp.ndarray:
        t = jnp.linspace(self.start, self.end, self.num_steps, dtype=jnp.float32)
        return (jnp.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0) ** 0.5


@dataclass(frozen=True)
class VESchedule:
    """sqrt of the geometric sigma^2 grid (variance-exploding SDE)."""

    sigma_max: float = 100.0
    sigma_min: float = 0.02
    num_steps: int = 50

    def __call__(self) -> jnp.ndarray:
        steps = jnp.arange(self.num_steps, dtype=jnp.float32)
        ratio = self.sigma_min**2 / self.sigma_max**2
        sig2 = (self.sigma_max**2) * ratio ** (steps / (self.num_steps - 1))
        return jnp.sqrt(sig2)


@dataclass(frozen=True)
class VSchedule:
    """sigma/alpha ratios along the shifted-cosine logSNR schedule."""

    logsnr_min: float = -15.0
    logsnr_max: float = 15.0
    shift: float = 0.0
    num_steps: int = 50

    def __call__(self) -> jnp.ndarray:
        t_min = math.atan(math.exp(-0.5 * self.logsnr_max))
        t_max = math.atan(math.exp(-0.5 * self.logsnr_min))
        t = jnp.linspace(1.0, 0.0, self.num_steps, dtype=jnp.float32)
        logsnr = -2.0 * jnp.log(jnp.tan(t_min + t * (t_max - t_min))) + 2.0 * self.shift
        alpha_t = jnp.sqrt(jax_sigmoid(logsnr))
        sigma_t = jnp.sqrt(jax_sigmoid(-logsnr))
        return sigma_t / alpha_t


@dataclass(frozen=True)
class RFEDMSchedule:
    """t/(1-t) grid mapping rectified-flow time onto EDM sigma space."""

    start: float = 1.0
    end: float = 0.0
    num_steps: int = 50

    def __post_init__(self):
        if not (self.start <= 1.0 and self.end >= 0.0):
            raise ValueError("RFEDMSchedule requires start <= 1.0 and end >= 0.0")

    def __call__(self) -> jnp.ndarray:
        t = jnp.linspace(self.start, self.end, self.num_steps, dtype=jnp.float32)
        return t / (1.0 - t)


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))
