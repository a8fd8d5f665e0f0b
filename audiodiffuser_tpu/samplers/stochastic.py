"""Ancestral / SDE samplers for x0-predicting denoisers.

Capability parity with the reference
``src/models/components/stochastic_sampler_edm.py``: get_sigmas (:30-33),
ADPM2Sampler (:35-100, the training default), ADPMPP2SSampler (:102-178),
DPM2MSampler with reflow conversion (:180-259), DPMPPSDESampler (:261-346).

Per-step randomness derives from folding the step index into the caller's
PRNG key; the torchsde Brownian tree behind DPM++ SDE is replaced by the
counter-based Brownian bridge in samplers/base.py (same marginals and the
same within-step correlation structure, no host dependency).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .base import (
    BrownianBridgeNoise,
    DenoiseFn,
    ancestral_sigmas,
    step_noise,
)


@dataclass(frozen=True)
class ADPM2Sampler:
    """Ancestral DPM2 ('DPM2 a Karras') — the reference's default sampler."""

    rho: float = 1.0
    num_steps: int = 50
    cond_scale: float = 1.0
    eta: float = 1.0

    def __call__(self, noise, fn, sigmas, key: Optional[jax.Array] = None, **_):
        if key is None:
            key = jax.random.key(0)
        x = sigmas[0] * noise

        def body(x, xs):
            sigma, sigma_next, i = xs
            sigma_up, sigma_down = ancestral_sigmas(sigma, sigma_next, self.eta)
            x_epis = fn(x, sigma=sigma, cond_scale=self.cond_scale)
            d = (x - x_epis) / sigma
            # rho-space midpoint between sigma and sigma_down
            sigma_mid = ((sigma ** (1 / self.rho) + sigma_down ** (1 / self.rho)) / 2) ** self.rho
            x_mid = x + d * (sigma_mid - sigma)
            x_mid_epis = fn(x_mid, sigma=sigma_mid, cond_scale=self.cond_scale)
            d_mid = (x_mid - x_mid_epis) / sigma_mid
            x = x + d_mid * (sigma_down - sigma)
            x = x + step_noise(key, i, x.shape, x.dtype) * sigma_up
            return x, None

        n = self.num_steps - 1
        xs = (sigmas[:n], sigmas[1 : n + 1], jnp.arange(n))
        x, _ = jax.lax.scan(body, x, xs)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class ADPMPP2SSampler:
    """Ancestral DPM-Solver++(2S) Karras ('DPM++ 2S a Karras')."""

    rho: float = 1.0
    num_steps: int = 50
    cond_scale: float = 1.0
    eta: float = 1.0

    def __call__(self, noise, fn, sigmas, key: Optional[jax.Array] = None, **_):
        if key is None:
            key = jax.random.key(0)
        x = sigmas[0] * noise

        def body(x, xs):
            sigma, sigma_next, i = xs
            x_epis = fn(x, sigma=sigma, cond_scale=self.cond_scale)
            sigma_up, sigma_down = ancestral_sigmas(sigma, sigma_next, self.eta)

            # Euler branch (sigma_down == 0)
            d = (x - x_epis) / sigma
            x_euler = x + d * (sigma_down - sigma)

            # DPM++(2S) branch
            safe_down = jnp.where(sigma_down == 0, 1.0, sigma_down)
            t, t_next = -jnp.log(sigma), -jnp.log(safe_down)
            r = 0.5
            h = t_next - t
            s = t + r * h
            x_2 = jnp.exp(-s) / jnp.exp(-t) * x - jnp.expm1(-h * r) * x_epis
            denoised_2 = fn(x_2, sigma=jnp.exp(-s), cond_scale=self.cond_scale)
            x_solver = jnp.exp(-t_next) / jnp.exp(-t) * x - jnp.expm1(-h) * denoised_2

            x = jnp.where(sigma_down == 0, x_euler, x_solver)
            noise_add = step_noise(key, i, x.shape, x.dtype) * sigma_up
            x = jnp.where(sigma_next > 0, x + noise_add, x)
            return x, None

        n = self.num_steps - 1
        xs = (sigmas[:n], sigmas[1 : n + 1], jnp.arange(n))
        x, _ = jax.lax.scan(body, x, xs)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class DPM2MSampler:
    """DPM-Solver++(2M) Karras, with optional reflow x0 conversion
    (reference stochastic_sampler_edm.py:180-259). Deterministic."""

    num_steps: int = 50
    cond_scale: float = 1.0
    reflow: bool = False

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise
        t_fn = lambda s: -jnp.log(s)

        def denoise(xc, sigma):
            out = fn(xc, sigma=sigma, cond_scale=self.cond_scale)
            if self.reflow:
                out = xc - out * sigma
            return out

        # first step (no old_denoised)
        sigma0, sigma1 = sigmas[0], sigmas[1]
        d0 = denoise(x, sigma0)
        h0 = t_fn(sigma1) - t_fn(sigma0)
        x = (jnp.minimum(sigma1, sigma0) / jnp.maximum(sigma1, sigma0)) * x - jnp.expm1(
            -h0
        ) * d0

        def body(carry, xs):
            x, old_denoised = carry
            sigma_last, sigma, sigma_next = xs
            denoised = denoise(x, sigma)
            safe_next = jnp.where(sigma_next == 0, 1.0, sigma_next)
            t, t_next = t_fn(sigma), t_fn(safe_next)
            h = t_next - t
            t_min = jnp.minimum(safe_next, sigma)
            t_max = jnp.maximum(safe_next, sigma)
            h_last = t_fn(sigma) - t_fn(sigma_last)
            h_min = jnp.minimum(h_last, h)
            h_max = jnp.maximum(h_last, h)
            r = h_max / h_min
            h_d = (h_max + h_min) / 2.0
            denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x_multi = (t_min / t_max) * x - jnp.expm1(-h_d) * denoised_d
            # sigma_next == 0: x -> denoised (the -expm1(-inf) = 1 limit)
            x = jnp.where(sigma_next == 0, denoised, x_multi)
            return (x, denoised), None

        n = self.num_steps
        xs = (sigmas[0 : n - 1], sigmas[1:n], sigmas[2 : n + 1])
        (x, _), _ = jax.lax.scan(body, (x, d0), xs)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class DPMPPSDESampler:
    """DPM++ SDE Karras driven by Brownian-bridge noise (reference :261-346)."""

    num_steps: int = 50
    cond_scale: float = 1.0
    eta: float = 1.0
    rho: float = 0.5

    def __call__(self, noise, fn, sigmas, key: Optional[jax.Array] = None, **_):
        if key is None:
            key = jax.random.key(0)
        x = sigmas[0] * noise
        bridge = BrownianBridgeNoise(key, x.shape, x.dtype)
        sigma_fn = lambda t: jnp.exp(-t)
        t_fn = lambda s: -jnp.log(s)

        def body(x, xs):
            sigma, sigma_next, i = xs
            denoised = fn(x, sigma=sigma, cond_scale=self.cond_scale)

            # Euler branch for sigma_next == 0
            d = (x - denoised) / sigma
            x_euler = x + d * (sigma_next - sigma)

            safe_next = jnp.where(sigma_next == 0, 1.0, sigma_next)
            t, t_next = t_fn(sigma), t_fn(safe_next)
            h = t_next - t
            s = t + h * self.rho
            fac = 1 / (2 * self.rho)

            noise_1, noise_2 = bridge.pair(i, sigma_fn(t), sigma_fn(s), sigma_fn(t_next))

            # Step 1
            sd, su = ancestral_sigmas(sigma_fn(t), sigma_fn(s), self.eta)
            s_ = t_fn(sd)
            x_2 = (sigma_fn(s_) / sigma_fn(t)) * x - jnp.expm1(t - s_) * denoised
            x_2 = x_2 + noise_1 * su
            denoised_2 = fn(x_2, sigma=sigma_fn(s), cond_scale=self.cond_scale)

            # Step 2
            sd, su = ancestral_sigmas(sigma_fn(t), sigma_fn(t_next), self.eta)
            t_next_ = t_fn(sd)
            denoised_d = (1 - fac) * denoised + fac * denoised_2
            x_sde = (sigma_fn(t_next_) / sigma_fn(t)) * x - jnp.expm1(t - t_next_) * denoised_d
            x_sde = x_sde + noise_2 * su

            x = jnp.where(sigma_next == 0, x_euler, x_sde)
            return x, None

        n = self.num_steps - 1
        xs = (sigmas[:n], sigmas[1 : n + 1], jnp.arange(n))
        x, _ = jax.lax.scan(body, x, xs)
        return jnp.clip(x, -1.0, 1.0)
