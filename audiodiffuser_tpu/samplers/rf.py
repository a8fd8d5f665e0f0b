"""Samplers for rectified-flow (velocity-prediction) networks.

Capability parity with the reference ``src/models/components/sampler_rf.py``:
ReflowEulerSampler (:7-70), DPM2MSANASampler (:72-145), DPMSampler (:147-390),
UniPCSampler (:392-586). The rf solvers treat the incoming grid values as EDM
sigmas with lambda = -log(sigma) (alpha = 1) and convert the velocity
prediction to an x0 estimate via x0 = x - v*sigma.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .dpm_core import dpm_multistep, dpm_singlestep, rf_space, singlestep_orders, unipc


@dataclass(frozen=True)
class ReflowEulerSampler:
    """Euler (optionally Heun) integration of the learned velocity field.

    Expects a grid of num_steps+1 entries (the reference indexes sigmas[i+1]
    for i in range(num_steps))."""

    num_steps: int = 200
    cond_scale: float = 1.0
    use_heun: bool = True

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise

        def euler_heun(x, sigma, sigma_next):
            vc = fn(x, sigma=sigma, cond_scale=self.cond_scale)
            x_next = x + (sigma_next - sigma) * vc
            if self.use_heun:
                vc_next = fn(x_next, sigma=sigma_next, cond_scale=self.cond_scale)
                x_heun = x + 0.5 * (sigma_next - sigma) * (vc + vc_next)
                x_next = jnp.where(sigma_next != 0, x_heun, x_next)
            return x_next

        def euler(x, sigma, sigma_next):
            vc = fn(x, sigma=sigma, cond_scale=self.cond_scale)
            return x + (sigma_next - sigma) * vc

        n = self.num_steps
        if self.use_heun:
            def body(x, xs):
                sigma, sigma_next = xs
                return euler_heun(x, sigma, sigma_next), None

            # interior steps never hit sigma_next == 0 on a monotone grid;
            # the final step is peeled to drop the wasted Heun eval there.
            x, _ = jax.lax.scan(body, x, (sigmas[: n - 1], sigmas[1:n]))
            x = euler(x, sigmas[n - 1], sigmas[n])
        else:
            def body(x, xs):
                sigma, sigma_next = xs
                return euler(x, sigma, sigma_next), None

            x, _ = jax.lax.scan(body, x, (sigmas[:n], sigmas[1 : n + 1]))
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class DPM2MSANASampler:
    """DPM-Solver++(2M) on the velocity field with SANA time-shift rescaling
    (reference :72-145). Expects num_steps+1 grid entries."""

    num_steps: int = 50
    cond_scale: float = 1.0
    time_shift: float = 1.0

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise
        # SANA rescaling (applied after the initial noise scaling)
        sigmas = sigmas * self.time_shift / (1 + (self.time_shift - 1) * sigmas)
        t_fn = lambda s: -jnp.log(s)

        def denoise(xc, sigma):
            v_pred = fn(xc, sigma=sigma, cond_scale=self.cond_scale)
            return xc - v_pred * sigma

        # first step (no old_denoised)
        sigma0, sigma1 = sigmas[0], sigmas[1]
        d0 = denoise(x, sigma0)
        h0 = t_fn(sigma1) - t_fn(sigma0)
        x = (sigma1 / sigma0) * x - jnp.expm1(-h0) * d0

        def body(carry, xs):
            x, old_denoised = carry
            sigma_last, sigma, sigma_next = xs
            denoised = denoise(x, sigma)
            safe_next = jnp.where(sigma_next == 0, 1.0, sigma_next)
            h = t_fn(safe_next) - t_fn(sigma)
            h_last = t_fn(sigma) - t_fn(sigma_last)
            r = h_last / h
            denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x_multi = (safe_next / sigma) * x - jnp.expm1(-h) * denoised_d
            x = jnp.where(sigma_next == 0, denoised, x_multi)
            return (x, denoised), None

        n = self.num_steps
        xs = (sigmas[0 : n - 1], sigmas[1:n], sigmas[2 : n + 1])
        (x, _), _ = jax.lax.scan(body, (x, d0), xs)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class DPMSampler:
    """DPM-Solver 1/2/3 (single/multistep) on rf velocity nets (reference
    :147-390): grid values are sigmas, lambda = -log sigma, x0 = x - v*sigma."""

    cond_scale: float = 1.0
    order: int = 1
    num_steps: int = 10
    multisteps: bool = False

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise
        space = rf_space()
        lams = -jnp.log(sigmas)

        def model_fn(xc, lam):
            sigma = jnp.exp(-lam)
            v_pred = fn(xc, sigma=sigma, cond_scale=self.cond_scale)
            return xc - v_pred * sigma

        if self.multisteps:
            x = dpm_multistep(x, lams, self.order, self.num_steps, model_fn, space, True)
        else:
            orders = singlestep_orders(self.order, self.num_steps)
            x = dpm_singlestep(x, lams, orders, model_fn, space, True)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class UniPCSampler:
    """UniPC on rf velocity nets (reference :392-586): the grid is resampled
    linearly in sigma between sigmas[0] and sigmas[-1]."""

    num_steps: int = 20
    order: int = 2
    cond_scale: float = 1.0
    variant: str = "bh2"

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise
        space = rf_space()
        grid = jnp.linspace(sigmas[0], sigmas[-1], self.num_steps + 1)
        lams = -jnp.log(grid)

        def model_fn(xc, lam):
            sigma = jnp.exp(-lam)
            v_pred = fn(xc, sigma=sigma, cond_scale=self.cond_scale)
            return xc - v_pred * sigma

        x = unipc(x, lams, self.order, self.num_steps, model_fn, space, True, self.variant)
        return jnp.clip(x, -1.0, 1.0)
