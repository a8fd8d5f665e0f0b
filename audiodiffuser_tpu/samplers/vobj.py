"""Samplers for v-prediction networks (logSNR space).

Capability parity with the reference ``src/models/components/sampler_vobj.py``:
VEulerSampler (:31-109), VSampler (:111-194), DPMSampler (:196-499),
UniPCSampler (:502-732). The v-family solvers run in logSNR lambda-space
(lambda = logSNR, so half-logSNR phis use h/2 — ``vobj_space``); the network
is called with the logSNR as its noise-conditioning input (that is what
VDiffusion.denoise_fn expects for for_edm=False).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .base import DenoiseFn, append_zero, step_noise
from .dpm_core import dpm_multistep, dpm_singlestep, singlestep_orders, unipc, vobj_space


def shifted_cosine_logsnr(t, logsnr_min=-15.0, logsnr_max=15.0, shift=0.0):
    t_min = math.atan(math.exp(-0.5 * logsnr_max))
    t_max = math.atan(math.exp(-0.5 * logsnr_min))
    return -2.0 * jnp.log(jnp.tan(t_min + t * (t_max - t_min))) + 2.0 * shift


@dataclass(frozen=True)
class VEulerSampler:
    """Deterministic v-space Euler (optionally Heun) over the shifted-cosine
    logSNR schedule."""

    logsnr_min: float = -15.0
    logsnr_max: float = 15.0
    shift: float = 0.5
    num_steps: int = 200
    cond_scale: float = 1.0
    use_heun: bool = False

    def _logsnr(self, t):
        return shifted_cosine_logsnr(t, self.logsnr_min, self.logsnr_max, self.shift)

    def __call__(self, noise, fn, sigmas, key=None, **_):
        ts = append_zero(sigmas)  # t-grid with t_N = 0
        x = noise

        def step(x, t, t_next):
            logsnr_t = self._logsnr(t)
            logsnr_s = self._logsnr(t_next)
            v_pred = fn(x, sigma=logsnr_t, cond_scale=self.cond_scale)
            alpha_t = jnp.sqrt(jax.nn.sigmoid(logsnr_t))
            sigma_t = jnp.sqrt(jax.nn.sigmoid(-logsnr_t))
            alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
            sigma_s = jnp.sqrt(jax.nn.sigmoid(-logsnr_s))

            score_cur = -alpha_t * sigma_t * v_pred
            x_next = x + 0.5 * (logsnr_s - logsnr_t) * score_cur
            if self.use_heun:
                v_next = fn(x_next, sigma=logsnr_s, cond_scale=self.cond_scale)
                score_next = -alpha_s * sigma_s * v_next
                x_next = x + 0.25 * (logsnr_s - logsnr_t) * (score_next + score_cur)
            return x_next

        def body(x, xs):
            t, t_next = xs
            return step(x, t, t_next), None

        n = self.num_steps
        x, _ = jax.lax.scan(body, x, (ts[: n - 1], ts[1:n]))
        # final step: t_next == 0 -> deterministic x0 readout
        t = ts[n - 1]
        logsnr_t = self._logsnr(t)
        v_pred = fn(x, sigma=logsnr_t, cond_scale=self.cond_scale)
        alpha_t = jnp.sqrt(jax.nn.sigmoid(logsnr_t))
        sigma_t = jnp.sqrt(jax.nn.sigmoid(-logsnr_t))
        x = alpha_t * x - sigma_t * v_pred
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class VSampler:
    """Stochastic DDPM-style ancestral sampler in v-space (reference :111-194)."""

    logsnr_min: float = -15.0
    logsnr_max: float = 15.0
    shift: float = 0.0
    num_steps: int = 200
    cond_scale: float = 1.0

    def _logsnr(self, t):
        return shifted_cosine_logsnr(t, self.logsnr_min, self.logsnr_max, self.shift)

    def __call__(self, noise, fn, sigmas, key: Optional[jax.Array] = None, **_):
        if key is None:
            key = jax.random.key(0)
        ts = append_zero(sigmas)
        x = noise

        def posterior(x, t, t_next):
            logsnr_t = self._logsnr(t)
            logsnr_s = self._logsnr(t_next)
            v_pred = fn(x, sigma=logsnr_t, cond_scale=self.cond_scale)
            alpha_t = jnp.sqrt(jax.nn.sigmoid(logsnr_t))
            sigma_t = jnp.sqrt(jax.nn.sigmoid(-logsnr_t))
            alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
            sigma_s = jnp.sqrt(jax.nn.sigmoid(-logsnr_s))
            x_pred = jnp.clip(alpha_t * x - sigma_t * v_pred, -1.0, 1.0)
            c = -jnp.expm1(logsnr_t - logsnr_s)
            mu = alpha_s * (x * (1 - c) / alpha_t + c * x_pred)
            var = (sigma_s**2) * c
            return mu, var

        def body(x, xs):
            t, t_next, i = xs
            mu, var = posterior(x, t, t_next)
            x = mu + step_noise(key, i, x.shape, x.dtype) * jnp.sqrt(var)
            return x, None

        n = self.num_steps
        xs = (ts[: n - 1], ts[1:n], jnp.arange(n - 1))
        x, _ = jax.lax.scan(body, x, xs)
        mu, _ = posterior(x, ts[n - 1], ts[n])  # final step: mean only
        return jnp.clip(mu, -1.0, 1.0)


@dataclass(frozen=True)
class DPMSampler:
    """DPM-Solver 1/2/3 (single/multistep) in logSNR space for v-nets
    (reference :196-499)."""

    cond_scale: float = 1.0
    order: int = 1
    num_steps: int = 10
    multisteps: bool = False
    x0_pred: bool = True
    logsnr_min: float = -15.0
    logsnr_max: float = 15.0
    shift: float = 0.0

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = noise
        space = vobj_space()

        def model_fn(xc, lam):
            v_pred = fn(xc, sigma=lam, cond_scale=self.cond_scale)
            alpha = jnp.sqrt(jax.nn.sigmoid(lam))
            sigma = jnp.sqrt(jax.nn.sigmoid(-lam))
            if self.x0_pred:
                return alpha * xc - sigma * v_pred
            return sigma * xc + alpha * v_pred

        lam_start = shifted_cosine_logsnr(sigmas[0], self.logsnr_min, self.logsnr_max, self.shift)
        lam_end = shifted_cosine_logsnr(sigmas[-1], self.logsnr_min, self.logsnr_max, self.shift)

        if self.multisteps:
            lams = jnp.linspace(lam_start, lam_end, self.num_steps + 1)
            x = dpm_multistep(x, lams, self.order, self.num_steps, model_fn, space, self.x0_pred)
        else:
            orders = singlestep_orders(self.order, self.num_steps)
            lams = jnp.linspace(lam_start, lam_end, len(orders) + 1)
            x = dpm_singlestep(x, lams, orders, model_fn, space, self.x0_pred)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class UniPCSampler:
    """UniPC predictor-corrector in logSNR space for v-nets (reference :502-732)."""

    num_steps: int = 20
    order: int = 2
    cond_scale: float = 1.0
    x0_pred: bool = True
    logsnr_min: float = -15.0
    logsnr_max: float = 15.0
    shift: float = 0.0
    variant: str = "bh2"

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise
        space = vobj_space()

        def model_fn(xc, lam):
            v_pred = fn(xc, sigma=lam, cond_scale=self.cond_scale)
            alpha = jnp.sqrt(jax.nn.sigmoid(lam))
            sigma = jnp.sqrt(jax.nn.sigmoid(-lam))
            if self.x0_pred:
                return alpha * xc - sigma * v_pred
            return sigma * xc + alpha * v_pred

        lam_start = shifted_cosine_logsnr(sigmas[0], self.logsnr_min, self.logsnr_max, self.shift)
        lam_end = shifted_cosine_logsnr(sigmas[-1], self.logsnr_min, self.logsnr_max, self.shift)
        lams = jnp.linspace(lam_start, lam_end, self.num_steps + 1)

        x = unipc(x, lams, self.order, self.num_steps, model_fn, space, self.x0_pred, self.variant)
        return jnp.clip(x, -1.0, 1.0)
