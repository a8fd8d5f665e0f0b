"""Samplers for x0-predicting (EDM-preconditioned) denoisers.

Capability parity with the reference ``src/models/components/sampler_edm.py``:
VESampler (:31-123), VPSampler (:125-227), EDMAlphaSampler (:229-300),
EDMSampler (:302-397), DPM2Sampler (:401-493), DPMSampler (:495-805),
UniPCSampler (:807-1053), DPM2MSampler (:1056-1131), LMSSampler (:1134-1189).

Redesign notes (TPU-native):
- every per-step Python loop is a ``lax.scan``; boundary steps with
  different control flow (final Euler-only step, solver warm-up/tail) are
  peeled out so compiled NFE matches the reference loop exactly;
- stochastic churn noise comes from folding the step index into the caller's
  PRNG key — fully reproducible, no host RNG;
- the LMS Adams-Bashforth coefficients are *exact* polynomial integrals
  computed once on host from the (concrete) sigma grid, instead of per-step
  scipy.integrate.quad host syncs (reference :1149-1160).

Call contract: ``sampler(noise, fn, sigmas, key=None) -> x0`` where
``fn(x, sigma=…, cond_scale=…)`` is the diffusion's denoise_fn with network
and conditioning pre-bound (see samplers/base.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import DenoiseFn, append_zero, churn_gammas, step_noise
from .dpm_core import (
    dpm_multistep,
    dpm_singlestep,
    edm_space,
    singlestep_orders,
    unipc,
)


@dataclass(frozen=True)
class EDMSampler:
    """Canonical EDM stochastic Heun sampler (Algorithm 2); s_churn=0 => DDIM."""

    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_churn: float = 150.0
    s_noise: float = 1.04
    num_steps: int = 200
    cond_scale: float = 1.0
    use_heun: bool = True

    def _denoise(self, fn, x, sigma):
        return fn(x, sigma=sigma, cond_scale=self.cond_scale)

    def __call__(
        self,
        noise: jnp.ndarray,
        fn: DenoiseFn,
        sigmas: jnp.ndarray,
        key: Optional[jax.Array] = None,
        **_,
    ) -> jnp.ndarray:
        sigmas = append_zero(sigmas)
        gammas = churn_gammas(sigmas, self.s_tmin, self.s_tmax, self.s_churn, self.num_steps)
        x = sigmas[0] * noise
        if key is None:
            key = jax.random.key(0)

        def euler_pre(x, sigma, gamma, i):
            """Churn + Euler half of a step; returns (x_hat, sigma_hat, d)."""
            if self.s_churn == 0:
                # statically churn-free (DDIM): no per-step RNG work at all
                denoised = self._denoise(fn, x, sigma)
                return x, sigma, (x - denoised) / sigma
            sigma_hat = sigma + gamma * sigma
            eps = self.s_noise * step_noise(key, i, x.shape, x.dtype)
            bump = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            x_hat = jnp.where(gamma > 0, x + bump * eps, x)
            denoised = self._denoise(fn, x_hat, sigma_hat)
            d = (x_hat - denoised) / sigma_hat
            return x_hat, sigma_hat, d

        def heun_body(x, xs):
            sigma, sigma_next, gamma, i = xs
            x_hat, sigma_hat, d = euler_pre(x, sigma, gamma, i)
            x_next = x_hat + (sigma_next - sigma_hat) * d
            denoised_next = self._denoise(fn, x_next, sigma_next)
            d_prime = (x_next - denoised_next) / sigma_next
            return x_hat + 0.5 * (sigma_next - sigma_hat) * (d + d_prime), None

        def euler_body(x, xs):
            sigma, sigma_next, gamma, i = xs
            x_hat, sigma_hat, d = euler_pre(x, sigma, gamma, i)
            return x_hat + (sigma_next - sigma_hat) * d, None

        n = self.num_steps
        idx = jnp.arange(n)
        if self.use_heun:
            # Heun on steps 0..n-2 (sigma_next > 0), final step Euler-only.
            xs = (sigmas[: n - 1], sigmas[1:n], gammas[: n - 1], idx[: n - 1])
            x, _ = jax.lax.scan(heun_body, x, xs)
            x, _ = euler_body(x, (sigmas[n - 1], sigmas[n], gammas[n - 1], idx[n - 1]))
        else:
            xs = (sigmas[:n], sigmas[1 : n + 1], gammas[:n], idx)
            x, _ = jax.lax.scan(euler_body, x, xs)
        return x


@dataclass(frozen=True)
class EDMAlphaSampler:
    """EDM deterministic generalized Runge-Kutta (Algo 3); alpha=1 == Heun."""

    alpha: float = 1.0
    num_steps: int = 50
    cond_scale: float = 1.0
    use_heun: bool = True

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise
        a = self.alpha

        def body(x, xs):
            sigma, sigma_next = xs
            h = sigma_next - sigma
            denoised = fn(x, sigma=sigma, cond_scale=self.cond_scale)
            d = (x - denoised) / sigma
            if not self.use_heun:
                return x + h * d, None
            sigma_p = sigma + a * h
            x_p = x + a * h * d
            safe_p = jnp.where(sigma_p == 0, 1.0, sigma_p)
            denoised_p = fn(x_p, sigma=safe_p, cond_scale=self.cond_scale)
            d_p = (x_p - denoised_p) / safe_p
            heun = x + h * ((1 - 0.5 / a) * d + 0.5 / a * d_p)
            return jnp.where(sigma_p == 0, x + h * d, heun), None

        xs = (sigmas[: self.num_steps - 1], sigmas[1 : self.num_steps])
        x, _ = jax.lax.scan(body, x, xs)
        return x


@dataclass(frozen=True)
class VESampler:
    """EDM Algorithm 2 run in t = sigma^2 time (variance-exploding)."""

    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_churn: float = 200.0
    s_noise: float = 1.0
    num_steps: int = 200
    cond_scale: float = 1.0
    use_heun: bool = True

    def __call__(self, noise, fn, sigmas, key=None, **_):
        if key is None:
            key = jax.random.key(0)
        ts = append_zero(sigmas**2)
        gammas = churn_gammas(sigmas, self.s_tmin, self.s_tmax, self.s_churn, self.num_steps)
        x = noise * sigmas[0]

        t_to_sigma = jnp.sqrt
        # d/dt sigma(t) / sigma(t) = 0.5/t

        def euler_pre(x, t, gamma, i):
            t_hat = (t_to_sigma(t) + gamma * t_to_sigma(t)) ** 2
            bump = jnp.sqrt(jnp.maximum(t_hat - t, 0.0))
            x_hat = x + bump * self.s_noise * step_noise(key, i, x.shape, x.dtype)
            denoised = fn(x_hat, sigma=t_to_sigma(t_hat), cond_scale=self.cond_scale)
            d = (0.5 / t_hat) * x_hat - (0.5 / t_hat) * denoised
            return x_hat, t_hat, d

        def heun_body(x, xs):
            t, t_next, gamma, i = xs
            x_hat, t_hat, d = euler_pre(x, t, gamma, i)
            h = t_next - t_hat
            x_next = x_hat + h * d
            t_prime = t_hat + h
            denoised_p = fn(x_next, sigma=t_to_sigma(t_prime), cond_scale=self.cond_scale)
            d_p = (0.5 / t_prime) * x_next - (0.5 / t_prime) * denoised_p
            return x_hat + 0.5 * h * (d + d_p), None

        def euler_body(x, xs):
            t, t_next, gamma, i = xs
            x_hat, t_hat, d = euler_pre(x, t, gamma, i)
            return x_hat + (t_next - t_hat) * d, None

        n = self.num_steps
        idx = jnp.arange(n)
        if self.use_heun:
            xs = (ts[: n - 1], ts[1:n], gammas[: n - 1], idx[: n - 1])
            x, _ = jax.lax.scan(heun_body, x, xs)
            x, _ = euler_body(x, (ts[n - 1], ts[n], gammas[n - 1], idx[n - 1]))
        else:
            xs = (ts[:n], ts[1 : n + 1], gammas[:n], idx)
            x, _ = jax.lax.scan(euler_body, x, xs)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class VPSampler:
    """EDM Algorithm 1 for VP with scale s(t) (reference sampler_edm.py:125-227)."""

    beta_d: float = 19.9
    beta_min: float = 0.1
    s_churn: float = 200.0
    s_noise: float = 1.0
    s_min: float = 0.0
    s_max: float = float("inf")
    num_steps: int = 200
    cond_scale: float = 1.0
    use_heun: bool = True

    def t_to_sigma(self, t):
        return (jnp.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0) ** 0.5

    def sigma_to_t(self, sigma):
        return (
            jnp.sqrt(self.beta_min**2 + 2 * self.beta_d * jnp.log(sigma**2 + 1))
            - self.beta_min
        ) / self.beta_d

    def sigma_deriv(self, t):
        return 0.5 * (self.beta_min + self.beta_d * t) * (
            self.t_to_sigma(t) + 1.0 / self.t_to_sigma(t)
        )

    def scale(self, t):
        return 1.0 / jnp.sqrt(1.0 + self.t_to_sigma(t) ** 2)

    def scale_deriv(self, t):
        return -self.t_to_sigma(t) * self.sigma_deriv(t) * self.scale(t) ** 3

    def __call__(self, noise, fn, sigmas, key=None, **_):
        if key is None:
            key = jax.random.key(0)
        ts = append_zero(self.sigma_to_t(sigmas))
        gammas = churn_gammas(sigmas, self.s_min, self.s_max, self.s_churn, self.num_steps)
        x = noise * sigmas[0] * self.scale(ts[0])

        def euler_pre(x, t, gamma, i):
            sig, sig_d, s, s_d = self.t_to_sigma, self.sigma_deriv, self.scale, self.scale_deriv
            t_hat = self.sigma_to_t(sig(t) + gamma * sig(t))
            bump = jnp.sqrt(jnp.maximum(sig(t_hat) ** 2 - sig(t) ** 2, 0.0))
            x_hat = s(t_hat) / s(t) * x + bump * s(t_hat) * self.s_noise * step_noise(
                key, i, x.shape, x.dtype
            )
            denoised = fn(x_hat / s(t_hat), sigma=sig(t_hat), cond_scale=self.cond_scale)
            d = (sig_d(t_hat) / sig(t_hat) + s_d(t_hat) / s(t_hat)) * x_hat - sig_d(
                t_hat
            ) * s(t_hat) / sig(t_hat) * denoised
            return x_hat, t_hat, d

        def heun_body(x, xs):
            sig, sig_d, s, s_d = self.t_to_sigma, self.sigma_deriv, self.scale, self.scale_deriv
            t, t_next, gamma, i = xs
            x_hat, t_hat, d = euler_pre(x, t, gamma, i)
            h = t_next - t_hat
            x_next = x_hat + h * d
            t_p = t_hat + h
            denoised_p = fn(x_next / s(t_p), sigma=sig(t_p), cond_scale=self.cond_scale)
            d_p = (sig_d(t_p) / sig(t_p) + s_d(t_p) / s(t_p)) * x_next - sig_d(t_p) * s(
                t_p
            ) / sig(t_p) * denoised_p
            return x_hat + 0.5 * h * (d + d_p), None

        def euler_body(x, xs):
            t, t_next, gamma, i = xs
            x_hat, t_hat, d = euler_pre(x, t, gamma, i)
            return x_hat + (t_next - t_hat) * d, None

        n = self.num_steps
        idx = jnp.arange(n)
        if self.use_heun:
            xs = (ts[: n - 1], ts[1:n], gammas[: n - 1], idx[: n - 1])
            x, _ = jax.lax.scan(heun_body, x, xs)
            x, _ = euler_body(x, (ts[n - 1], ts[n], gammas[n - 1], idx[n - 1]))
        else:
            xs = (ts[:n], ts[1 : n + 1], gammas[:n], idx)
            x, _ = jax.lax.scan(euler_body, x, xs)
        return x


@dataclass(frozen=True)
class DPM2Sampler:
    """DPM2 Karras with churn; log-space midpoint (reference :401-493)."""

    rho: float = 2.0
    num_steps: int = 50
    cond_scale: float = 1.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_churn: float = 150.0
    s_noise: float = 1.04

    def __call__(self, noise, fn, sigmas, key=None, **_):
        if key is None:
            key = jax.random.key(0)
        gammas = churn_gammas(sigmas, self.s_tmin, self.s_tmax, self.s_churn, self.num_steps)
        x = sigmas[0] * noise

        def body(x, xs):
            sigma, sigma_next, gamma, i = xs
            sigma_hat = sigma + gamma * sigma
            eps = self.s_noise * step_noise(key, i, x.shape, x.dtype)
            bump = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            x_hat = jnp.where(gamma > 0, x + bump * eps, x)
            denoised = fn(x_hat, sigma=sigma_hat, cond_scale=self.cond_scale)
            d = (x_hat - denoised) / sigma_hat

            # log-space midpoint between sigma_hat and sigma_next
            safe_next = jnp.maximum(sigma_next, 1e-12)
            sigma_mid = jnp.exp(
                0.5 * (jnp.log(sigma_hat) + jnp.log(safe_next))
            )
            dt_1 = sigma_mid - sigma_hat
            dt_2 = sigma_next - sigma_hat
            x_2 = x_hat + d * dt_1
            denoised_2 = fn(x_2, sigma=sigma_mid, cond_scale=self.cond_scale)
            d_2 = (x_2 - denoised_2) / sigma_mid
            x_mid = x_hat + d_2 * dt_2
            # Euler fallback only when sigma_next == 0 (never on a Karras grid)
            x_out = jnp.where(sigma_next == 0.0, x_hat + d * dt_2, x_mid)
            return x_out, None

        n = self.num_steps - 1
        xs = (sigmas[:n], sigmas[1 : n + 1], gammas[:n], jnp.arange(n))
        x, _ = jax.lax.scan(body, x, xs)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class DPMSampler:
    """DPM-Solver 1/2/3, single- and multistep, x0- or eps-prediction
    (reference :495-805). ``log_time_spacing`` resamples the grid uniformly
    in lambda = -log sigma; otherwise the incoming sigma grid is used with
    its native (non-uniform) lambda spacing."""

    cond_scale: float = 1.0
    order: int = 1
    num_steps: int = 10
    multisteps: bool = False
    x0_pred: bool = True
    log_time_spacing: bool = True

    def _lams(self, sigmas, k):
        if self.log_time_spacing:
            return jnp.linspace(-jnp.log(sigmas[0]), -jnp.log(sigmas[-1]), k + 1)
        return -jnp.log(sigmas)

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise
        space = edm_space()
        num_steps = self.num_steps if self.log_time_spacing else self.num_steps - 1

        def model_fn(xc, lam):
            sigma = jnp.exp(-lam)
            pred = fn(xc, sigma=sigma, cond_scale=self.cond_scale)
            if self.x0_pred:
                return pred
            return (xc - pred) / sigma

        if self.multisteps:
            lams = self._lams(sigmas, num_steps)
            x = dpm_multistep(x, lams, self.order, num_steps, model_fn, space, self.x0_pred)
        else:
            orders = singlestep_orders(self.order, num_steps)
            lams = self._lams(sigmas, len(orders))
            x = dpm_singlestep(x, lams, orders, model_fn, space, self.x0_pred)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class UniPCSampler:
    """UniPC predictor-corrector, order-k, bh1/bh2 (reference :807-1053)."""

    num_steps: int = 20
    order: int = 2
    cond_scale: float = 1.0
    x0_pred: bool = True
    log_time_spacing: bool = True
    variant: str = "bh2"

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise
        space = edm_space()
        num_steps = self.num_steps if self.log_time_spacing else self.num_steps - 1

        if self.log_time_spacing:
            lams = jnp.linspace(-jnp.log(sigmas[0]), -jnp.log(sigmas[-1]), num_steps + 1)
        else:
            lams = -jnp.log(sigmas)

        def model_fn(xc, lam):
            sigma = jnp.exp(-lam)
            pred = fn(xc, sigma=sigma, cond_scale=self.cond_scale)
            if self.x0_pred:
                return pred
            return (xc - pred) / sigma

        x = unipc(x, lams, self.order, num_steps, model_fn, space, self.x0_pred, self.variant)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class DPM2MSampler:
    """DPM-Solver++(2M) Karras (reference :1056-1131).

    Expects a sigma grid of num_steps+1 entries (the reference indexes
    sigmas[i+1] for i in range(num_steps))."""

    num_steps: int = 50
    cond_scale: float = 1.0

    def __call__(self, noise, fn, sigmas, key=None, **_):
        x = sigmas[0] * noise
        t_fn = lambda s: -jnp.log(s)

        def denoise(xc, sigma):
            return fn(xc, sigma=sigma, cond_scale=self.cond_scale)

        def update(x, denoised, sigma, sigma_next, h, use_old, old_denoised, h_last):
            t_min = jnp.minimum(sigma_next, sigma)
            t_max = jnp.maximum(sigma_next, sigma)
            h_min = jnp.minimum(h_last, h)
            h_max = jnp.maximum(h_last, h)
            r = h_max / h_min
            h_d = (h_max + h_min) / 2.0
            denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x_first = (t_min / t_max) * x - jnp.expm1(-h) * denoised
            x_multi = (t_min / t_max) * x - jnp.expm1(-h_d) * denoised_d
            return jnp.where(use_old & (sigma_next != 0), x_multi, x_first)

        # first step: no old_denoised
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
            h = t_fn(sigma_next) - t_fn(sigma)
            h_last = t_fn(sigma) - t_fn(sigma_last)
            x = update(x, denoised, sigma, sigma_next, h, True, old_denoised, h_last)
            return (x, denoised), None

        n = self.num_steps
        xs = (sigmas[0 : n - 1], sigmas[1:n], sigmas[2 : n + 1])
        (x, _), _ = jax.lax.scan(body, (x, d0), xs)
        return jnp.clip(x, -1.0, 1.0)


@dataclass(frozen=True)
class LMSSampler:
    """Linear multistep (Adams-Bashforth) solver (reference :1134-1189).

    The reference integrates the Lagrange basis polynomials numerically with
    scipy.quad on the host *inside* the sampling loop; here the integrals are
    computed exactly (they are polynomials) once per grid, so the compiled
    loop is a pure on-device scan."""

    num_steps: int = 50
    cond_scale: float = 1.0
    order: int = 4

    @staticmethod
    def _lms_coeffs(sigmas: np.ndarray, order: int) -> np.ndarray:
        """coeffs[i, j] = integral_{sigma_i}^{sigma_i+1} prod_{k!=j}
        (tau - s_{i-k}) / (s_{i-j} - s_{i-k}) dtau, exactly."""
        n = len(sigmas) - 1
        coeffs = np.zeros((n, order), dtype=np.float64)
        for i in range(n):
            cur_order = min(i + 1, order)
            for j in range(cur_order):
                poly = np.poly1d([1.0])
                for k in range(cur_order):
                    if j == k:
                        continue
                    poly *= np.poly1d([1.0, -sigmas[i - k]]) / (
                        sigmas[i - j] - sigmas[i - k]
                    )
                p_int = poly.integ()
                coeffs[i, j] = p_int(sigmas[i + 1]) - p_int(sigmas[i])
        return coeffs

    def __call__(self, noise, fn, sigmas, key=None, **_):
        sig_np = np.asarray(jax.device_get(sigmas), dtype=np.float64)
        coeffs = jnp.asarray(
            self._lms_coeffs(sig_np, self.order)[: self.num_steps - 1], dtype=noise.dtype
        )
        x = sigmas[0] * noise
        order = self.order

        # ds ring buffer: slot 0 = newest derivative (from step i), slot j = step i-j.
        def body(carry, xs):
            x, ds = carry
            sigma, coeff = xs
            denoised = fn(x, sigma=sigma, cond_scale=self.cond_scale)
            d = (x - denoised) / sigma
            ds = jnp.concatenate([d[None], ds[: order - 1]], axis=0)
            x = x + jnp.einsum("j,j...->...", coeff, ds)
            return (x, ds), None

        ds0 = jnp.zeros((order,) + x.shape, x.dtype)
        n = self.num_steps - 1
        (x, _), _ = jax.lax.scan(body, (x, ds0), (sigmas[:n], coeffs))
        return jnp.clip(x, -1.0, 1.0)
