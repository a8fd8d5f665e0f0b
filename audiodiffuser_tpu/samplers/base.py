"""Shared sampler machinery.

Sampler call contract (mirrors the reference's
``sampler(noise, fn, net, sigmas, **kwargs) -> x0`` — e.g.
``src/models/components/sampler_edm.py:371-397`` — redesigned for JAX):

- ``fn(x, sigma, cond_scale) -> prediction`` is the diffusion formulation's
  ``denoise_fn`` with the network, its params and all conditioning already
  bound by the task layer. ``sigma`` may be a scalar (broadcast to the batch
  inside ``denoise_fn``).
- ``sampler(noise, fn, sigmas, key=None) -> x0``; ``key`` feeds stochastic
  samplers (churn/ancestral/SDE noise) and is ignored by deterministic ones.
- The per-step loop is a ``lax.scan`` (boundary steps with different control
  flow are peeled out of the scan so compiled NFE matches the reference's
  Python loop exactly). Everything stays on device; no host sync per step.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

DenoiseFn = Callable[..., jnp.ndarray]


def append_zero(sigmas: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([sigmas, jnp.zeros_like(sigmas[:1])])


def churn_gammas(
    sigmas: jnp.ndarray,
    s_tmin: float,
    s_tmax: float,
    s_churn: float,
    num_steps: int,
) -> jnp.ndarray:
    """EDM stochastic churn: gamma_i = min(s_churn/N, sqrt(2)-1) inside the
    [s_tmin, s_tmax] sigma band, else 0 (reference sampler_edm.py:383-387)."""
    g = min(s_churn / num_steps, 2**0.5 - 1.0)
    return jnp.where((sigmas >= s_tmin) & (sigmas <= s_tmax), g, 0.0)


def ancestral_sigmas(
    sigma: jnp.ndarray, sigma_next: jnp.ndarray, eta: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split sigma_next into an ancestral (noise-injection, integration) pair
    (reference stochastic_sampler_edm.py:30-33)."""
    sigma_up = jnp.minimum(
        sigma_next,
        eta
        * jnp.sqrt(
            jnp.maximum(sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2, 0.0)
        ),
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))
    return sigma_up, sigma_down


def safe_div(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """num/den with den==0 mapped to 0 (used where a branch is masked out)."""
    den_safe = jnp.where(den == 0, 1.0, den)
    return jnp.where(den == 0, 0.0, num / den_safe)


def step_noise(key: Optional[jax.Array], i, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Per-step standard normal derived by folding the step index into the key."""
    if key is None:
        raise ValueError("stochastic sampler requires a PRNG key")
    return jax.random.normal(jax.random.fold_in(key, i), shape, dtype)


class BrownianBridgeNoise:
    """Counter-based replacement for torchsde.BrownianTree noise.

    The reference wraps a Brownian tree per batch item
    (``src/models/components/utils.py:54-102``) and queries normalized
    increments W(t0..t1)/sqrt(|t1-t0|). We reproduce the *correlation
    structure actually exercised* by the DPM++ SDE sampler — per step it
    queries the sub-interval (t, s) and the full interval (t, t_next) with
    s inside — by drawing two independent increments per step from a
    counter-based key and composing: the full-interval increment shares the
    first sub-increment. Fully on-device, reproducible, no host sync.
    """

    def __init__(self, key: jax.Array, shape, dtype=jnp.float32):
        self.key = key
        self.shape = shape
        self.dtype = dtype

    def pair(self, i, t0, t1, t2):
        """Normalized noises for intervals (t0,t1) and (t0,t2), t1 in (t2,t0).

        Returns (n1, n2) each ~ N(0,1) marginally with the Brownian coupling
        cov(n1, n2) = sqrt(|t1-t0| / |t2-t0|).
        """
        k = jax.random.fold_in(self.key, i)
        k1, k2 = jax.random.split(k)
        z1 = jax.random.normal(k1, self.shape, self.dtype)
        z2 = jax.random.normal(k2, self.shape, self.dtype)
        d1 = jnp.abs(t1 - t0)
        d2 = jnp.abs(t2 - t1)
        dtot = jnp.maximum(d1 + d2, 1e-20)
        n1 = z1
        n2 = (z1 * jnp.sqrt(d1) + z2 * jnp.sqrt(d2)) / jnp.sqrt(dtot)
        return n1, n2
