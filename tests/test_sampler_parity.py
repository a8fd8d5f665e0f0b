"""Per-step numerical parity: the compiled scan samplers vs independent
float64 numpy implementations of the published algorithms, with *identical*
injected noise (BASELINE: per-sampler-step output match within fp32
tolerance).

The numpy references are written from the published algorithm statements
(EDM arXiv:2206.00364 Algorithm 2; DPM-Solver++(2M) update rule), not from
any implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.ops import KarrasSchedule
from audiodiffuser_tpu.samplers import edm as edm_s
from audiodiffuser_tpu.samplers import stochastic as st_s

MU, S = 0.25, 0.4
SHAPE = (4, 8)


def oracle_np(x, sigma):
    return (sigma**2 * MU + S**2 * x) / (S**2 + sigma**2)


def oracle_jax(x, sigma=None, cond_scale=1.0):
    sig = jnp.asarray(sigma)
    sig = sig.reshape((-1,) + (1,) * (x.ndim - 1)) if sig.ndim > 0 else sig
    return (sig**2 * MU + S**2 * x) / (S**2 + sig**2)


def test_edm_algorithm2_trajectory_parity():
    """EDM stochastic Heun w/ churn, fed the exact noise our scan draws."""
    num_steps = 12
    s_churn, s_noise = 10.0, 1.05
    sig = KarrasSchedule(sigma_min=0.01, sigma_max=10.0, rho=7.0, num_steps=num_steps)()
    key = jax.random.key(5)
    noise0 = jax.random.normal(jax.random.key(9), SHAPE)

    sampler = edm_s.EDMSampler(
        s_churn=s_churn, s_noise=s_noise, num_steps=num_steps, use_heun=True
    )
    ours = np.asarray(sampler(noise0, oracle_jax, sig, key=key))

    # ---- independent numpy implementation of EDM Algorithm 2 ----
    sigmas = np.concatenate([np.asarray(sig, np.float64), [0.0]])
    gamma_val = min(s_churn / num_steps, 2**0.5 - 1)
    x = np.asarray(noise0, np.float64) * sigmas[0]
    for i in range(num_steps):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        gamma = gamma_val  # karras grid entries are always in [s_tmin, s_tmax]
        eps = np.asarray(
            jax.random.normal(jax.random.fold_in(key, i), SHAPE), np.float64
        ) * s_noise
        sigma_hat = sigma + gamma * sigma
        x_hat = x + np.sqrt(sigma_hat**2 - sigma**2) * eps if gamma > 0 else x
        d = (x_hat - oracle_np(x_hat, sigma_hat)) / sigma_hat
        x_next = x_hat + (sigma_next - sigma_hat) * d
        if sigma_next != 0:
            d2 = (x_next - oracle_np(x_next, sigma_next)) / sigma_next
            x_next = x_hat + 0.5 * (sigma_next - sigma_hat) * (d + d2)
        x = x_next

    np.testing.assert_allclose(ours, x, rtol=1e-4, atol=1e-5)


def test_dpm2m_update_rule_parity():
    """DPM-Solver++(2M) with the h_avg ('hallatore') variant, numpy fp64."""
    num_steps = 10
    sig = KarrasSchedule(sigma_min=0.01, sigma_max=10.0, rho=7.0, num_steps=num_steps + 1)()
    noise0 = jax.random.normal(jax.random.key(11), SHAPE)

    sampler = edm_s.DPM2MSampler(num_steps=num_steps)
    ours = np.asarray(sampler(noise0, oracle_jax, sig))

    sigmas = np.asarray(sig, np.float64)
    t = lambda s: -np.log(s)
    x = np.asarray(noise0, np.float64) * sigmas[0]
    old_denoised = None
    for i in range(num_steps):
        s_cur, s_next = sigmas[i], sigmas[i + 1]
        denoised = oracle_np(x, s_cur)
        h = t(s_next) - t(s_cur)
        if old_denoised is None:
            x = (s_next / s_cur) * x - np.expm1(-h) * denoised
        else:
            h_last = t(s_cur) - t(sigmas[i - 1])
            h_min, h_max = min(h_last, h), max(h_last, h)
            r = h_max / h_min
            h_d = (h_max + h_min) / 2
            den_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x = (s_next / s_cur) * x - np.expm1(-h_d) * den_d
        old_denoised = denoised
    x = np.clip(x, -1, 1)

    np.testing.assert_allclose(ours, x, rtol=1e-4, atol=1e-5)


def test_ancestral_sigma_split_parity():
    """sigma_up/down split identity: down^2 + up^2 == next^2 at eta=1."""
    from audiodiffuser_tpu.samplers.base import ancestral_sigmas

    sig = np.asarray(KarrasSchedule(0.01, 10.0, num_steps=20)(), np.float64)
    for a, b in zip(sig[:-1], sig[1:]):
        up, down = ancestral_sigmas(jnp.asarray(a), jnp.asarray(b), 1.0)
        np.testing.assert_allclose(
            float(up) ** 2 + float(down) ** 2, b**2, rtol=1e-5
        )
        # eta=1, karras grid: up = next*sqrt(1 - (next/cur)^2) when < next
        expect_up = min(b, (b**2 * (a**2 - b**2) / a**2) ** 0.5)
        np.testing.assert_allclose(float(up), expect_up, rtol=1e-5)
