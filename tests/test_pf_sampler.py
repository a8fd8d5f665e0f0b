"""PFDiffSampler correctness: analytic-oracle convergence, NFE-matched
accuracy advantage over Euler, and 2nd-order behaviour of the trapezoid
update (one evaluation per step).

Oracle: for data x0 ~ N(mu, s^2 I) the exact EDM denoiser is
D(x; sigma) = (sigma^2 mu + s^2 x) / (s^2 + sigma^2) and the PF-ODE endpoint
at sigma=0 is mu + (x(sigma_0) - mu) * s / sqrt(s^2 + sigma_0^2)
(same harness as tests/test_samplers.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.ops import KarrasSchedule
from audiodiffuser_tpu.samplers import edm as edm_s
from audiodiffuser_tpu.samplers.pf import PFDiffSampler

MU = 0.25
S = 0.4
SHAPE = (8, 4)


def edm_oracle(x, sigma=None, cond_scale=1.0):
    sig = jnp.asarray(sigma)
    sig = sig.reshape((-1,) + (1,) * (x.ndim - 1)) if sig.ndim > 0 else sig
    return (sig**2 * MU + S**2 * x) / (S**2 + sig**2)


NOISE = jax.random.normal(jax.random.key(42), SHAPE)


def target0(sigmas):
    x0 = sigmas[0] * NOISE
    return np.asarray(
        MU + (x0 - MU) * S / np.sqrt(S**2 + float(sigmas[0]) ** 2)
    )


def grid(n):
    return KarrasSchedule(sigma_min=0.002, sigma_max=20.0, rho=7.0, num_steps=n)()


def err(out, sigmas):
    return float(np.max(np.abs(np.asarray(out) - target0(sigmas))))


def test_pf_converges():
    sigmas = grid(64)
    out = PFDiffSampler(num_steps=64)(NOISE, edm_oracle, sigmas)
    np.testing.assert_allclose(np.asarray(out), target0(sigmas), atol=4e-3)


def test_pf_beats_euler_at_equal_nfe():
    """Both spend exactly n model evaluations; PF should be far closer.
    (Below ~16 steps the Karras grid is too coarse for the past slope to
    predict across the huge first steps — measured n=16: 0.046 vs 0.109,
    n=32: 0.011 vs 0.055, n=64: 0.0026 vs 0.027.)"""
    for n in (16, 32, 64):
        sigmas = grid(n)
        e_euler = err(
            edm_s.EDMSampler(s_churn=0.0, num_steps=n, use_heun=False)(
                NOISE, edm_oracle, sigmas, key=jax.random.key(0)
            ),
            sigmas,
        )
        e_pf = err(PFDiffSampler(num_steps=n)(NOISE, edm_oracle, sigmas), sigmas)
        assert e_pf < 0.5 * e_euler, (n, e_pf, e_euler)


def test_pf_matches_heun_at_half_nfe():
    """PF at n NFE should be in the accuracy class of Heun at ~2n NFE
    (both are 2nd-order; Heun pays 2 evaluations per step)."""
    n = 24
    sigmas_pf = grid(n)
    e_pf = err(PFDiffSampler(num_steps=n)(NOISE, edm_oracle, sigmas_pf), sigmas_pf)
    sigmas_h = grid(n)
    e_heun = err(
        edm_s.EDMSampler(s_churn=0.0, num_steps=n, use_heun=True)(
            NOISE, edm_oracle, sigmas_h, key=jax.random.key(0)
        ),
        sigmas_h,
    )
    # Heun at the same num_steps spends ~2x the NFE; PF stays within 4x of
    # its error while paying half the evaluations
    assert e_pf < 4.0 * e_heun + 1e-6, (e_pf, e_heun)


def test_pf_trapezoid_second_order():
    """Doubling the step count should cut the trapezoid error ~4x (order 2);
    the lookahead variant is ~order 1 in the step tail."""
    errs = []
    for n in (16, 32, 64):
        sigmas = grid(n)
        errs.append(err(PFDiffSampler(num_steps=n)(NOISE, edm_oracle, sigmas), sigmas))
    # geometric error reduction at least ~3x per doubling on this smooth ODE
    assert errs[1] < errs[0] / 2.5, errs
    assert errs[2] < errs[1] / 2.5, errs


def test_pf_lookahead_variant_runs():
    sigmas = grid(32)
    out = PFDiffSampler(num_steps=32, trapezoid=False)(NOISE, edm_oracle, sigmas)
    assert np.isfinite(np.asarray(out)).all()
    assert err(out, sigmas) < 0.1


def test_pf_under_jit_and_cond_scale_passthrough():
    calls = []

    def spy_fn(x, sigma=None, cond_scale=1.0):
        calls.append(float(cond_scale))
        return edm_oracle(x, sigma=sigma)

    sigmas = grid(8)
    s = PFDiffSampler(num_steps=8, cond_scale=3.0)
    out = jax.jit(lambda z: s(z, spy_fn, sigmas))(NOISE)
    assert np.isfinite(np.asarray(out)).all()
    assert all(c == 3.0 for c in calls)
