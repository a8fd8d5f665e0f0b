"""Solver correctness tests against analytic Gaussian-data oracles.

For data x0 ~ N(mu, s^2 I) the exact EDM denoiser is the posterior mean
D(x; sigma) = (sigma^2 mu + s^2 x) / (s^2 + sigma^2), and the probability-flow
ODE has the closed-form solution

    x(sigma_end) = mu + (x(sigma_0) - mu) * sqrt(s^2 + sigma_end^2) / sqrt(s^2 + sigma_0^2).

Every deterministic x0-family solver must converge to that value; stochastic
samplers must reproduce the data distribution's moments over a batch. The
v-objective and rectified-flow families are tested with their own oracles via
cross-solver agreement against a fine-step Euler reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodiffuser_tpu.ops import KarrasSchedule
from audiodiffuser_tpu.samplers import edm as edm_s
from audiodiffuser_tpu.samplers import rf as rf_s
from audiodiffuser_tpu.samplers import stochastic as st_s
from audiodiffuser_tpu.samplers import vobj as vobj_s

MU = 0.25
S = 0.4
SHAPE = (8, 4)


def edm_oracle(x, sigma=None, cond_scale=1.0):
    sig = jnp.asarray(sigma)
    sig = sig.reshape((-1,) + (1,) * (x.ndim - 1)) if sig.ndim > 0 else sig
    return (sig**2 * MU + S**2 * x) / (S**2 + sig**2)


def analytic_end(noise, sigmas):
    x0 = sigmas[0] * noise
    return MU + (x0 - MU) * np.sqrt(S**2 + float(sigmas[-1]) ** 2) / np.sqrt(
        S**2 + float(sigmas[0]) ** 2
    )


SIGMAS_64 = KarrasSchedule(sigma_min=0.002, sigma_max=20.0, rho=7.0, num_steps=64)()
NOISE = jax.random.normal(jax.random.key(42), SHAPE)
# ODE endpoint at sigma == 0 (deterministic solvers integrate all the way down)
TARGET0 = np.asarray(MU + (SIGMAS_64[0] * NOISE - MU) * S / np.sqrt(S**2 + float(SIGMAS_64[0]) ** 2))
# endpoint at sigma_min (solvers that stop at the last grid value)
TARGET_MIN = np.asarray(analytic_end(NOISE, SIGMAS_64))


def test_edm_sampler_deterministic_converges():
    s = edm_s.EDMSampler(s_churn=0.0, num_steps=64, use_heun=True)
    out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64, key=jax.random.key(0)))
    np.testing.assert_allclose(out, TARGET0, atol=2e-3)


def test_edm_sampler_euler_less_accurate_than_heun():
    heun = edm_s.EDMSampler(s_churn=0.0, num_steps=64, use_heun=True)
    euler = edm_s.EDMSampler(s_churn=0.0, num_steps=64, use_heun=False)
    e_h = np.abs(np.asarray(heun(NOISE, edm_oracle, SIGMAS_64)) - TARGET0).max()
    e_e = np.abs(np.asarray(euler(NOISE, edm_oracle, SIGMAS_64)) - TARGET0).max()
    assert e_h < e_e


def test_edm_alpha_sampler_converges():
    s = edm_s.EDMAlphaSampler(alpha=1.0, num_steps=64, use_heun=True)
    out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64))
    np.testing.assert_allclose(out, TARGET_MIN, atol=2e-3)


def test_dpm2_sampler_converges():
    s = edm_s.DPM2Sampler(num_steps=64, s_churn=0.0)
    out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64))
    np.testing.assert_allclose(out, np.clip(TARGET_MIN, -1, 1), atol=2e-3)


# order-1 solvers carry O(h) global error on this stiff oracle; higher
# orders shrink it — the rate test below is the strict correctness check.
ORDER_TOL = {1: 0.08, 2: 0.04, 3: 0.02}


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("multi", [False, True])
@pytest.mark.parametrize("x0_pred", [False, True])
def test_dpm_sampler_all_modes_converge(order, multi, x0_pred):
    s = edm_s.DPMSampler(
        cond_scale=1.0, order=order, num_steps=40, multisteps=multi, x0_pred=x0_pred
    )
    out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64))
    np.testing.assert_allclose(out, np.clip(TARGET_MIN, -1, 1), atol=ORDER_TOL[order])


@pytest.mark.parametrize("multi", [False, True])
@pytest.mark.parametrize("x0_pred", [False, True])
def test_dpm_sampler_refinement(multi, x0_pred):
    """Halving the step size must shrink the error (solver consistency)."""
    errs = []
    for n in (20, 80):
        s = edm_s.DPMSampler(order=2, num_steps=n, multisteps=multi, x0_pred=x0_pred)
        out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64))
        errs.append(np.abs(out - np.clip(TARGET_MIN, -1, 1)).max())
    assert errs[1] < errs[0] / 2.5


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("x0_pred", [False, True])
def test_unipc_sampler_converges(order, x0_pred):
    s = edm_s.UniPCSampler(num_steps=40, order=order, x0_pred=x0_pred)
    out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64))
    np.testing.assert_allclose(out, np.clip(TARGET_MIN, -1, 1), atol=ORDER_TOL[order])


def test_unipc_refinement():
    errs = []
    for n in (20, 80):
        s = edm_s.UniPCSampler(num_steps=n, order=2)
        out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64))
        errs.append(np.abs(out - np.clip(TARGET_MIN, -1, 1)).max())
    assert errs[1] < errs[0] / 2.5


def test_dpm_multistep_order_improves_accuracy():
    errs = []
    for order in [1, 2, 3]:
        s = edm_s.DPMSampler(order=order, num_steps=12, multisteps=True)
        out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64))
        errs.append(np.abs(out - np.clip(TARGET_MIN, -1, 1)).max())
    assert errs[2] < errs[0]


def test_dpm2m_sampler_converges():
    # needs num_steps+1 grid entries
    s = edm_s.DPM2MSampler(num_steps=63)
    out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64))
    np.testing.assert_allclose(out, np.clip(TARGET_MIN, -1, 1), atol=0.08)
    # refinement check
    sig_fine = KarrasSchedule(sigma_min=0.002, sigma_max=20.0, rho=7.0, num_steps=256)()
    s_fine = edm_s.DPM2MSampler(num_steps=255)
    out_f = np.asarray(s_fine(NOISE, edm_oracle, sig_fine))
    target_f = np.clip(np.asarray(analytic_end(NOISE, sig_fine)), -1, 1)
    err_c = np.abs(out - np.clip(TARGET_MIN, -1, 1)).max()
    err_f = np.abs(out_f - target_f).max()
    assert err_f < err_c / 3


def test_lms_sampler_converges():
    s = edm_s.LMSSampler(num_steps=64, order=4)
    out = np.asarray(s(NOISE, edm_oracle, SIGMAS_64))
    np.testing.assert_allclose(out, np.clip(TARGET_MIN, -1, 1), atol=3e-3)


def test_ve_vp_samplers_run_and_land_near_data():
    # VE integrates in t = sigma^2 time and is the least accurate EDM variant
    ve = edm_s.VESampler(s_churn=0.0, num_steps=64, use_heun=True)
    out = np.asarray(ve(NOISE, edm_oracle, SIGMAS_64, key=jax.random.key(1)))
    np.testing.assert_allclose(out, np.clip(TARGET0, -1, 1), atol=0.05)

    # VP sampler works on a t-grid derived from its own sigma mapping
    vp = edm_s.VPSampler(s_churn=0.0, num_steps=32, use_heun=True)
    t_grid = jnp.linspace(1.0, 1e-3, 32)
    vp_sigmas = vp.t_to_sigma(t_grid)
    outv = np.asarray(vp(NOISE, edm_oracle, vp_sigmas, key=jax.random.key(2)))
    assert np.isfinite(outv).all()
    # endpoint sigma ~ 0 => samples should be near the data manifold
    assert np.abs(outv.mean() - MU) < 0.2


def test_stochastic_samplers_match_data_moments():
    # Large batch: ancestral sampling from the exact denoiser reproduces N(MU, S^2)
    noise = jax.random.normal(jax.random.key(7), (512, 8))
    sig = KarrasSchedule(sigma_min=0.002, sigma_max=20.0, rho=7.0, num_steps=48)()
    for s in [
        st_s.ADPM2Sampler(num_steps=48),
        st_s.ADPMPP2SSampler(num_steps=48),
        st_s.DPMPPSDESampler(num_steps=48),
    ]:
        out = np.asarray(s(noise, edm_oracle, sig, key=jax.random.key(3)))
        assert abs(out.mean() - MU) < 0.03, type(s).__name__
        assert abs(out.std() - S) < 0.05, type(s).__name__


def test_stochastic_reproducible_and_key_sensitive():
    s = st_s.ADPM2Sampler(num_steps=16)
    sig = KarrasSchedule(sigma_min=0.01, sigma_max=10.0, num_steps=16)()
    a = np.asarray(s(NOISE, edm_oracle, sig, key=jax.random.key(0)))
    b = np.asarray(s(NOISE, edm_oracle, sig, key=jax.random.key(0)))
    c = np.asarray(s(NOISE, edm_oracle, sig, key=jax.random.key(1)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6


def test_edm_churn_matches_moments():
    # with churn, EDM sampler is stochastic: check moments over a batch
    noise = jax.random.normal(jax.random.key(9), (512, 8))
    sig = KarrasSchedule(sigma_min=0.002, sigma_max=20.0, rho=7.0, num_steps=48)()
    s = edm_s.EDMSampler(s_churn=40.0, s_noise=1.0, num_steps=48, use_heun=True)
    out = np.asarray(s(noise, edm_oracle, sig, key=jax.random.key(4)))
    assert abs(out.mean() - MU) < 0.03
    assert abs(out.std() - S) < 0.05


# -----------------------------------------------------------------------------
# v-objective family
# -----------------------------------------------------------------------------


def vobj_oracle(x, sigma=None, cond_scale=1.0):
    """Exact v-predictor for Gaussian data; `sigma` is the logSNR."""
    lam = jnp.asarray(sigma)
    lam = lam.reshape((-1,) + (1,) * (x.ndim - 1)) if lam.ndim > 0 else lam
    alpha = jnp.sqrt(jax.nn.sigmoid(lam))
    sig = jnp.sqrt(jax.nn.sigmoid(-lam))
    x0_hat = (alpha * S**2 * x + sig**2 * MU) / (alpha**2 * S**2 + sig**2)
    return (alpha * x - x0_hat) / sig


T_GRID = jnp.linspace(1.0, 0.0, 65)[:-1]  # t-grid; samplers append t=0


def test_veuler_vs_vsampler_reference():
    fine = vobj_s.VEulerSampler(num_steps=256, use_heun=True, shift=0.0)
    t_fine = jnp.linspace(1.0, 0.0, 257)[:-1]
    ref = np.asarray(fine(NOISE, vobj_oracle, t_fine))

    coarse = vobj_s.VEulerSampler(num_steps=64, use_heun=True, shift=0.0)
    out = np.asarray(coarse(NOISE, vobj_oracle, T_GRID))
    np.testing.assert_allclose(out, ref, atol=2e-2)


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("multi", [False, True])
def test_vobj_dpm_agrees_with_euler(order, multi):
    fine = vobj_s.VEulerSampler(num_steps=512, use_heun=True, shift=0.0)
    t_fine = jnp.linspace(1.0, 0.0, 513)[:-1]
    ref = np.asarray(fine(NOISE, vobj_oracle, t_fine))

    s = vobj_s.DPMSampler(order=order, num_steps=48, multisteps=multi, x0_pred=True)
    out = np.asarray(s(NOISE, vobj_oracle, T_GRID))
    np.testing.assert_allclose(out, ref, atol=ORDER_TOL[order])


@pytest.mark.parametrize("order", [1, 2])
def test_vobj_unipc_agrees_with_euler(order):
    fine = vobj_s.VEulerSampler(num_steps=512, use_heun=True, shift=0.0)
    t_fine = jnp.linspace(1.0, 0.0, 513)[:-1]
    ref = np.asarray(fine(NOISE, vobj_oracle, t_fine))

    s = vobj_s.UniPCSampler(order=order, num_steps=48, x0_pred=True)
    out = np.asarray(s(NOISE, vobj_oracle, T_GRID))
    np.testing.assert_allclose(out, ref, atol=3e-2)


def test_vsampler_moments():
    noise = jax.random.normal(jax.random.key(11), (512, 8))
    t = jnp.linspace(1.0, 0.0, 129)[:-1]
    s = vobj_s.VSampler(num_steps=128, shift=0.0)
    out = np.asarray(s(noise, vobj_oracle, t, key=jax.random.key(5)))
    assert abs(out.mean() - MU) < 0.03
    assert abs(out.std() - S) < 0.05


# -----------------------------------------------------------------------------
# rectified flow family
# -----------------------------------------------------------------------------


def rf_oracle(x, sigma=None, cond_scale=1.0):
    """Exact velocity field E[z1 - x0 | z_t] for Gaussian data.

    The rf samplers integrate over the t-grid directly (state z_t, velocity
    conditioning t)."""
    t = jnp.asarray(sigma)
    t = t.reshape((-1,) + (1,) * (x.ndim - 1)) if t.ndim > 0 else t
    var = (1 - t) ** 2 * S**2 + t**2
    resid = x - (1 - t) * MU
    x0_hat = MU + (1 - t) * S**2 / var * resid
    z1_hat = t / var * resid
    return z1_hat - x0_hat


RF_T = jnp.linspace(1.0, 0.0, 65)
RF_T_FINE = jnp.linspace(1.0, 0.0, 513)


def _rf_reference():
    fine = rf_s.ReflowEulerSampler(num_steps=512, use_heun=True)
    return np.asarray(fine(NOISE, rf_oracle, RF_T_FINE))


def test_reflow_euler_converges():
    ref = _rf_reference()
    # distribution check: samples from N(MU, S^2) transported from z1 = NOISE
    assert np.isfinite(ref).all()
    s = rf_s.ReflowEulerSampler(num_steps=64, use_heun=True)
    out = np.asarray(s(NOISE, rf_oracle, RF_T))
    np.testing.assert_allclose(out, ref, atol=2e-2)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_rf_dpm_multistep_agrees(order):
    ref = _rf_reference()
    s = rf_s.DPMSampler(order=order, num_steps=64, multisteps=True)
    out = np.asarray(s(NOISE, rf_oracle, RF_T))
    np.testing.assert_allclose(out, ref, atol=ORDER_TOL[order])


def test_rf_dpm2m_sana():
    ref = _rf_reference()
    s = rf_s.DPM2MSANASampler(num_steps=64, time_shift=1.0)
    out = np.asarray(s(NOISE, rf_oracle, RF_T))
    np.testing.assert_allclose(out, ref, atol=5e-2)


def test_rf_unipc_agrees():
    ref = _rf_reference()
    s = rf_s.UniPCSampler(order=2, num_steps=64)
    out = np.asarray(s(NOISE, rf_oracle, RF_T))
    np.testing.assert_allclose(out, ref, atol=4e-2)


def test_samplers_jit_compatible():
    """Whole sampler call (closing over concrete sigmas) must jit cleanly."""
    s = edm_s.DPMSampler(order=3, num_steps=24, multisteps=True)
    sig = KarrasSchedule(sigma_min=0.002, sigma_max=20.0, num_steps=24)()
    f = jax.jit(lambda n: s(n, edm_oracle, sig))
    out = np.asarray(f(NOISE))
    assert np.isfinite(out).all()


def test_lms_sampler_under_jit_with_closed_over_sigmas():
    """LMS precomputes host-side coefficients; it must trace cleanly when the
    sigma grid is a concrete closure constant (how the task layer jits it)."""
    s = edm_s.LMSSampler(num_steps=16, order=4)
    sig = KarrasSchedule(sigma_min=0.01, sigma_max=10.0, num_steps=16)()
    f = jax.jit(lambda n: s(n, edm_oracle, sig))
    out = np.asarray(f(NOISE))
    assert np.isfinite(out).all()


def test_brownian_bridge_correlation_structure():
    """BrownianBridgeNoise.pair: unit marginals and cov(n1, n2) =
    sqrt(|t1-t0| / |t2-t0|) (the torchsde-tree correlation it replaces)."""
    from audiodiffuser_tpu.samplers.base import BrownianBridgeNoise

    n = 200_000
    bridge = BrownianBridgeNoise(jax.random.key(0), (n,))
    t0, t1, t2 = 1.0, 0.7, 0.2  # decreasing sigma interval with midpoint t1
    n1, n2 = bridge.pair(3, t0, t1, t2)
    n1, n2 = np.asarray(n1), np.asarray(n2)
    assert abs(n1.std() - 1) < 0.01 and abs(n2.std() - 1) < 0.01
    expect_corr = np.sqrt(abs(t1 - t0) / abs(t2 - t0))
    got_corr = np.corrcoef(n1, n2)[0, 1]
    assert abs(got_corr - expect_corr) < 0.02
