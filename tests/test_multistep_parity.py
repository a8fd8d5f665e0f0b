"""Multistep DPM-Solver and UniPC trajectory parity vs independent fp64 numpy
implementations of the update rules, over a NON-uniform lambda grid
(log_time_spacing=False) — this stresses the ring buffers and the statically
peeled warm-up/tail steps of the scan engines."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.ops import KarrasSchedule
from audiodiffuser_tpu.samplers import edm as edm_s

MU, S = 0.25, 0.4
SHAPE = (3, 6)
NOISE = jax.random.normal(jax.random.key(33), SHAPE)


def oracle_np(x, sigma):
    return (sigma**2 * MU + S**2 * x) / (S**2 + sigma**2)


def oracle_jax(x, sigma=None, cond_scale=1.0):
    sig = jnp.asarray(sigma)
    sig = sig.reshape((-1,) + (1,) * (x.ndim - 1)) if sig.ndim > 0 else sig
    return (sig**2 * MU + S**2 * x) / (S**2 + sig**2)


def test_dpm_multistep_order3_nonuniform_grid_parity():
    num_steps = 13  # effective steps; exercises warm-up (2), interior, tail (2)
    sig_grid = KarrasSchedule(0.005, 15.0, rho=7.0, num_steps=num_steps + 1)()
    # non-log mode counts grid points: effective steps = num_steps - 1
    sampler = edm_s.DPMSampler(
        order=3, num_steps=num_steps + 1, multisteps=True, x0_pred=True,
        log_time_spacing=False,
    )
    ours = np.asarray(sampler(NOISE, oracle_jax, sig_grid))

    # fp64 reference: data-prediction multistep DPM-Solver over lam = -ln(sigma)
    sig = np.asarray(sig_grid, np.float64)
    lam = -np.log(sig)
    x = np.asarray(NOISE, np.float64) * sig[0]

    def model(x, l):
        return oracle_np(x, np.exp(-l))

    def update(x, m_hist, l_hist, l_cur, order):
        l0 = l_hist[-1]
        m0 = m_hist[-1]
        h = l_cur - l0
        phi1 = np.expm1(-h)
        lead = np.exp(-l_cur) / np.exp(-l0) * x
        if order == 1:
            return lead - phi1 * m0
        l1, m1 = l_hist[-2], m_hist[-2]
        r0 = (l0 - l1) / h
        d10 = (m0 - m1) / r0
        if order == 2:
            return lead - phi1 * m0 - 0.5 * phi1 * d10
        l2, m2 = l_hist[-3], m_hist[-3]
        r1 = (l1 - l2) / h
        d11 = (m1 - m2) / r1
        d1 = d10 + (r0 / (r0 + r1)) * (d10 - d11)
        d2 = (d10 - d11) / (r0 + r1)
        phi2 = phi1 / h + 1.0
        phi3 = phi2 / h - 0.5
        return lead - phi1 * m0 + phi2 * d1 - phi3 * d2

    m_hist = [model(x, lam[0])]
    l_hist = [lam[0]]
    for step in range(1, 3):  # warm-up with order=step
        x = update(x, m_hist, l_hist, lam[step], step)
        m_hist.append(model(x, lam[step]))
        l_hist.append(lam[step])
    for step in range(3, num_steps + 1):
        order = min(3, num_steps + 1 - step)
        x = update(x, m_hist, l_hist, lam[step], order)
        if step < num_steps:
            m_hist.append(model(x, lam[step]))
            l_hist.append(lam[step])
    x = np.clip(x, -1, 1)

    np.testing.assert_allclose(ours, x, rtol=1e-4, atol=1e-5)


def test_unipc_order2_nonuniform_grid_parity():
    num_steps = 11  # effective steps (non-log mode counts grid points)
    sig_grid = KarrasSchedule(0.005, 15.0, rho=7.0, num_steps=num_steps + 1)()
    sampler = edm_s.UniPCSampler(
        num_steps=num_steps + 1, order=2, x0_pred=True, log_time_spacing=False
    )
    ours = np.asarray(sampler(NOISE, oracle_jax, sig_grid))

    sig = np.asarray(sig_grid, np.float64)
    lam = -np.log(sig)
    x = np.asarray(NOISE, np.float64) * sig[0]

    def model(x, l):
        return oracle_np(x, np.exp(-l))

    def unipc_update(x, m_hist, l_hist, l_cur, order, use_corrector):
        l0, m0 = l_hist[-1], m_hist[-1]
        h = l_cur - l0
        rks, d1s = [], []
        for i in range(1, order):
            li, mi = l_hist[-(i + 1)], m_hist[-(i + 1)]
            rk = (li - l0) / h
            rks.append(rk)
            d1s.append((mi - m0) / rk)
        rks.append(1.0)
        rks = np.asarray(rks)

        hh = -h
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1.0
        fact = 1.0
        b_h = np.expm1(hh)  # bh2
        rows, bs = [], []
        for i in range(1, order + 1):
            rows.append(rks ** (i - 1))
            bs.append(h_phi_k * fact / b_h)
            fact *= i + 1
            h_phi_k = h_phi_k / hh - 1.0 / fact
        r_mat = np.stack(rows)
        b_vec = np.stack(bs)

        lead = np.exp(-l_cur) / np.exp(-l0) * x
        x_t_ = lead - h_phi_1 * m0
        if d1s:
            rhos_p = np.asarray([0.5]) if order == 2 else np.linalg.solve(
                r_mat[:-1, :-1], b_vec[:-1]
            )
            pred = sum(r * d for r, d in zip(rhos_p, d1s))
        else:
            pred = 0.0
        x_t = x_t_ - b_h * pred

        m_t = None
        if use_corrector:
            rhos_c = np.asarray([0.5]) if order == 1 else np.linalg.solve(r_mat, b_vec)
            m_t = model(x_t, l_cur)
            corr = sum(r * d for r, d in zip(rhos_c[:-1], d1s)) if d1s else 0.0
            x_t = x_t_ - b_h * (corr + rhos_c[-1] * (m_t - m0))
        return x_t, m_t

    m_hist = [model(x, lam[0])]
    l_hist = [lam[0]]
    for step in range(1, 2):  # warm-up, order=1 w/ corrector
        x, m_t = unipc_update(x, m_hist, l_hist, lam[step], step, True)
        m_hist.append(m_t)
        l_hist.append(lam[step])
    for step in range(2, num_steps + 1):
        order = min(2, num_steps + 1 - step)
        use_corr = step < num_steps
        x, m_t = unipc_update(x, m_hist, l_hist, lam[step], order, use_corr)
        if step < num_steps:
            m_hist.append(m_t)
            l_hist.append(lam[step])
    x = np.clip(x, -1, 1)

    np.testing.assert_allclose(ours, x, rtol=1e-4, atol=1e-5)
