"""Generic exponential-integrator solver core (DPM-Solver 1/2/3 single- and
multistep, and UniPC predictor-corrector) over an abstract half-logSNR space.

The reference implements three near-identical copies of these solvers — for
EDM x0/eps nets (``sampler_edm.py:495-805,807-1053``), v-objective nets
(``sampler_vobj.py:196-499,502-732``) and rectified-flow nets
(``sampler_rf.py:147-390,392-586``). They differ only in the geometry
(alpha(lam), sigma(lam)), a lambda rescaling (the v-objective code works in
logSNR = 2*lambda, so its phi functions take h/2), and the model wrapper
(x0/eps/velocity conversion). Here the solver mathematics is written once,
parameterized by:

- ``lams``: the per-step grid of lambda values (any spacing),
- ``Space``: callables sigma(lam), alpha(lam) and the ``h_scale`` factor,
- ``model_fn(x, lam) -> m``: the family/prediction-specific model wrapper.

All step loops are ``lax.scan`` over the uniform interior with the
(statically known) warm-up and tail steps peeled out, so compiled NFE matches
the reference Python loops exactly and nothing syncs with the host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclass(frozen=True)
class Space:
    """Geometry of the solver's lambda space."""

    sig_of_lam: Callable[[jnp.ndarray], jnp.ndarray]
    alpha_of_lam: Callable[[jnp.ndarray], jnp.ndarray]
    h_scale: float = 1.0


def edm_space() -> Space:
    """EDM convention: alpha = 1, sigma = exp(-lambda)."""
    return Space(
        sig_of_lam=lambda lam: jnp.exp(-lam),
        alpha_of_lam=lambda lam: jnp.ones_like(lam),
        h_scale=1.0,
    )


def vobj_space() -> Space:
    """v-objective convention: lambda is logSNR, so alpha = sqrt(sigmoid(lam)),
    sigma = sqrt(sigmoid(-lam)), and solver phis take h/2."""
    return Space(
        sig_of_lam=lambda lam: jnp.sqrt(jax.nn.sigmoid(-lam)),
        alpha_of_lam=lambda lam: jnp.sqrt(jax.nn.sigmoid(lam)),
        h_scale=0.5,
    )


def rf_space() -> Space:
    """Rectified-flow solvers treat the incoming grid values directly as sigma
    with lambda = -log(sigma); alpha = 1."""
    return edm_space()


# -----------------------------------------------------------------------------
# single-step DPM-Solver 1/2/3
# -----------------------------------------------------------------------------


def singlestep_orders(order: int, num_steps: int) -> List[int]:
    """DPM-Solver-fast order schedule (reference sampler_edm.py:771-789)."""
    if order == 3:
        k = num_steps // 3 + 1
        if num_steps % 3 == 0:
            return [3] * (k - 2) + [2, 1]
        return [3] * (k - 1) + [num_steps % 3]
    if order == 2:
        if num_steps % 2 == 0:
            return [2] * (num_steps // 2)
        return [2] * (num_steps // 2) + [1]
    if order == 1:
        return [1] * num_steps
    raise ValueError("order must be 1, 2 or 3")


def _dpm_single_step(
    x: jnp.ndarray,
    lam_cur: jnp.ndarray,
    lam_next: jnp.ndarray,
    step_order: int,
    model_fn: ModelFn,
    space: Space,
    x0_pred: bool,
) -> jnp.ndarray:
    """One single-step update of the given order (k model evaluations)."""
    sig, alp, scale = space.sig_of_lam, space.alpha_of_lam, space.h_scale
    h_raw = lam_next - lam_cur
    hs = h_raw * scale
    eps = model_fn(x, lam_cur)

    if step_order == 1:
        if x0_pred:
            return sig(lam_next) / sig(lam_cur) * x - alp(lam_next) * jnp.expm1(-hs) * eps
        return alp(lam_next) / alp(lam_cur) * x - sig(lam_next) * jnp.expm1(hs) * eps

    if step_order == 2:
        r1 = 0.5
        s1 = lam_cur + r1 * h_raw
        if x0_pred:
            u1 = sig(s1) / sig(lam_cur) * x - alp(s1) * jnp.expm1(-r1 * hs) * eps
            eps_r1 = model_fn(u1, s1)
            return (
                sig(lam_next) / sig(lam_cur) * x
                - alp(lam_next) * jnp.expm1(-hs) * eps
                - alp(lam_next) / (2 * r1) * jnp.expm1(-hs) * (eps_r1 - eps)
            )
        u1 = alp(s1) / alp(lam_cur) * x - sig(s1) * jnp.expm1(r1 * hs) * eps
        eps_r1 = model_fn(u1, s1)
        return (
            alp(lam_next) / alp(lam_cur) * x
            - sig(lam_next) * jnp.expm1(hs) * eps
            - sig(lam_next) / (2 * r1) * jnp.expm1(hs) * (eps_r1 - eps)
        )

    # order 3
    r1, r2 = 1.0 / 3.0, 2.0 / 3.0
    s1 = lam_cur + r1 * h_raw
    s2 = lam_cur + r2 * h_raw
    if x0_pred:
        u1 = sig(s1) / sig(lam_cur) * x - alp(s1) * jnp.expm1(-r1 * hs) * eps
        eps_r1 = model_fn(u1, s1)
        u2 = (
            sig(s2) / sig(lam_cur) * x
            - alp(s2) * jnp.expm1(-r2 * hs) * eps
            + alp(s2) * (r2 / r1) * (jnp.expm1(-r2 * hs) / (r2 * hs) + 1.0) * (eps_r1 - eps)
        )
        eps_r2 = model_fn(u2, s2)
        return (
            sig(lam_next) / sig(lam_cur) * x
            - alp(lam_next) * jnp.expm1(-hs) * eps
            + alp(lam_next) / r2 * (jnp.expm1(-hs) / hs + 1.0) * (eps_r2 - eps)
        )
    u1 = alp(s1) / alp(lam_cur) * x - sig(s1) * jnp.expm1(r1 * hs) * eps
    eps_r1 = model_fn(u1, s1)
    u2 = (
        alp(s2) / alp(lam_cur) * x
        - sig(s2) * jnp.expm1(r2 * hs) * eps
        - sig(s2) * (r2 / r1) * (jnp.expm1(r2 * hs) / (r2 * hs) - 1.0) * (eps_r1 - eps)
    )
    eps_r2 = model_fn(u2, s2)
    return (
        alp(lam_next) / alp(lam_cur) * x
        - sig(lam_next) * jnp.expm1(hs) * eps
        - sig(lam_next) / r2 * (jnp.expm1(hs) / hs - 1.0) * (eps_r2 - eps)
    )


def dpm_singlestep(
    x: jnp.ndarray,
    lams: jnp.ndarray,
    orders: Sequence[int],
    model_fn: ModelFn,
    space: Space,
    x0_pred: bool,
) -> jnp.ndarray:
    """Run the single-step solver over ``lams`` with the given order schedule.

    The order schedule is a leading run of identical orders plus a short tail
    (see :func:`singlestep_orders`), so the leading run compiles as one scan
    and the tail (<= 2 steps) is peeled.
    """
    orders = list(orders)
    lead = 0
    while lead < len(orders) and orders[lead] == orders[0]:
        lead += 1

    k = orders[0]
    if lead > 1:
        def body(carry, xs):
            lam_c, lam_n = xs
            return (
                _dpm_single_step(carry, lam_c, lam_n, k, model_fn, space, x0_pred),
                None,
            )

        x, _ = jax.lax.scan(body, x, (lams[:lead], lams[1 : lead + 1]))
    else:
        for i in range(lead):
            x = _dpm_single_step(x, lams[i], lams[i + 1], k, model_fn, space, x0_pred)

    for i in range(lead, len(orders)):
        x = _dpm_single_step(x, lams[i], lams[i + 1], orders[i], model_fn, space, x0_pred)
    return x


# -----------------------------------------------------------------------------
# multistep DPM-Solver 1/2/3
# -----------------------------------------------------------------------------


def _ms_update(
    x: jnp.ndarray,
    m_buf: jnp.ndarray,  # [order, ...] newest last
    lam_buf: jnp.ndarray,  # [order]
    lam_cur: jnp.ndarray,
    step_order: int,
    space: Space,
    x0_pred: bool,
) -> jnp.ndarray:
    """Multistep update using the newest ``step_order`` history entries."""
    sig, alp, scale = space.sig_of_lam, space.alpha_of_lam, space.h_scale
    lam_p0 = lam_buf[-1]
    m0 = m_buf[-1]
    h_raw = lam_cur - lam_p0
    hs = h_raw * scale

    if x0_pred:
        lead = sig(lam_cur) / sig(lam_p0) * x
        gain = alp(lam_cur)
        phi_1 = jnp.expm1(-hs)
    else:
        lead = alp(lam_cur) / alp(lam_p0) * x
        gain = sig(lam_cur)
        phi_1 = jnp.expm1(hs)

    if step_order == 1:
        return lead - gain * phi_1 * m0

    lam_p1 = lam_buf[-2]
    m1 = m_buf[-2]
    h_0 = lam_p0 - lam_p1
    r0 = h_0 / h_raw
    d1_0 = (m0 - m1) / r0

    if step_order == 2:
        return lead - gain * phi_1 * m0 - gain * 0.5 * phi_1 * d1_0

    lam_p2 = lam_buf[-3]
    m2 = m_buf[-3]
    h_1 = lam_p1 - lam_p2
    r1 = h_1 / h_raw
    d1_1 = (m1 - m2) / r1
    d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
    d2 = (d1_0 - d1_1) / (r0 + r1)

    if x0_pred:
        phi_2 = phi_1 / hs + 1.0
        phi_3 = phi_2 / hs - 0.5
        return lead - gain * phi_1 * m0 + gain * phi_2 * d1 - gain * phi_3 * d2
    phi_2 = phi_1 / hs - 1.0
    phi_3 = phi_2 / hs - 0.5
    return lead - gain * phi_1 * m0 - gain * phi_2 * d1 - gain * phi_3 * d2


def _push(buf: jnp.ndarray, val: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([buf[1:], val[None]], axis=0)


def dpm_multistep(
    x: jnp.ndarray,
    lams: jnp.ndarray,  # [num_steps + 1]
    order: int,
    num_steps: int,
    model_fn: ModelFn,
    space: Space,
    x0_pred: bool,
) -> jnp.ndarray:
    """Multistep DPM-Solver (reference sampler_edm.py:718-768): warm-up with
    increasing order, order-k interior (one model eval per step), order
    decay over the final steps, no model eval after the last update."""
    assert num_steps >= order

    # Init: evaluate at lams[0], fill ring buffers (order slots).
    m0 = model_fn(x, lams[0])
    m_buf = jnp.stack([m0] * order)
    lam_buf = jnp.stack([lams[0]] * order)

    def history_valid(step):  # how many buffer slots hold real history
        return min(step, order)

    # Warm-up steps 1 .. order-1 (unrolled; uses step-index order).
    for step in range(1, order):
        x = _ms_update(x, m_buf, lam_buf, lams[step], step, space, x0_pred)
        m_t = model_fn(x, lams[step])
        m_buf = _push(m_buf, m_t)
        lam_buf = _push(lam_buf, lams[step])

    # Interior: steps order .. num_steps+1-order run at full order w/ eval.
    # (For order 1 that bound is num_steps, but the final step always skips
    # the model eval, so it is peeled into the tail.)
    interior_end = min(num_steps + 1 - order, num_steps - 1)  # inclusive
    lo, hi = order, interior_end
    if hi >= lo:
        def body(carry, lam_cur):
            x, m_buf, lam_buf = carry
            x = _ms_update(x, m_buf, lam_buf, lam_cur, order, space, x0_pred)
            m_t = model_fn(x, lam_cur)
            return (x, _push(m_buf, m_t), _push(lam_buf, lam_cur)), None

        (x, m_buf, lam_buf), _ = jax.lax.scan(
            body, (x, m_buf, lam_buf), lams[lo : hi + 1]
        )
        start_tail = hi + 1
    else:
        start_tail = lo

    # Tail: decaying order; final step (step == num_steps) skips the eval.
    for step in range(start_tail, num_steps + 1):
        step_order = min(order, num_steps + 1 - step)
        x = _ms_update(x, m_buf, lam_buf, lams[step], step_order, space, x0_pred)
        if step < num_steps:
            m_t = model_fn(x, lams[step])
            m_buf = _push(m_buf, m_t)
            lam_buf = _push(lam_buf, lams[step])
    return x


# -----------------------------------------------------------------------------
# UniPC predictor-corrector
# -----------------------------------------------------------------------------


def _unipc_update(
    x: jnp.ndarray,
    m_buf: jnp.ndarray,
    lam_buf: jnp.ndarray,
    lam_cur: jnp.ndarray,
    order: int,
    model_fn: ModelFn,
    space: Space,
    x0_pred: bool,
    use_corrector: bool,
    variant: str = "bh2",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One UniPC update (reference sampler_edm.py:874-992 generalized).

    Returns (x_t, model_t) where model_t is the corrector's model evaluation
    at lam_cur (None-like zeros are never returned: when use_corrector is
    False the caller must not consume model_t).
    """
    sig, alp, scale = space.sig_of_lam, space.alpha_of_lam, space.h_scale
    lam_p0 = lam_buf[-1]
    m0 = m_buf[-1]
    h_raw = lam_cur - lam_p0

    rks = []
    d1s = []
    for i in range(1, order):
        lam_pi = lam_buf[-(i + 1)]
        rk = (lam_pi - lam_p0) / h_raw
        rks.append(rk)
        d1s.append((m_buf[-(i + 1)] - m0) / rk)
    rks.append(jnp.asarray(1.0))
    rks = jnp.stack(rks)

    hh = -h_raw * scale if x0_pred else h_raw * scale
    h_phi_1 = jnp.expm1(hh)
    h_phi_k = h_phi_1 / hh - 1.0
    factorial_i = 1.0

    if variant == "bh1":
        b_h = hh
    elif variant == "bh2":
        b_h = jnp.expm1(hh)
    else:
        raise NotImplementedError(variant)

    r_rows = []
    b_vals = []
    for i in range(1, order + 1):
        r_rows.append(rks ** (i - 1))
        b_vals.append(h_phi_k * factorial_i / b_h)
        factorial_i *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / factorial_i
    r_mat = jnp.stack(r_rows)
    b_vec = jnp.stack(b_vals)

    d1s_arr = jnp.stack(d1s, axis=1) if d1s else None  # [B, K-1, ...]

    if x0_pred:
        lead = sig(lam_cur) / sig(lam_p0) * x
        gain = alp(lam_cur)
    else:
        lead = alp(lam_cur) / alp(lam_p0) * x
        gain = sig(lam_cur)
    x_t_ = lead - gain * h_phi_1 * m0

    # predictor
    if d1s_arr is not None:
        if order == 2:
            rhos_p = jnp.asarray([0.5])
        else:
            rhos_p = jnp.linalg.solve(r_mat[:-1, :-1], b_vec[:-1])
        pred_res = jnp.einsum("k,bk...->b...", rhos_p, d1s_arr)
    else:
        pred_res = 0.0
    x_t = x_t_ - gain * b_h * pred_res

    model_t = None
    if use_corrector:
        if order == 1:
            rhos_c = jnp.asarray([0.5])
        else:
            rhos_c = jnp.linalg.solve(r_mat, b_vec)
        model_t = model_fn(x_t, lam_cur)
        if d1s_arr is not None:
            corr_res = jnp.einsum("k,bk...->b...", rhos_c[:-1], d1s_arr)
        else:
            corr_res = 0.0
        d1_t = model_t - m0
        x_t = x_t_ - gain * b_h * (corr_res + rhos_c[-1] * d1_t)

    return x_t, model_t


def unipc(
    x: jnp.ndarray,
    lams: jnp.ndarray,  # [num_steps + 1]
    order: int,
    num_steps: int,
    model_fn: ModelFn,
    space: Space,
    x0_pred: bool,
    variant: str = "bh2",
) -> jnp.ndarray:
    """UniPC solver loop (reference sampler_edm.py:994-1053): warm-up with
    increasing order, full-order interior scan (the corrector's model eval is
    reused as the next history entry), decaying-order tail, corrector off on
    the final step."""
    assert num_steps >= order

    m0 = model_fn(x, lams[0])
    m_buf = jnp.stack([m0] * order)
    lam_buf = jnp.stack([lams[0]] * order)

    # Warm-up steps 1 .. order-1 with order = step.
    for step in range(1, order):
        x, m_t = _unipc_update(
            x, m_buf, lam_buf, lams[step], step, model_fn, space, x0_pred, True, variant
        )
        m_buf = _push(m_buf, m_t)
        lam_buf = _push(lam_buf, lams[step])

    # Final step always peels into the tail (corrector off there).
    interior_end = min(num_steps + 1 - order, num_steps - 1)  # inclusive
    lo, hi = order, interior_end
    if hi >= lo:
        def body(carry, lam_cur):
            x, m_buf, lam_buf = carry
            x, m_t = _unipc_update(
                x, m_buf, lam_buf, lam_cur, order, model_fn, space, x0_pred, True, variant
            )
            return (x, _push(m_buf, m_t), _push(lam_buf, lam_cur)), None

        (x, m_buf, lam_buf), _ = jax.lax.scan(
            body, (x, m_buf, lam_buf), lams[lo : hi + 1]
        )
        start_tail = hi + 1
    else:
        start_tail = lo

    for step in range(start_tail, num_steps + 1):
        step_order = min(order, num_steps + 1 - step)
        use_corrector = step < num_steps
        x, m_t = _unipc_update(
            x,
            m_buf,
            lam_buf,
            lams[step],
            step_order,
            model_fn,
            space,
            x0_pred,
            use_corrector,
            variant,
        )
        if step < num_steps:
            m_buf = _push(m_buf, m_t)
            lam_buf = _push(lam_buf, lams[step])
    return x
