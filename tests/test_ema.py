"""EMA subsystem tests: power-function math golden checks, pytree transforms,
post-hoc reconstruction consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.training.ema import (
    PowerFunctionEMA,
    TraditionalEMA,
    exp_to_std,
    power_function_beta,
    power_function_correlation,
    reconstruct_posthoc,
    solve_posthoc_coefficients,
    std_to_exp,
)


def test_std_exp_roundtrip():
    stds = np.array([0.05, 0.1, 0.15, 0.2])
    exps = std_to_exp(stds)
    np.testing.assert_allclose(exp_to_std(exps), stds, rtol=1e-10)
    # known value: std 0.05 -> gamma ~= 16.97 (reference models/utils.py:107)
    np.testing.assert_allclose(std_to_exp(np.array([0.05])), [16.97], atol=0.01)
    np.testing.assert_allclose(std_to_exp(np.array([0.10])), [6.94], atol=0.01)


def test_power_function_beta_monotone():
    b1 = power_function_beta(0.05, t_next=10000, t_delta=32)
    b2 = power_function_beta(0.10, t_next=10000, t_delta=32)
    assert 0 < b1 < b2 < 1  # longer profile (larger std) -> slower update


def test_correlation_symmetric_normalized():
    c = power_function_correlation(1000.0, 0.05, 1000.0, 0.05)
    c12 = power_function_correlation(1000.0, 0.05, 2000.0, 0.1)
    c21 = power_function_correlation(2000.0, 0.1, 1000.0, 0.05)
    np.testing.assert_allclose(c12, c21, rtol=1e-12)
    assert c > c12  # self-correlation dominates


def test_posthoc_coefficients_columns_sum_to_one():
    steps = np.array([1000.0, 2000.0, 3000.0, 4000.0] * 2)
    stds = np.array([0.05] * 4 + [0.1] * 4)
    x = solve_posthoc_coefficients(steps, stds, np.array([4000.0]), np.array([0.15]))
    np.testing.assert_allclose(x.sum(axis=0), 1.0, rtol=1e-10)


def test_posthoc_recovers_tracked_profile():
    """Reconstructing an *input* profile at the last step should weight that
    snapshot's profile dominantly."""
    steps = np.array([1000.0, 2000.0, 3000.0, 4000.0])
    stds = np.array([0.05] * 4)
    x = solve_posthoc_coefficients(steps, stds, np.array([4000.0]), np.array([0.05]))
    # last snapshot IS the target profile
    np.testing.assert_allclose(x[:, 0], [0, 0, 0, 1.0], atol=1e-8)


def test_power_function_ema_tracks_constant():
    ema = PowerFunctionEMA(stds=(0.05, 0.10))
    params = {"w": jnp.zeros(4)}
    state = ema.init(params)
    target = {"w": jnp.ones(4)}
    # start deep into training so betas are close to 1 (no saturation)
    nitem = 1_000_000
    for _ in range(50):
        nitem += 32
        state = ema.update(state, target, nitem, 32)
    for (tree, suffix), std in zip(ema.get(state), ema.stds):
        w = np.asarray(tree["w"])
        assert 0.0 < w.mean() < 1.0, (suffix, w.mean())
    # smaller rel-std -> larger exponent -> heavier weight on recent params
    w_005 = np.asarray(state["emas"][0]["w"]).mean()
    w_010 = np.asarray(state["emas"][1]["w"]).mean()
    assert w_005 > w_010


def test_traditional_ema_update():
    ema = TraditionalEMA(halflife_Mimg=0.001, rampup_ratio=None)
    params = {"w": jnp.zeros(2)}
    state = ema.init(params)
    target = {"w": jnp.ones(2)}
    for i in range(100):
        state = ema.update(state, target, (i + 1) * 32, 32)
    assert float(state["emas"][0]["w"].mean()) > 0.5


def test_reconstruct_posthoc_pytrees():
    # synthetic snapshots: params = step * scale, single profile
    snaps = [
        (1000, 0.05, {"w": np.full(3, 1.0, np.float32)}),
        (2000, 0.05, {"w": np.full(3, 2.0, np.float32)}),
        (3000, 0.05, {"w": np.full(3, 3.0, np.float32)}),
        (4000, 0.05, {"w": np.full(3, 4.0, np.float32)}),
    ]
    outs = reconstruct_posthoc(snaps, [0.05])
    (std, tree), = outs
    # reconstructing the tracked profile at the last step = last snapshot
    np.testing.assert_allclose(tree["w"], 4.0, atol=1e-5)
