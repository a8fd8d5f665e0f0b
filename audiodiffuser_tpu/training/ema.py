"""EMA subsystem: power-function EMA (EDM2) and traditional half-life EMA as
pure pytree transforms, plus the post-hoc EMA reconstruction solver.

Capability parity with the reference ``src/models/phema.py``:
exp_to_std (:19-33), std_to_exp, power_function_response (:39-48),
power_function_correlation (:54-62), power_function_beta (:68-70),
solve_posthoc_coefficients (:76-85), PowerFunctionEMA (:90-123),
TraditionalEMA (:126-163) — and the snapshot machinery in
``diffunet_complex_module.py:156-167``.

Design: instead of deep-copied module objects mutated in place, EMA state is
a pytree of parameters updated functionally inside the jitted train step
(no host sync, donation-friendly); snapshots are orbax checkpoints of those
pytrees rather than fp16 pickles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any


# -----------------------------------------------------------------------------
# power-function EMA math (numpy, float64 — host-side solver)
# -----------------------------------------------------------------------------


def exp_to_std(exp) -> np.ndarray:
    """Power-function exponent -> relative std (EDM2 eq. 123)."""
    exp = np.float64(exp)
    return np.sqrt((exp + 1) / (exp + 2) ** 2 / (exp + 3))


def std_to_exp(std) -> np.ndarray:
    """Relative std -> exponent via the real root of the cubic (EDM2 eq. 126)."""
    std = np.float64(std)
    tmp = std.flatten() ** -2
    exp = [np.roots([1, 7, 16 - t, 12 - t]).real.max() for t in tmp]
    return np.float64(exp).reshape(std.shape)


def power_function_response(ofs, std, length, axis=0) -> np.ndarray:
    """Normalized impulse response of the EMA profile (EDM2 eqs. 121/108)."""
    ofs, std = np.broadcast_arrays(ofs, std)
    ofs = np.stack([np.float64(ofs)], axis=axis)
    exp = np.stack([std_to_exp(std)], axis=axis)
    s = [1] * exp.ndim
    s[axis] = -1
    t = np.arange(length).reshape(s)
    resp = np.where(t <= ofs, (t / ofs) ** exp, 0) / ofs * (exp + 1)
    return resp / np.sum(resp, axis=axis, keepdims=True)


def power_function_correlation(a_ofs, a_std, b_ofs, b_std) -> np.ndarray:
    """Inner products between EMA profiles (EDM2 eq. 151 / Algorithm 3)."""
    a_exp = std_to_exp(a_std)
    b_exp = std_to_exp(b_std)
    t_ratio = a_ofs / b_ofs
    t_exp = np.where(a_ofs < b_ofs, b_exp, -a_exp)
    t_max = np.maximum(a_ofs, b_ofs)
    num = (a_exp + 1) * (b_exp + 1) * t_ratio**t_exp
    den = (a_exp + b_exp + 1) * t_max
    return num / den


def power_function_beta(std, t_next, t_delta):
    """Per-step EMA decay for tracking a profile (EDM2 eq. 127)."""
    return (1 - t_delta / t_next) ** (std_to_exp(std) + 1)


def solve_posthoc_coefficients(in_ofs, in_std, out_ofs, out_std) -> np.ndarray:
    """Least-squares mixing weights [num_in, num_out] (EDM2 Algorithm 3)."""
    in_ofs, in_std = np.broadcast_arrays(in_ofs, in_std)
    out_ofs, out_std = np.broadcast_arrays(out_ofs, out_std)
    rv = lambda x: np.float64(x).reshape(-1, 1)
    cv = lambda x: np.float64(x).reshape(1, -1)
    a = power_function_correlation(rv(in_ofs), rv(in_std), cv(in_ofs), cv(in_std))
    b = power_function_correlation(rv(in_ofs), rv(in_std), cv(out_ofs), cv(out_std))
    x = np.linalg.solve(a, b)
    return x / np.sum(x, axis=0)


# -----------------------------------------------------------------------------
# EMA pytree transforms
# -----------------------------------------------------------------------------


def _lerp_trees(ema: PyTree, params: PyTree, weight) -> PyTree:
    """ema + (params - ema) * weight, elementwise over the tree."""
    return jax.tree.map(lambda e, p: e + (p - e) * weight, ema, params)


@dataclass(frozen=True)
class PowerFunctionEMA:
    """EDM2 power-function EMA over a list of relative stds.

    State: {'emas': [pytree, ...], 'stds': static config}. The ``update`` is
    pure and jit-safe (gammas are precomputed host-side per std).
    """

    stds: Tuple[float, ...] = (0.050, 0.100)

    def init(self, params: PyTree) -> Dict:
        return {"emas": [jax.tree.map(jnp.copy, params) for _ in self.stds]}

    def update(self, state: Dict, params: PyTree, cur_nitem, batch_size) -> Dict:
        gammas = [float(std_to_exp(std)) for std in self.stds]
        new_emas = []
        t_next = jnp.asarray(cur_nitem, jnp.float32)
        dt = jnp.asarray(batch_size, jnp.float32)
        for gamma, ema in zip(gammas, state["emas"]):
            beta = (1.0 - dt / t_next) ** (gamma + 1.0)
            new_emas.append(_lerp_trees(ema, params, 1.0 - beta))
        return {"emas": new_emas}

    def get(self, state: Dict) -> List[Tuple[PyTree, str]]:
        return [
            (ema, f"-{std:.3f}") for std, ema in zip(self.stds, state["emas"])
        ]


@dataclass(frozen=True)
class TraditionalEMA:
    """Half-life-in-Mimg EMA with warmup ramp (reference phema.py:126-163)."""

    halflife_Mimg: float = float("inf")
    rampup_ratio: float = 0.09

    def init(self, params: PyTree) -> Dict:
        return {"emas": [jax.tree.map(jnp.copy, params)]}

    def update(self, state: Dict, params: PyTree, cur_nitem, batch_size) -> Dict:
        halflife = self.halflife_Mimg
        cur = jnp.asarray(cur_nitem, jnp.float32)
        if self.rampup_ratio is not None:
            halflife = jnp.minimum(halflife, cur / 1e6 * self.rampup_ratio)
        beta = 0.5 ** (jnp.asarray(batch_size, jnp.float32) / jnp.maximum(halflife * 1e6, 1e-8))
        return {"emas": [_lerp_trees(state["emas"][0], params, 1.0 - beta)]}

    def get(self, state: Dict) -> List[Tuple[PyTree, str]]:
        return [(state["emas"][0], "")]


def reconstruct_posthoc(
    snapshots: Sequence[Tuple[int, float, PyTree]],
    out_stds: Sequence[float],
    out_step: int | None = None,
) -> List[Tuple[float, PyTree]]:
    """Combine EMA snapshots into post-hoc profiles.

    snapshots: list of (step, std, params-pytree); out_step defaults to the
    largest input step. Returns [(out_std, mixed-pytree), ...].
    """
    in_ofs = np.array([s for s, _, _ in snapshots], dtype=np.float64)
    in_std = np.array([std for _, std, _ in snapshots], dtype=np.float64)
    out_step = out_step or int(in_ofs.max())
    coefs = solve_posthoc_coefficients(
        in_ofs, in_std, np.full(len(out_stds), out_step, np.float64), np.array(out_stds)
    )  # [num_in, num_out]

    outs = []
    for j, std in enumerate(out_stds):
        acc = None
        for i, (_, _, tree) in enumerate(snapshots):
            w = float(coefs[i, j])
            scaled = jax.tree.map(lambda p: np.asarray(p, np.float64) * w, tree)
            acc = scaled if acc is None else jax.tree.map(np.add, acc, scaled)
        acc = jax.tree.map(lambda p: p.astype(np.float32), acc)
        outs.append((std, acc))
    return outs
