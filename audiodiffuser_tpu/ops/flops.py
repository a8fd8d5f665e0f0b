"""Analytic FLOP counting by walking a function's jaxpr.

Counts multiply-accumulate work (2 * MACs) of ``dot_general`` and
``conv_general_dilated`` equations, recursing into pjit/scan/while/cond
subjaxprs (scan multiplies by trip count). Used by the model summary and by
``bench.py`` to derive the reference-hardware baseline estimate — the
device's own ``cost_analysis`` is unreliable on experimental backends.
"""

from __future__ import annotations

import jax


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _conv_flops(eqn) -> float:
    out_aval = eqn.outvars[0].aval
    lhs_aval = eqn.invars[0].aval
    rhs_aval = eqn.invars[1].aval  # kernel
    dn = eqn.params["dimension_numbers"]
    feature_group_count = eqn.params.get("feature_group_count", 1)
    batch_group_count = eqn.params.get("batch_group_count", 1)
    kernel_shape = rhs_aval.shape
    # kernel spatial dims are everything except in/out feature dims
    kin = kernel_shape[dn.rhs_spec[1]]
    spatial = [kernel_shape[i] for i in dn.rhs_spec[2:]]
    out_elems = _prod(out_aval.shape)
    return 2.0 * out_elems * kin * _prod(spatial) / max(batch_group_count, 1)


def _dot_flops(eqn) -> float:
    lhs = eqn.invars[0].aval
    rhs = eqn.invars[1].aval
    (lhs_contract, rhs_contract), (lhs_batch, _) = eqn.params["dimension_numbers"]
    contract = _prod([lhs.shape[i] for i in lhs_contract])
    batch = _prod([lhs.shape[i] for i in lhs_batch])
    lhs_free = _prod(lhs.shape) // max(contract * batch, 1)
    rhs_free = _prod(rhs.shape) // max(contract * batch, 1)
    return 2.0 * batch * lhs_free * rhs_free * contract


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "scan":
            inner = _jaxpr_flops(eqn.params["jaxpr"].jaxpr)
            total += inner * int(eqn.params["length"])
        elif name == "while":
            # trip count unknown statically; count one iteration
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(_jaxpr_flops(b.jaxpr) for b in branches)
        elif name in ("pjit", "custom_vjp_call_jaxpr", "custom_jvp_call",
                      "custom_vjp_call", "remat", "checkpoint", "closed_call"):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if sub is not None:
                total += _jaxpr_flops(getattr(sub, "jaxpr", sub))
        else:
            sub = eqn.params.get("call_jaxpr")
            if sub is not None:
                total += _jaxpr_flops(getattr(sub, "jaxpr", sub))
    return total


def count_flops(fn, *args, **kwargs) -> float:
    """Matmul/conv FLOPs of fn(*args, **kwargs) (2 * MACs)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_flops(closed.jaxpr)
