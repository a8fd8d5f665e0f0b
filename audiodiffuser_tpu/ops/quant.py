"""Int8 (W8A8) quantized convolution for the sampling fast path.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured
1.44-1.67x end-to-end through XLA's conv lowering at flagship Block shapes,
``scripts/perf/probe_int8.py``).  With bf16 convs already at ~93% of peak
(see ROADMAP), lower-precision compute is the only remaining conv lever.

Scheme (the standard post-training W8A8 recipe for conv UNets):
- weights: per-output-channel symmetric absmax int8, quantized from the
  bf16 params at trace time (cheap; folded into the step by XLA),
- activations: dynamic per-tensor symmetric absmax int8 — the absmax
  reduce fuses into the producer chain (GN/SiLU epilogue), and the
  int8 conv input is written at HALF the HBM bytes of bf16,
- accumulation in int32 on the MXU, dequantised by ``x_scale * w_scale[c]``
  in the conv epilogue fusion.

Gradients pass straight-through to the bf16 conv VJP (custom_vjp), so the
op is safe anywhere in a model even under ``jax.grad`` — but the intended
use is generation/serving (``ADT_INT8=1``), quality-checked by FAD against
the bf16 samples (reference quality bar: BASELINE.md).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: w [..., Co] -> (int8, scale [Co])."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_activation(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-tensor symmetric int8: x -> (int8, scalar scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _conv(x, w, strides, padding, out_dtype, lhs_dilation=None):
    return jax.lax.conv_general_dilated(
        x,
        w,
        tuple(strides),
        padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def _int8_conv_impl(x, w, bias, strides, padding, act_scale=None,
                    lhs_dilation=None):
    wq, ws = quantize_weight(w)
    if act_scale is None:
        xq, xs = quantize_activation(x)
    else:
        # static calibrated scale: the round/clip chain fuses into x's
        # producer (GN/SiLU epilogue) and the conv input is written int8
        # directly — no extra absmax pass, HALF the producer HBM bytes
        xs = jnp.asarray(act_scale, jnp.float32)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / xs), -127, 127
        ).astype(jnp.int8)
    y = _conv(xq, wq, strides, padding, jnp.int32, lhs_dilation)
    y = y.astype(jnp.float32) * (xs * ws)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _bf16_conv_impl(x, w, bias, strides, padding, lhs_dilation=None):
    y = _conv(x, w.astype(x.dtype), strides, padding, jnp.float32, lhs_dilation)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def int8_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    strides: Sequence[int] = (1, 1),
    padding: str = "SAME",
    act_scale: Optional[jnp.ndarray] = None,
    lhs_dilation: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """W8A8 conv with int32 MXU accumulation and straight-through gradients.

    Forward: per-channel weight quant + activation quant (dynamic absmax, or
    a static calibrated ``act_scale`` — see ``stats_to_scales``).
    Backward: the bf16 conv VJP on the unquantised operands (STE)."""

    @jax.custom_vjp
    def op(x, w, bias):
        return _int8_conv_impl(x, w, bias, strides, padding, act_scale,
                               lhs_dilation)

    def fwd(x, w, bias):
        return op(x, w, bias), (x, w, bias)

    def bwd(res, g):
        x, w, bias = res
        _, vjp = jax.vjp(
            lambda x, w, bias: _bf16_conv_impl(
                x, w, bias, strides, padding, lhs_dilation
            ),
            x, w, bias,
        )
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op(x, w, bias)


def _int8_dense_impl(x, w, act_scale=None):
    """W8A8 matmul over the last axis: x [..., Cin] @ w [Cin, Cout]."""
    wq, ws = quantize_weight(w)
    if act_scale is None:
        xq, xs = quantize_activation(x)
    else:
        xs = jnp.asarray(act_scale, jnp.float32)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / xs), -127, 127
        ).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws)).astype(x.dtype)


def int8_dense(
    x: jnp.ndarray,
    w: jnp.ndarray,
    act_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """W8A8 dense (int32 MXU accumulation) with straight-through gradients:
    the backward is the bf16 matmul VJP on the unquantised operands."""

    @jax.custom_vjp
    def op(x, w):
        return _int8_dense_impl(x, w, act_scale)

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        _, vjp = jax.vjp(
            lambda x, w: jnp.einsum("...i,io->...o", x, w.astype(x.dtype)), x, w
        )
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op(x, w)


def quant_store(y: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Snap ``y`` onto the int8 grid ``scale * [-127, 127]`` (fake-quant).

    Written at producer/consumer seams (Block conv outputs), this lets XLA
    materialise the tensor in HBM as s8 + a trace-constant scale — the
    clip/round fuses into the producer's epilogue and the dequant multiply
    into each consumer (the same storage pattern XLA already applies to the
    int8 conv inputs, see the ``add_convert_fusion`` ops in PROFILE.md) —
    halving the HBM bytes of every read of the full-resolution maps.
    Gradients are straight-through (inference-only path in practice: the
    'quant' collection is only bound when ``train=False``)."""

    @jax.custom_vjp
    def op(y):
        s = jnp.asarray(scale, jnp.float32)
        q = jnp.clip(
            jnp.round(y.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
        return (q.astype(jnp.float32) * s).astype(y.dtype)

    op.defvjp(lambda y: (op(y), None), lambda _, g: (g,))
    return op(y)


def int8_store_enabled() -> bool:
    """s8 activation storage at Block conv-output seams (``ADT_INT8_STORE=1``
    opt-in). v5e ablation (2026-08-17, batch-128/32-Heun): 17.53 vs 17.90
    samples/s — the extra quant/dequant round trips cost more than the halved
    seam bytes on this compute-bound workload. Kept as a memory lever for
    activation-capped regimes (e.g. larger microbatches)."""
    return int8_enabled() and os.environ.get("ADT_INT8_STORE", "0") == "1"


def int8_dense_eligible(cin: int, cout: int) -> bool:
    """Lane-aligned matmul shapes only (the MXU int8 path wants 128-aligned
    contraction and output dims). Covers the attention QKV/out projections
    and transformer feedforwards at the deep UNet levels (dim 256).
    ``ADT_INT8_DENSE=1`` opts in. v5e ablation (2026-08-17): 17.91 vs 17.90
    samples/s on the flagship bench — the deep-level matmuls are too small a
    slice there to move the headline; the path matters for attention-heavy
    nets (DiT serving)."""
    return (
        int8_enabled()
        and os.environ.get("ADT_INT8_DENSE", "0") == "1"
        and cin % 128 == 0
        and cout % 128 == 0
    )


def int8_seam_enabled() -> bool:
    """Up/downsample seam convs (pixel-shuffle / space-to-depth 2x2) on the
    W8A8 path (``ADT_INT8_SEAM=1`` opt-in). Unlike Block convs their inputs
    are not GroupNorm-normalised, so the static scales matter more — covered
    by the same FAD gate. v5e ablation (2026-08-17): 17.79 vs 17.90
    samples/s — the polyphase relayout around the seam convs dominates their
    cost, so quantizing them doesn't pay on the flagship bench."""
    return int8_enabled() and os.environ.get("ADT_INT8_SEAM", "0") == "1"


def stats_to_scales(quant_stats) -> dict:
    """Convert a sown ``quant_stats`` collection (per-module ``act_absmax``
    maxima) into the ``quant`` collection (per-module ``act_scale``) that the
    Block int8 path reads for static quantization."""

    _renames = {"act_absmax": "act_scale", "out_absmax": "out_scale"}

    def walk(node):
        if isinstance(node, dict):
            return {_renames.get(k, k): walk(v) for k, v in node.items()}
        value = node[0] if isinstance(node, (tuple, list)) else node
        return jnp.maximum(jnp.asarray(value, jnp.float32), 1e-12) / 127.0

    return walk(dict(quant_stats))


def merge_stats_max(a, b):
    """Elementwise-max merge of two quant_stats trees (calibration steps)."""
    if a is None:
        return b
    return jax.tree.map(jnp.maximum, a, b)


def int8_enabled() -> bool:
    """Opt-in gate for the quantized sampling path (``ADT_INT8=1``)."""
    return os.environ.get("ADT_INT8", "0") == "1"


def int8_all_enabled() -> bool:
    """Extended coverage gate (``ADT_INT8_ALL=1`` on top of ``ADT_INT8=1``):
    also quantize 1x1 residual/skip projections and strided downsample convs
    (inputs NOT GroupNorm-normalised — wider activation ranges, so this
    tier is separately gated and separately FAD-checked)."""
    return int8_enabled() and os.environ.get("ADT_INT8_ALL", "0") == "1"


def int8_conv_eligible(cin: int, cout: int) -> bool:
    """Lane-aligned real channel counts only; the 2-channel stem/head convs
    (quality-sensitive first/last layers) never qualify."""
    return int8_enabled() and cin % 128 == 0 and cout % 128 == 0
