"""Fused flash-attention Pallas TPU kernel.

The reference's hottest op is the attention einsum+softmax
(``src/models/backbones/attention_utils.py:169-182``,
``unet2d_oai.py:344-380``), which materialises the [N, N] score matrix in
HBM. This kernel computes softmax(QK^T/s)V block-by-block in VMEM with the
online-softmax recurrence, so HBM traffic is O(N*D) instead of O(N^2):

- grid over (batch*heads, query blocks); K/V live in VMEM per program and
  are walked in blocks with ``jax.lax.fori_loop``;
- the score block runs on the MXU (``preferred_element_type=float32``),
  the softmax bookkeeping on the VPU in fp32;
- backward pass recomputes attention with the XLA formulation via
  ``jax.custom_vjp`` (standard recompute strategy — forward memory win,
  no custom bwd kernel needed).

``attention_core_auto`` drops into ``models.attention.Attention`` (its
``attention_core`` hook) and dispatches: Pallas kernel on TPU for unmasked
sequences with compatible tiling, XLA einsum otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _flash_kernel(
    q_ref, k_ref, v_ref, *rest, scale: float, block_k: int, masked: bool
):
    """One (batch*head, q-block) program: online softmax over K blocks.

    With ``masked``, an extra [1, n_k] additive-bias row (0 for valid keys,
    -inf for masked ones) precedes the output ref.
    """
    if masked:
        bias_ref, o_ref = rest
    else:
        (o_ref,) = rest
    q = q_ref[0].astype(jnp.float32) * scale  # [blk_q, d]
    n_k = k_ref.shape[1]
    num_kb = n_k // block_k
    blk_q = q.shape[0]
    d = q.shape[1]

    m0 = jnp.full((blk_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc0 = jnp.zeros((blk_q, d), jnp.float32)

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [blk_q, blk_k]
        if masked:
            s = s + bias_ref[0, pl.ds(kb * block_k, block_k)][None, :]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int,
    block_k: int,
    bias: Optional[jnp.ndarray] = None,  # [B, n_k] additive key bias
    heads: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """q,k,v: [BH, N, D] (q may have different N than k/v)."""
    bh, n_q, d = q.shape
    n_k = k.shape[1]

    masked = bias is not None
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k, masked=masked
    )
    grid = (bh, n_q // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if masked:
        in_specs.append(
            pl.BlockSpec(
                (1, n_k), lambda b, i: (b // heads, 0), memory_space=pltpu.VMEM
            )
        )
        args.append(bias)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(*args)


def _sdpa_reference(q, k, v, bias, scale, heads):
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    if bias is not None:
        s = s + jnp.repeat(bias, heads, axis=0)[:, None, :]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(s.dtype)
    return jnp.einsum("bnm,bmd->bnd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, bias, scale, block_q, block_k, heads):
    return _flash_forward(q, k, v, scale, block_q, block_k, bias, heads)


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, heads):
    out = _flash_forward(q, k, v, scale, block_q, block_k, bias, heads)
    return out, (q, k, v, bias)


def _flash_bwd(scale, block_q, block_k, heads, res, g):
    q, k, v, bias = res
    if bias is None:
        _, vjp = jax.vjp(
            lambda q, k, v: _sdpa_reference(q, k, v, None, scale, heads), q, k, v
        )
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda q, k, v, b: _sdpa_reference(q, k, v, b, scale, heads), q, k, v, bias
    )
    return vjp(g)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: float = 1.0,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """softmax(q k^T * scale + mask_bias) v for [B, H, N, D] inputs.

    ``mask``: optional [B, n_k] bool (True = attend)."""
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    qf = q.reshape(b * h, n_q, d)
    kf = k.reshape(b * h, n_k, d)
    vf = v.reshape(b * h, n_k, d)
    bias = None
    if mask is not None:
        bias = jnp.where(mask.astype(bool), 0.0, -1e30).astype(jnp.float32)
    out = _flash_attention(qf, kf, vf, bias, float(scale), block_q, block_k, h)
    return out.reshape(b, h, n_q, d)


def _flash_compatible(q, k, mask) -> bool:
    import os

    # Dispatch policy, measured on v5e: XLA attention wins slightly below
    # ~4k tokens (5.6 vs 6.3 ms at N=2048) but collapses at long sequences
    # (911 vs 53 ms at N=8192 — 17x for the flash kernel, which never
    # materializes the NxN score matrix in HBM). Default: flash for
    # n_q >= ADT_FLASH_MIN_SEQ (4096). ADT_FLASH_ATTENTION=1 forces it
    # everywhere compatible; =0 disables entirely.
    force = os.environ.get("ADT_FLASH_ATTENTION")
    if force == "0":
        return False
    min_seq = int(os.environ.get("ADT_FLASH_MIN_SEQ", 4096))
    if force != "1" and q.shape[-2] < min_seq:
        return False
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return False
    n_q, d = q.shape[-2], q.shape[-1]
    n_k = k.shape[-2]
    if n_q % DEFAULT_BLOCK_Q or n_k % DEFAULT_BLOCK_K:
        return False
    if d % 128 and d not in (32, 64):
        return False
    # VMEM budget: K and V resident per program
    if 2 * n_k * d * 4 > 8 * 1024 * 1024:
        return False
    return True


def attention_core_auto(q, k, v, mask=None, scale=1.0):
    """Drop-in ``attention_core`` for models.attention.Attention: Pallas
    flash kernel when profitable/compatible, fp32-softmax XLA einsum else.

    Masked inputs whose key length is off-tile (e.g. self+text KV concat) are
    zero-padded to the key block size with masked-out keys — numerically a
    no-op, but it keeps long-sequence text conditioning on the flash path."""
    from ..models.attention import sdpa_xla

    n_k = k.shape[-2]
    if (
        mask is not None
        and n_k % DEFAULT_BLOCK_K != 0
        and q.shape[-2] >= int(__import__("os").environ.get("ADT_FLASH_MIN_SEQ", 4096))
    ):
        pad = DEFAULT_BLOCK_K - n_k % DEFAULT_BLOCK_K
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask.astype(bool), ((0, 0), (0, pad)), constant_values=False)

    if _flash_compatible(q, k, mask):
        return flash_attention(q, k, v, mask=mask, scale=scale)
    return sdpa_xla(q, k, v, mask=mask, scale=scale)
