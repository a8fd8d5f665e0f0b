"""Fused flash-attention Pallas TPU kernels (forward + backward).

The reference's hottest op is the attention einsum+softmax
(``src/models/backbones/attention_utils.py:169-182``,
``unet2d_oai.py:344-380``), which materialises the [N, N] score matrix in
HBM. These kernels compute softmax(QK^T/s)V and its gradients block-by-block
in VMEM with the online-softmax recurrence, so HBM traffic is O(N*D) instead
of O(N^2):

- **forward**: grid (batch*heads, q-blocks, k-blocks); K/V are *streamed*
  from HBM one block per grid step (no VMEM-residency cap on sequence
  length), the softmax statistics live in VMEM scratch that carries across
  the innermost k-block loop, and the kernel also emits the logsumexp rows
  needed by the backward.
- **backward**: two kernels in the FlashAttention-2 style. ``dq``: grid
  (BH, q-blocks, k-blocks) accumulating dQ in scratch; ``dkv``: grid
  (BH, k-blocks, q-blocks) accumulating dK/dV. Both recompute the
  probability block as exp(s - lse) from the saved logsumexp — no N x N
  matrix ever hits HBM in either direction.
- score blocks run on the MXU (``preferred_element_type=float32``), softmax
  bookkeeping on the VPU in fp32.

``attention_core_auto`` drops into ``models.attention.Attention`` (its
``attention_core`` hook) and dispatches: Pallas kernel on TPU for sequences
with compatible tiling, XLA einsum otherwise. Masked (text-KV concat) inputs
ride the kernel via an additive per-key bias row; the bias cotangent is
defined as zero (masks are boolean, non-differentiable sources).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _default_interpret() -> bool:
    """Pallas interpret mode off-TPU, so the custom_vjp path (fwd + bwd
    kernels) is exercisable on CPU tests."""
    return jax.devices()[0].platform not in ("tpu", "axon")


def _fwd_kernel(
    q_ref, k_ref, v_ref, *rest, scale: float, num_kb: int, masked: bool
):
    """One (bh, q-block, k-block) step of the streaming online softmax.

    Scratch (m, l, acc) carries across the innermost k-block loop; on the
    final k block the normalised output and logsumexp rows are emitted.
    """
    if masked:
        bias_ref, o_ref, lse_ref, m_s, l_s, acc_s = rest
    else:
        o_ref, lse_ref, m_s, l_s, acc_s = rest
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, -jnp.inf)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    # keep the dots in the input dtype: bf16 operands hit the MXU at full
    # rate (a pre-cast to fp32 would run the matmul ~4-8x slower); the
    # accumulation is fp32 either way via preferred_element_type
    q = q_ref[0]  # [blk_q, d]
    k = k_ref[0]  # [blk_k, d]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [blk_q, blk_k], fp32 scores
    if masked:
        s = s + bias_ref[0, 0][None, :]
    m_prev, l_prev, acc = m_s[...], l_s[...], acc_s[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_s[...], l_s[...], acc_s[...] = m_new, l_new, acc

    @pl.when(kb == num_kb - 1)
    def _emit():
        o_ref[0] = (acc / l_new).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_new + jnp.log(l_new))[:, 0]


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int,
    block_k: int,
    bias: Optional[jnp.ndarray] = None,  # [B, n_k] additive key bias
    heads: int = 1,
    interpret: Optional[bool] = None,
):
    """q,k,v: [BH, N, D] (q may have different N than k/v). Returns (o, lse)."""
    if interpret is None:
        interpret = _default_interpret()
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    num_kb = n_k // block_k

    masked = bias is not None
    kernel = functools.partial(
        _fwd_kernel, scale=scale, num_kb=num_kb, masked=masked
    )
    grid = (bh, n_q // block_q, num_kb)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
    ]
    args = [q, k, v]
    if masked:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // heads, 0, j))
        )
        args.append(bias.reshape(bias.shape[0], 1, n_k))
    out, lse3 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bh, 1, n_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out, lse3.reshape(bh, n_q)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, *rest,
    scale: float, num_kb: int, masked: bool,
):
    """dQ accumulation: ds = p * (dO V^T - D); dQ += scale * ds K."""
    if masked:
        bias_ref, dq_ref, dq_s = rest
    else:
        dq_ref, dq_s = rest
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    # dots stay in the input dtype (full MXU rate for bf16); fp32 accumulate
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if masked:
        s = s + bias_ref[0, 0][None, :]
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # [blk_q, blk_k]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - dl_ref[0, 0][:, None])).astype(k.dtype)
    dq_s[...] += scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kb == num_kb - 1)
    def _emit():
        dq_ref[0] = dq_s[...].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, *rest,
    scale: float, num_qb: int, masked: bool,
):
    """dK/dV accumulation over q blocks: dV += p^T dO; dK += scale * ds^T Q."""
    if masked:
        bias_ref, dk_ref, dv_ref, dk_s, dv_s = rest
    else:
        dk_ref, dv_ref, dk_s, dv_s = rest
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    # dots stay in the input dtype (full MXU rate for bf16); fp32 accumulate
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if masked:
        s = s + bias_ref[0, 0][None, :]
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # [blk_q, blk_k]
    dv_s[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - dl_ref[0, 0][:, None])).astype(q.dtype)
    dk_s[...] += scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qb == num_qb - 1)
    def _emit():
        dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, do, o, lse, bias, scale, block_q, block_k, heads, interpret=None
):
    if interpret is None:
        interpret = _default_interpret()
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    num_qb, num_kb = n_q // block_q, n_k // block_k
    masked = bias is not None
    # D rows: rowsum(dO * O) — one cheap fused elementwise+reduce in XLA
    dl = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).reshape(bh, 1, n_q)
    lse = lse.reshape(bh, 1, n_q)
    bias3 = None if bias is None else bias.reshape(bias.shape[0], 1, n_k)

    qspec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    kspec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    rowspec = pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i))
    in_specs = [qspec, kspec, kspec, qspec, rowspec, rowspec]
    args = [q, k, v, do, lse, dl]
    if masked:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b // heads, 0, j))
        )
        args.append(bias3)
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, num_kb=num_kb, masked=masked
        ),
        grid=(bh, num_qb, num_kb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(*args)

    # dk/dv: k-blocks outer, q-blocks inner
    qspec2 = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0))
    kspec2 = pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0))
    rowspec2 = pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i))
    in_specs2 = [qspec2, kspec2, kspec2, qspec2, rowspec2, rowspec2]
    args2 = [q, k, v, do, lse, dl]
    if masked:
        in_specs2.append(
            pl.BlockSpec((1, 1, block_k), lambda b, j, i: (b // heads, 0, j))
        )
        args2.append(bias3)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, num_qb=num_qb, masked=masked
        ),
        grid=(bh, num_kb, num_qb),
        in_specs=in_specs2,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args2)
    return dq, dk, dv


def _sdpa_reference(q, k, v, bias, scale, heads):
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    if bias is not None:
        s = s + jnp.repeat(bias, heads, axis=0)[:, None, :]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(s.dtype)
    return jnp.einsum("bnm,bmd->bnd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, bias, scale, block_q, block_k, heads):
    o, _ = _flash_forward(q, k, v, scale, block_q, block_k, bias, heads)
    return o


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, heads):
    o, lse = _flash_forward(q, k, v, scale, block_q, block_k, bias, heads)
    return o, (q, k, v, bias, o, lse)


def _flash_bwd(scale, block_q, block_k, heads, res, g):
    q, k, v, bias, o, lse = res
    dq, dk, dv = _flash_backward(
        q, k, v, g, o, lse, bias, scale, block_q, block_k, heads
    )
    # bias originates from boolean masks (non-differentiable sources); its
    # cotangent is never consumed, so it is defined as zero
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _tuned_blocks(n_q: int, n_k: int, block_q: int, block_k: int):
    """Per-call block autotune: 128x128 blocks make the grid latency-bound
    (each step is two 4-MFLOP dots); the largest dividing blocks up to
    512x1024 amortize grid-step overhead while the fp32 score block stays
    well under VMEM (512*1024*4B = 2 MB of ~16 MB)."""
    if block_q == DEFAULT_BLOCK_Q:
        for cand in (512, 256):
            if n_q % cand == 0:
                block_q = cand
                break
    if block_k == DEFAULT_BLOCK_K:
        for cand in (1024, 512, 256):
            if n_k % cand == 0:
                block_k = cand
                break
    return block_q, block_k


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
    block_q, block_k = _tuned_blocks(n_q, n_k, block_q, block_k)
    qf = q.reshape(b * h, n_q, d)
    kf = k.reshape(b * h, n_k, d)
    vf = v.reshape(b * h, n_k, d)
    bias = None
    if mask is not None:
        bias = jnp.where(mask.astype(bool), 0.0, -1e30).astype(jnp.float32)
    out = _flash_attention(qf, kf, vf, bias, float(scale), block_q, block_k, h)
    return out.reshape(b, h, n_q, d)


def _min_seq() -> int:
    """Single source of truth for the flash-dispatch sequence threshold.

    Shared by ``_flash_compatible`` and the masked-KV padding gate in
    ``attention_core_auto`` so one env var means one policy."""
    return int(os.environ.get("ADT_FLASH_MIN_SEQ", 16384))


def _flash_compatible(q, k, mask) -> bool:
    # Dispatch policy, re-measured on v5e with forced-sync timing
    # (2026-08-17): XLA's fused attention is FASTER on wall-clock wherever
    # its [N, N] buffers fit (3.2 vs 3.9 ms at N=2048, 7.1 vs 18.6 ms at
    # N=8192, BH=8 d=64) — the flash kernels' value is MEMORY: O(N*D)
    # instead of O(N^2) forward scores and backward temporaries (0 MB vs
    # 4.3 GB at N=16k, scripts/microbench_flash_bwd.py). Default: flash
    # only at n_q >= ADT_FLASH_MIN_SEQ (16384), where XLA's N^2 buffers
    # start exhausting HBM. ADT_FLASH_ATTENTION=1 forces it everywhere
    # compatible; =0 disables entirely.
    force = os.environ.get("ADT_FLASH_ATTENTION")
    if force == "0":
        return False
    if force != "1" and q.shape[-2] < _min_seq():
        return False
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return False
    n_q, d = q.shape[-2], q.shape[-1]
    n_k = k.shape[-2]
    if n_q % DEFAULT_BLOCK_Q or n_k % DEFAULT_BLOCK_K:
        return False
    if d % 128 and d not in (32, 64):
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
        and q.shape[-2] >= _min_seq()
    ):
        pad = DEFAULT_BLOCK_K - n_k % DEFAULT_BLOCK_K
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask.astype(bool), ((0, 0), (0, pad)), constant_values=False)

    if _flash_compatible(q, k, mask):
        return flash_attention(q, k, v, mask=mask, scale=scale)
    return sdpa_xla(q, k, v, mask=mask, scale=scale)
