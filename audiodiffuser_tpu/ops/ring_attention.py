"""Ring attention: exact softmax attention over a sequence sharded across
devices (context / sequence parallelism).

The reference's long-context story is purely architectural (downsampling,
linear attention, patchify — SURVEY §5.7); this op extends it to *sharded*
sequences: each device holds a [B, H, N/devs, D] shard of Q/K/V, K/V shards
rotate around the ring with ``jax.lax.ppermute`` (ICI neighbor transfers)
while each device accumulates its queries' attention with the online-softmax
merge — communication overlaps compute, memory stays O(N/devs), and the
result is bitwise-equivalent to full attention up to reduction order.

Use inside ``shard_map`` over a mesh axis (see tests/test_ring_attention.py):

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name='sp', scale=s),
        mesh, in_specs=P(None, None, 'sp', None), out_specs=P(None, None, 'sp', None),
    )(q, k, v)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _block_attend(q, k, v, scale, m_prev, l_prev, acc):
    """One online-softmax accumulation step against a K/V block.

    q: [B, H, Nq, D]; k/v: [B, H, Nk, D]; carries m/l: [B, H, Nq, 1]."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhnm,bhmd->bhnd", p, v.astype(jnp.float32)
    )
    return m_new, l_new, acc_new


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Exact attention over a sequence sharded on ``axis_name``.

    Call inside shard_map; q/k/v are the local shards [B, H, N_local, D]."""
    n_dev = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    b, h, n_q, d = q.shape
    # derive the carries from q so they inherit its device-varying axis type
    zero_like_q = (q[..., :1] * 0.0).astype(jnp.float32)
    m0 = zero_like_q - jnp.inf
    l0 = zero_like_q
    acc0 = jnp.zeros((b, h, n_q, d), jnp.float32) + (q * 0.0).astype(jnp.float32)

    def body(carry, _):
        k_cur, v_cur, m, l, acc = carry
        m, l, acc = _block_attend(q, k_cur, v_cur, scale, m, l, acc)
        # rotate K/V shards to the next device (overlaps with next compute)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m, l, acc), None

    (k_f, v_f, m, l, acc), _ = jax.lax.scan(
        body, (k, v, m0, l0, acc0), None, length=n_dev
    )
    del k_f, v_f, idx
    return (acc / l).astype(q.dtype)
