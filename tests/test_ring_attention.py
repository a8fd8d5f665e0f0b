"""Ring attention: sharded exact-attention parity on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from audiodiffuser_tpu.models.attention import sdpa_xla
from audiodiffuser_tpu.ops.ring_attention import ring_attention
from audiodiffuser_tpu.parallel.mesh import create_mesh


def test_ring_attention_matches_full():
    mesh = create_mesh({"sp": len(jax.devices())})
    b, h, n, d = 2, 2, 256, 32  # 256 tokens over 8 devices -> 32/shard
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, h, n, d))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, n, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, n, d))
    scale = d**-0.5

    expect = np.asarray(sdpa_xla(q, k, v, scale=scale))

    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp", scale=scale),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
    )
    got = np.asarray(jax.jit(ring)(q, k, v))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_ring_attention_grads_flow():
    mesh = create_mesh({"sp": len(jax.devices())})
    b, h, n, d = 1, 2, 64, 16
    key = jax.random.key(3)
    q = jax.random.normal(key, (b, h, n, d))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, n, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, n, d))
    scale = d**-0.5

    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp", scale=scale),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
    )

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) ** 2)

    def loss_full(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v, scale=scale) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, e in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=5e-5)
