"""Pipeline parallelism: pipelined forward/backward must match the plain
sequential layer stack exactly on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiodiffuser_tpu.parallel.mesh import create_mesh
from audiodiffuser_tpu.parallel.pipeline import pipeline_apply, stack_layer_params


class Block(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x, c):
        h = nn.Dense(self.width * 2)(x) + nn.Dense(self.width * 2)(c)
        return x + nn.Dense(self.width)(nn.gelu(h))


WIDTH = 16
L = 8
M = 4  # microbatches
MB = 2  # microbatch size


def _setup():
    block = Block(WIDTH)
    x = jax.random.normal(jax.random.key(0), (M, MB, WIDTH))
    c = jax.random.normal(jax.random.key(1), (MB, WIDTH))
    params = [
        block.init(jax.random.key(10 + i), x[0], c)["params"] for i in range(L)
    ]
    stacked = stack_layer_params(params)

    def layer_fn(p, h, c):
        return block.apply({"params": p}, h, c)

    def sequential(stacked, x_mb, c):
        def body(h, p):
            return layer_fn(p, h, c), None

        return jax.vmap(
            lambda xx: jax.lax.scan(body, xx, stacked)[0]
        )(x_mb)

    return layer_fn, stacked, x, c, sequential


def test_pipeline_forward_matches_sequential():
    mesh = create_mesh({"pp": len(jax.devices())})
    layer_fn, stacked, x, c, sequential = _setup()
    ref = sequential(stacked, x, c)
    out = jax.jit(
        lambda p, x, c: pipeline_apply(layer_fn, p, x, mesh, "pp", consts=(c,))
    )(stacked, x, c)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_grad_matches_sequential():
    mesh = create_mesh({"pp": len(jax.devices())})
    layer_fn, stacked, x, c, sequential = _setup()

    def loss_pipe(p):
        y = pipeline_apply(layer_fn, p, x, mesh, "pp", consts=(c,))
        return jnp.mean(y**2)

    def loss_seq(p):
        return jnp.mean(sequential(p, x, c) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pipeline_rejects_indivisible_layers():
    mesh = create_mesh({"pp": len(jax.devices())})
    layer_fn, stacked, x, c, _ = _setup()
    bad = jax.tree.map(lambda a: a[: L - 1], stacked)  # 7 layers over 8 stages
    try:
        pipeline_apply(layer_fn, bad, x, mesh, "pp", consts=(c,))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "divisible" in str(e)
