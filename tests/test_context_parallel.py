"""Context-parallel DiT: swapping in the ring-attention core must preserve
the forward pass and gradients exactly (token axis sharded over the mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.models.dit import DiT
from audiodiffuser_tpu.ops.context_parallel import make_ring_attention_core
from audiodiffuser_tpu.parallel.mesh import create_mesh


def _nets():
    mesh = create_mesh({"sp": len(jax.devices())})
    kwargs = dict(
        input_size=[16, 16],
        patch_size=[2, 2],  # 64 tokens -> 8 per device
        in_channels=2,
        hidden_size=32,
        depth=2,
        num_heads=2,
        cond_drop_prob=0.0,
    )
    base = DiT(**kwargs)
    cp = DiT(**kwargs, attention_core=make_ring_attention_core(mesh, "sp"))
    return base, cp


def test_cp_dit_forward_parity():
    base, cp = _nets()
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 2))
    t = jnp.asarray([0.2, 0.7])
    variables = base.init(jax.random.key(1), x, t)
    # perturb away from the zero-init output
    params = jax.tree.map(lambda a: a + 0.01, variables["params"])

    out_base = base.apply({"params": params}, x, t)
    out_cp = jax.jit(lambda p, x, t: cp.apply({"params": p}, x, t))(params, x, t)
    np.testing.assert_allclose(np.asarray(out_cp), np.asarray(out_base), atol=2e-5)


def test_cp_dit_grad_parity():
    base, cp = _nets()
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 2))
    t = jnp.asarray([0.5])
    variables = base.init(jax.random.key(3), x, t)
    params = jax.tree.map(lambda a: a + 0.01, variables["params"])

    def loss(net, p):
        return jnp.mean(net.apply({"params": p}, x, t) ** 2)

    g_base = jax.grad(lambda p: loss(base, p))(params)
    g_cp = jax.jit(jax.grad(lambda p: loss(cp, p)))(params)
    for a, b in zip(jax.tree.leaves(g_cp), jax.tree.leaves(g_base)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
