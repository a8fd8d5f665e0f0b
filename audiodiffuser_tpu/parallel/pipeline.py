"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

Beyond the reference (DDP-only — src/train.py Lightning DDPStrategy); this is
the TPU-native pipelining recipe: the layer-stacked parameters are sharded
over a ``pp`` mesh axis (each device owns a contiguous stage of layers),
activations flow stage-to-stage with ``ppermute`` over ICI, and a
``lax.scan`` over ``num_microbatches + num_stages - 1`` ticks keeps every
device busy outside the fill/drain bubble. Differentiable end to end
(``ppermute``/``scan`` have transposes), so ``jax.grad`` through
``pipeline_apply`` yields pipelined backprop.

Usage sketch (homogeneous blocks, e.g. DiT blocks or MLP layers)::

    stacked = jax.vmap(layer.init, ...)        # leaves [L, ...]
    y = pipeline_apply(apply_one_layer, stacked, x_mb, mesh, "pp")

where ``apply_one_layer(params_i, h, *consts) -> h`` and ``x_mb`` is the
batch pre-split into ``[num_microbatches, microbatch, ...]``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(params_list) -> Any:
    """[L x pytree] -> pytree with leading layer axis [L, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def pipeline_apply(
    layer_fn: Callable,
    stacked_params: Any,
    x_microbatches: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "pp",
    consts: tuple = (),
) -> jnp.ndarray:
    """Run ``L`` stacked layers over microbatches, pipelined over the mesh.

    layer_fn:        (params_i, h, *consts) -> h, one layer.
    stacked_params:  pytree, every leaf [L, ...]; L must divide by the pp
                     axis size (each stage owns L/S consecutive layers).
    x_microbatches:  [M, microbatch, ...] (replicated; stage 0 feeds them in).
    consts:          extra broadcast arguments for every layer (e.g. the
                     conditioning vector) — replicated, not staged.

    Returns [M, microbatch, ...] outputs, replicated on every device.
    """
    num_stages = mesh.shape[axis_name]
    num_micro = x_microbatches.shape[0]
    l_total = jax.tree.leaves(stacked_params)[0].shape[0]
    if l_total % num_stages != 0:
        raise ValueError(
            f"{l_total} layers not divisible by {num_stages} pipeline stages"
        )

    def local_apply(local_params, h, consts):
        def body(carry, p):
            return layer_fn(p, carry, *consts), None

        h, _ = lax.scan(body, h, local_params)
        return h

    def pipelined(local_params, x_mb, consts):
        stage = lax.axis_index(axis_name)
        perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

        def tick(carry, t):
            act, outbuf = carry
            # stage 0 consumes microbatch t (clipped; masked by validity below)
            feed = x_mb[jnp.clip(t, 0, num_micro - 1)]
            h_in = jnp.where(stage == 0, feed, act)
            y = local_apply(local_params, h_in, consts)
            # last stage finished microbatch t-(S-1) this tick
            slot = t - (num_stages - 1)
            valid = (stage == num_stages - 1) & (slot >= 0) & (slot < num_micro)
            updated = outbuf.at[jnp.clip(slot, 0, num_micro - 1)].set(y)
            outbuf = jnp.where(valid, updated, outbuf)
            act = lax.ppermute(y, axis_name, perm)
            return (act, outbuf), None

        act0 = jnp.zeros_like(x_mb[0])
        out0 = jnp.zeros_like(x_mb)
        (act, outbuf), _ = lax.scan(
            tick, (act0, out0), jnp.arange(num_micro + num_stages - 1)
        )
        # only the last stage holds real outputs; broadcast via masked psum
        is_last = (stage == num_stages - 1).astype(outbuf.dtype)
        return lax.psum(outbuf * is_last, axis_name)

    param_specs = jax.tree.map(lambda _: P(axis_name), stacked_params)
    return shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(param_specs, P(), P()),
        out_specs=P(),
        # activations are device-varying mid-pipeline even though in/out are
        # replicated; the masked psum restores replication, which the static
        # varying-manual-axes checker can't see
        check_vma=False,
    )(stacked_params, x_microbatches, consts)
