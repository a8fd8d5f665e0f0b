"""Context-parallel attention cores.

``make_ring_attention_core(mesh, axis)`` builds a drop-in ``attention_core``
(the hook on ``models.attention.Attention``) that computes exact attention
with the sequence sharded over a mesh axis via :mod:`ops.ring_attention` —
K/V shards rotate around the ring with ``ppermute`` while each device
attends for its local queries. Token-mixing happens ONLY here, so backbones
whose other ops are pointwise over tokens (DiT: LayerNorm/MLP/modulation)
become sequence-parallel end to end just by swapping the core — the
Trainer exposes this as ``sequence_parallel=<sp-axis size>``.

With ``batch_axis`` set (a 2D data x sp mesh), the batch dimension stays
sharded over the data axis *through* the ring shard_map, so dp and sp
compose without an activation all-gather at every attention.

Masked attention falls back to the gathered XLA path.
"""

from __future__ import annotations

from typing import Callable, Optional

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .ring_attention import ring_attention


def make_ring_attention_core(
    mesh: Mesh, axis_name: str, batch_axis: Optional[str] = None
) -> Callable:
    """attention_core computing softmax(QK^T)V with the token axis sharded
    over ``axis_name``; q/k/v are logical [B, H, N, D] arrays.

    ``batch_axis``: optional mesh axis to keep the batch dim sharded over
    (e.g. ``'data'`` on a dp x sp mesh). Calls whose batch does not divide
    that axis (the validation-epoch single-sample generation) drop the
    batch sharding for that call only — specs are trace-time constants.
    """
    if axis_name not in mesh.shape:
        raise ValueError(
            f"mesh has no axis {axis_name!r}; available: {tuple(mesh.shape)}"
        )
    if batch_axis is not None and batch_axis not in mesh.shape:
        raise ValueError(
            f"mesh has no axis {batch_axis!r}; available: {tuple(mesh.shape)}"
        )

    def core(q, k, v, mask=None, scale=1.0):
        if mask is not None or q.shape[-2] % mesh.shape[axis_name] != 0:
            from ..models.attention import sdpa_xla

            return sdpa_xla(q, k, v, mask=mask, scale=scale)

        b_ax = batch_axis
        if b_ax is not None and q.shape[0] % mesh.shape[b_ax] != 0:
            b_ax = None
        spec = P(b_ax, None, axis_name, None)
        ring = shard_map(
            lambda q, k, v: ring_attention(q, k, v, axis_name=axis_name, scale=scale),
            mesh=mesh,
            in_specs=(spec,) * 3,
            out_specs=spec,
        )
        return ring(q, k, v)

    return core
