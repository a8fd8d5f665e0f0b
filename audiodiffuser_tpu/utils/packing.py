"""Latency-aware device->host pytree fetch.

``jax.device_get`` on a pytree issues one blocking transfer per leaf; on a
tunneled/remote TPU each round trip costs O(100ms), so a ~2000-leaf train
state (params + adam m/v + EMA profiles) takes minutes to fetch regardless
of its byte size.  Measured on the round-4 soak: 794 MB 'last' checkpoint
~480s, 79 MB EMA snapshot ~90s — both ~0.24 s/leaf, i.e. latency-bound,
not bandwidth-bound.

``device_get_packed`` concatenates the leaves into one flat device array per
dtype first (a handful of cheap on-device ops), fetches those few large
buffers, and re-slices them on the host.  This turns ~2000 round trips into
~4.

No reference counterpart (/root/reference trains against local CUDA
devices, where per-transfer latency is negligible); this is TPU-tunnel /
remote-device engineering.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["device_get_packed"]


def device_get_packed(tree):
    """Fetch a pytree of device arrays to host numpy with few transfers.

    Semantics match ``jax.device_get(tree)``: returns the same pytree
    structure with every jax array replaced by a host ``np.ndarray`` of the
    same shape/dtype.  Non-jax leaves (numpy arrays, python scalars) pass
    through unchanged.  Multi-device (sharded) arrays are supported — the
    on-device ``concatenate`` gathers them, same as ``device_get`` would.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [None] * len(leaves)
    groups: dict[str, list[int]] = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.core.Tracer):
            # called under trace (shouldn't happen) — defer to device_get
            return jax.device_get(tree)
        if isinstance(leaf, jax.Array):
            groups.setdefault(str(leaf.dtype), []).append(i)
        else:
            out[i] = leaf

    # One flat buffer per dtype, one dict fetch for all of them.
    packed = {}
    for dt, idxs in groups.items():
        flats = [leaves[i].reshape(-1) for i in idxs]
        packed[dt] = flats[0] if len(flats) == 1 else jnp.concatenate(flats)
    packed_host = jax.device_get(packed)

    for dt, idxs in groups.items():
        buf = np.asarray(packed_host[dt])
        off = 0
        for i in idxs:
            n = leaves[i].size
            out[i] = buf[off : off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)
