"""Latency-aware device->host pytree fetch.

``jax.device_get`` on a pytree issues one blocking transfer per leaf; on a
tunneled/remote TPU each round trip costs O(100ms), so a ~2000-leaf train
state (params + adam m/v + EMA profiles) takes minutes to fetch regardless
of its byte size.  Measured on the round-4 soak: 794 MB 'last' checkpoint
~480s, 79 MB EMA snapshot ~90s — both ~0.24 s/leaf, i.e. latency-bound,
not bandwidth-bound.

``pack_tree`` concatenates the leaves into one flat device array per dtype
(a handful of cheap on-device ops), so the host fetch is ~4 large transfers
instead of ~2000 round trips.  The packed buffers are freshly allocated by
eager XLA ops, which decouples them from the caller's arrays: a donated
train step may invalidate the originals while a background thread is still
draining the packed copies (see trainer._BackgroundCkptWriter).

No reference counterpart (/root/reference trains against local CUDA
devices, where per-transfer latency is negligible); this is TPU-tunnel /
remote-device engineering.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["pack_tree", "unpack_tree", "device_get_packed", "device_put_packed"]


def pack_tree(tree):
    """On-device packing of a pytree into one flat buffer per dtype.

    Returns ``(packed, spec)`` where ``packed`` is a dict
    ``{dtype_str: flat device array}`` of freshly-allocated device buffers
    and ``spec`` carries everything ``unpack_tree`` needs to rebuild the
    original structure.  Non-jax leaves (numpy arrays, python scalars) ride
    along in the spec untouched.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups: dict[str, list[int]] = {}
    passthrough: dict[int, object] = {}
    metas: list = []
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.core.Tracer):
            raise TypeError("pack_tree cannot run under a jax trace")
        if isinstance(leaf, jax.Array):
            groups.setdefault(str(leaf.dtype), []).append(i)
            metas.append((str(leaf.dtype), tuple(leaf.shape), int(leaf.size)))
        else:
            passthrough[i] = leaf
            metas.append(None)

    packed = {}
    for dt, idxs in groups.items():
        flats = [leaves[i].reshape(-1) for i in idxs]
        if len(flats) == 1:
            # concatenate with an empty tail: guarantees the eager op
            # allocates a fresh output buffer instead of aliasing the
            # caller's (a bare reshape may alias)
            flats = flats + [jnp.zeros((0,), flats[0].dtype)]
        packed[dt] = jnp.concatenate(flats)
    return packed, (treedef, metas, passthrough)


def unpack_tree(packed_host, spec):
    """Rebuild the original pytree from fetched flat buffers."""
    treedef, metas, passthrough = spec
    offsets = {dt: 0 for dt in packed_host}
    out = []
    for i, meta in enumerate(metas):
        if meta is None:
            out.append(passthrough[i])
            continue
        dt, shape, size = meta
        buf = np.asarray(packed_host[dt])
        out.append(buf[offsets[dt] : offsets[dt] + size].reshape(shape))
        offsets[dt] += size
    return jax.tree_util.tree_unflatten(treedef, out)


def device_get_packed(tree):
    """Drop-in for ``jax.device_get(tree)`` using the packed transfer path."""
    try:
        packed, spec = pack_tree(tree)
    except TypeError:
        return jax.device_get(tree)
    return unpack_tree(jax.device_get(packed), spec)


def device_put_packed(tree, sharding=None):
    """Latency-aware mirror of ``jax.device_put(tree, sharding)`` for h2d.

    ``jax.device_put`` issues one transfer per leaf; a checkpoint restore
    that uploads a ~2000-leaf train state through a remote TPU tunnel pays
    the same ~0.24 s/leaf round-trip tax as the d2h direction (~8 min per
    eval leg measured in the round-3 soak).  Here the host-side leaves are
    concatenated into one flat numpy buffer per dtype (cheap memcpy), those
    few big buffers are uploaded, and a single jitted program re-slices them
    on device — its HLO depends only on the tree structure, so the
    persistent compilation cache makes the unpack free from the second
    restore onward.

    Leaves that are already ``jax.Array`` (or non-arrays) fall back to plain
    ``device_put`` — device-to-device placement has no tunnel latency to
    hide.  ``sharding`` (e.g. a replicated ``NamedSharding``) is applied to
    every uploaded leaf; ``None`` keeps jax's default placement.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups: dict[str, list[int]] = {}
    out = [None] * len(leaves)
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, np.ndarray) and leaf.dtype != object:
            groups.setdefault(str(leaf.dtype), []).append(i)
        elif isinstance(leaf, (bool, int, float, np.generic)):
            # scalars: a single tiny transfer each is fine, and packing them
            # would quietly promote python ints/floats to a common dtype
            out[i] = jax.device_put(leaf, sharding)
        elif isinstance(leaf, jax.Array) and sharding is not None:
            out[i] = jax.device_put(leaf, sharding)
        else:
            out[i] = leaf if sharding is None else jax.device_put(leaf, sharding)

    if groups:
        bufs = {}
        metas = {}  # dtype -> [(leaf index, shape, size), ...]
        for dt, idxs in groups.items():
            flats = [leaves[i].reshape(-1) for i in idxs]
            bufs[dt] = flats[0] if len(flats) == 1 else np.concatenate(flats)
            metas[dt] = [(i, leaves[i].shape, leaves[i].size) for i in idxs]
        dev_bufs = jax.device_put(bufs, sharding)  # ~one transfer per dtype

        def unpack(dbufs):
            res = {}
            for dt, entries in metas.items():
                off = 0
                for i, shape, size in entries:
                    res[i] = jax.lax.slice(dbufs[dt], (off,), (off + size,)).reshape(shape)
                    off += size
            return res

        unpacked = jax.jit(unpack, out_shardings=sharding)(dev_bufs)
        for i, arr in unpacked.items():
            out[i] = arr
    return jax.tree_util.tree_unflatten(treedef, out)
