"""Device mesh and sharding utilities — the framework's distributed backend.

Capability parity with the reference's distributed story (Lightning DDP over
NCCL, ``configs/trainer/ddp.yaml``, SURVEY §2.10) re-expressed TPU-natively:
one ``jax.sharding.Mesh`` with a ``data`` axis over all devices (ICI within a
slice, DCN across slices), params replicated / batch sharded with
``NamedSharding``, gradient all-reduce implicit in the jitted train step, and
``jax.process_index() == 0`` gating replacing Lightning's rank-zero checks.

The mesh generalizes beyond DP: ``create_mesh`` accepts an arbitrary axis
spec (e.g. ``{'data': -1, 'model': 4}``) so tensor/fsdp-style layouts can be
expressed for larger backbones.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any


def initialize_distributed():
    """Initialize multi-process JAX if launched under a multi-host runtime."""
    import os

    if "COORDINATOR_ADDRESS" in os.environ and jax.process_count() == 1:
        jax.distributed.initialize()


def create_mesh(
    axes: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a mesh. Default: all devices on one 'data' axis.

    ``axes`` maps axis name -> size; one axis may be -1 (inferred). Axis order
    follows dict order; the trailing axis should map onto ICI-adjacent
    devices for bandwidth-heavy collectives.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axes:
        axes = {"data": len(devices)}
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    grid = np.asarray(devices).reshape(sizes)
    return Mesh(grid, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: PyTree, axis: str = "data") -> PyTree:
    """Place a host batch with the leading dim sharded over ``axis``.

    Single-process: a plain ``device_put`` with a ``NamedSharding``.
    Multi-process: the batch arrays are *process-local* shards (each host
    loads its own file shard — see ``SC09DataLoader(num_shards=...)``), so a
    global array is assembled with ``jax.make_array_from_process_local_data``;
    ``device_put`` over non-addressable devices would raise. Shapes returned
    are **global** in both cases.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: PyTree) -> PyTree:
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def fsdp_sharding(mesh: Mesh, tree: PyTree, axis: str = "data", min_size: int = 2**14) -> PyTree:
    """Zero-3/FSDP-style parameter sharding specs for a pytree.

    Each array larger than ``min_size`` elements is sharded along its largest
    dimension divisible by the axis size; everything else is replicated. XLA
    inserts the all-gathers in the forward/backward pass and the
    reduce-scatters for the gradients — no explicit collectives needed.
    """
    n = mesh.shape[axis]

    def spec_for(x) -> NamedSharding:
        shape = getattr(x, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        # largest divisible dim
        cands = [(d, i) for i, d in enumerate(shape) if d % n == 0]
        if not cands:
            return NamedSharding(mesh, P())
        _, idx = max(cands)
        parts: list = [None] * len(shape)
        parts[idx] = axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(spec_for, tree)


def shard_params_fsdp(
    mesh: Mesh, params: PyTree, axis: str = "data", min_size: int = 2**14
) -> PyTree:
    """Device-put params with FSDP sharding specs."""
    specs = fsdp_sharding(mesh, params, axis, min_size)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, specs)


def is_main_process() -> bool:
    """Rank-zero gating for side effects (wav/snapshot/ckpt writes)."""
    return jax.process_index() == 0
