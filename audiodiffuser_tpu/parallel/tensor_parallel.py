"""Tensor parallelism: megatron-style sharding rules for transformer params.

Beyond the reference (DDP-only); the TPU-native TP recipe is declarative:
annotate each parameter with a ``NamedSharding`` over a ``model`` mesh axis
— column-parallel for the input projections (q/kv/context and the first MLP
matmul: output dim sharded) and row-parallel for the output projections
(``to_out`` and the second MLP matmul: input dim sharded) — and let GSPMD
propagate activation shardings and insert the all-reduces. Under this rule
pair the attention/MLP inner activations stay sharded over heads/hidden and
only one all-reduce per block is needed, riding ICI.

``TP_RULES_TRANSFORMER`` matches the naming used by ``models.attention`` and
``models.dit``; pass custom rules for other backbones. Parameters whose
matched dim does not divide the axis size are left replicated (printed).
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, dim to shard over the model axis)
TP_RULES_TRANSFORMER: Tuple[Tuple[str, int], ...] = (
    (r"(to_q|to_kv|to_context)/kernel$", 1),  # column parallel
    (r"to_out/kernel$", 0),  # row parallel
    (r"mlp/Dense_0/kernel$", 1),
    (r"mlp/Dense_1/kernel$", 0),
)

# Conv-UNet rules (the flagship SC09 backbone, models/unet2d.py). Each
# ResnetBlock is the megatron pair: Block_0's 3x3 conv column-parallel
# (HWIO dim 3 = Cout sharded), Block_1's row-parallel (dim 2 = Cin sharded,
# all-reduce after). Between them, Block_1's GroupNorm runs on the sharded
# channels (groups are whole per shard when groups % tp == 0, so stats stay
# local) with its per-channel scale/bias sharded to match; Block_0's conv
# bias is per-Cout likewise. The imagen FeedForward is the standard MLP pair
# with its inner g-only LayerNorm sharded over the hidden dim.
TP_RULES_UNET: Tuple[Tuple[str, int], ...] = TP_RULES_TRANSFORMER + (
    (r"Block_0/Conv_0/kernel$", 3),
    (r"Block_0/Conv_0/bias$", 0),
    (r"Block_1/GroupNorm_0/(scale|bias)$", 0),
    (r"Block_1/Conv_0/kernel$", 2),
    (r"FeedForward_0/Dense_0/kernel$", 1),
    (r"FeedForward_0/ImagenLayerNorm_1/g$", 0),
    (r"FeedForward_0/Dense_1/kernel$", 0),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "name", None))
        parts.append(str(key) if key is not None else str(p))
    return "/".join(parts)


def tp_shardings(
    mesh: Mesh,
    params,
    rules: Sequence[Tuple[str, int]] = TP_RULES_TRANSFORMER,
    axis: str = "model",
    verbose: bool = False,
):
    """Pytree of NamedShardings: rule-matched kernels sharded over ``axis``
    on the rule's dim, everything else replicated."""
    size = mesh.shape[axis]
    compiled = [(re.compile(pat), dim) for pat, dim in rules]

    def one(path, leaf):
        name = _path_str(path)
        for pat, dim in compiled:
            if pat.search(name):
                if leaf.ndim > dim and leaf.shape[dim] % size == 0:
                    spec = [None] * leaf.ndim
                    spec[dim] = axis
                    return NamedSharding(mesh, P(*spec))
                if verbose:
                    print(f"[tp] {name}: dim {dim} !% {size}, replicating")
                break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_tp(
    mesh: Mesh,
    params,
    rules: Sequence[Tuple[str, int]] = TP_RULES_TRANSFORMER,
    axis: str = "model",
):
    """Place ``params`` with megatron TP shardings (GSPMD handles the rest)."""
    return jax.tree.map(
        jax.device_put, params, tp_shardings(mesh, params, rules, axis)
    )
