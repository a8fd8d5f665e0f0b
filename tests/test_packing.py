"""device_get_packed must be an exact drop-in for jax.device_get.

The checkpoint path (trainer.save_checkpoint / restore_checkpoint /
save_ema_snapshots) fetches the full train state through it; any semantic
drift would corrupt checkpoints, so we assert bit-exact equality against
jax.device_get across dtypes, shapes, nesting, and non-device leaves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodiffuser_tpu.utils.packing import device_get_packed


def _assert_tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype
        assert x.shape == y.shape
        np.testing.assert_array_equal(x, y)


def test_roundtrip_mixed_dtypes_and_nesting():
    key = jax.random.key(0)
    tree = {
        "params": {
            "w": jax.random.normal(key, (17, 33), jnp.float32),
            "b": jnp.zeros((33,), jnp.float32),
            "emb": jax.random.normal(key, (5, 4), jnp.bfloat16),
        },
        "step": jnp.asarray(123, jnp.int32),
        "nitem": jnp.asarray(2**40, jnp.int64)
        if jax.config.jax_enable_x64
        else jnp.asarray(99, jnp.int32),
        "flags": jnp.asarray([True, False, True]),
        "nested": [jnp.arange(7, dtype=jnp.float32), (jnp.ones((2, 3, 4)),)],
    }
    got = device_get_packed(tree)
    want = jax.device_get(tree)
    _assert_tree_equal(got, want)
    # every fetched leaf is host numpy
    for leaf in jax.tree_util.tree_leaves(got):
        assert isinstance(leaf, np.ndarray)


def test_scalar_and_empty_leaves():
    tree = {
        "zero_d": jnp.asarray(3.5),
        "empty": jnp.zeros((0, 8), jnp.float32),
        "one": jnp.asarray([7], jnp.int32),
    }
    got = device_get_packed(tree)
    want = jax.device_get(tree)
    _assert_tree_equal(got, want)
    assert got["zero_d"].shape == ()
    assert got["empty"].shape == (0, 8)


def test_non_device_leaves_pass_through():
    arr = np.arange(6).reshape(2, 3)
    tree = {"np": arr, "py": 4.25, "dev": jnp.ones((3,))}
    got = device_get_packed(tree)
    assert got["np"] is arr
    assert got["py"] == 4.25
    np.testing.assert_array_equal(np.asarray(got["dev"]), np.ones((3,)))


def test_empty_tree():
    assert device_get_packed({}) == {}
    assert device_get_packed([]) == []


def test_single_leaf():
    x = jnp.arange(10, dtype=jnp.float32).reshape(2, 5)
    got = device_get_packed(x)
    np.testing.assert_array_equal(got, np.arange(10, dtype=np.float32).reshape(2, 5))


def test_matches_device_get_on_trainstate_like_tree():
    """Shape of the real checkpoint payload: params + m/v + ema profiles."""
    key = jax.random.key(1)
    params = {
        f"layer_{i}": {
            "kernel": jax.random.normal(jax.random.fold_in(key, i), (8, 8)),
            "bias": jnp.zeros((8,)),
        }
        for i in range(12)
    }
    tree = {
        "step": jnp.asarray(7200, jnp.int32),
        "params": params,
        "opt_state": {"m": params, "v": params, "count": jnp.asarray(7200)},
        "ema_state": {"p05": params, "p10": params},
        "best_val_loss": jnp.asarray(0.42, jnp.float32),
    }
    _assert_tree_equal(device_get_packed(tree), jax.device_get(tree))


def test_packed_buffers_survive_source_deletion():
    """pack_tree must allocate fresh device buffers: the donated train step
    invalidates the source arrays while the background checkpoint writer is
    still draining the packed copies."""
    from audiodiffuser_tpu.utils.packing import pack_tree, unpack_tree

    src = {
        "many": [jnp.full((4, 5), float(i)) for i in range(3)],
        "lone_int": jnp.asarray(42, jnp.int32),  # singleton dtype group
    }
    packed, spec = pack_tree(src)
    for leaf in jax.tree_util.tree_leaves(src):
        leaf.delete()  # simulate donation invalidating the source
    got = unpack_tree(jax.device_get(packed), spec)
    for i in range(3):
        np.testing.assert_array_equal(got["many"][i], np.full((4, 5), float(i)))
    assert got["lone_int"] == 42


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float16])
def test_dtype_preserved(dtype):
    x = {"a": jnp.asarray([1.5, 2.5], dtype), "b": jnp.asarray([[4.0]], dtype)}
    got = device_get_packed(x)
    assert got["a"].dtype == np.dtype(jnp.dtype(dtype))
    assert got["b"].dtype == np.dtype(jnp.dtype(dtype))


# -- device_put_packed (h2d mirror, used by trainer._place_state) -------------


def _host_trainstate_like_tree():
    rng = np.random.default_rng(3)
    params = {
        f"layer_{i}": {
            "kernel": rng.standard_normal((8, 8)).astype(np.float32),
            "bias": np.zeros((8,), np.float32),
            "half": rng.standard_normal((4,)).astype(np.float16),
        }
        for i in range(12)
    }
    return {
        "step": np.asarray(7200, np.int32),
        "params": params,
        "opt_state": {"m": params, "v": params, "count": np.asarray(7200)},
        "flags": np.asarray([True, False]),
        "py_scalar": 4,
        "best_val_loss": np.asarray(0.42, np.float32),
    }


def test_device_put_packed_matches_device_put():
    from audiodiffuser_tpu.utils.packing import device_put_packed

    tree = _host_trainstate_like_tree()
    got = device_put_packed(tree)
    want = jax.device_put(tree)
    _assert_tree_equal(jax.device_get(got), jax.device_get(want))
    # all numpy-array leaves landed on device
    la, _ = jax.tree_util.tree_flatten(got)
    for leaf in la:
        assert isinstance(leaf, jax.Array)


def test_device_put_packed_with_sharding():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from audiodiffuser_tpu.utils.packing import device_put_packed

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    sh = NamedSharding(mesh, PartitionSpec())
    tree = _host_trainstate_like_tree()
    got = device_put_packed(tree, sh)
    want = jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    _assert_tree_equal(jax.device_get(got), jax.device_get(want))
    for leaf in jax.tree_util.tree_leaves(got):
        if isinstance(leaf, jax.Array):
            assert leaf.sharding.is_equivalent_to(sh, leaf.ndim)


def test_device_put_packed_mixed_device_and_host_leaves():
    """Fresh-init path: leaves already on device pass through untouched."""
    from audiodiffuser_tpu.utils.packing import device_put_packed

    tree = {
        "dev": jnp.arange(6, dtype=jnp.float32),
        "host": np.full((2, 3), 2.5, np.float32),
        "empty": np.zeros((0, 4), np.float32),
        "zero_d": np.asarray(1.25, np.float32),
    }
    got = device_put_packed(tree)
    _assert_tree_equal(jax.device_get(got), jax.device_get(tree))
    assert got["empty"].shape == (0, 4)
    assert got["zero_d"].shape == ()
