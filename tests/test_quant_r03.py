"""Round-3 int8 serving-path extensions (ops/quant.py, models/layers.py):
W8A8 dense for attention/FF projections, up/downsample seam convs, s8
activation storage, and the clustered fused stem."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.ops.quant import (
    int8_dense,
    quant_store,
    stats_to_scales,
)


def _rel_rms(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-9)


def test_int8_dense_close_to_fp():
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (4, 32, 128), jnp.float32)
    w = jax.random.normal(k2, (128, 256)) * 0.1
    ref = jnp.einsum("...i,io->...o", x, w)
    got = int8_dense(x, w)
    assert got.shape == ref.shape
    assert 0 < _rel_rms(got, ref) < 0.03


def test_int8_dense_static_scale_and_ste_gradient():
    k1, k2 = jax.random.split(jax.random.key(1))
    x = jax.random.normal(k1, (2, 16, 128), jnp.float32)
    w = jax.random.normal(k2, (128, 128)) * 0.1
    scale = jnp.max(jnp.abs(x)) / 127.0
    got = int8_dense(x, w, act_scale=scale)
    ref = jnp.einsum("...i,io->...o", x, w)
    assert _rel_rms(got, ref) < 0.03

    # STE backward: fp matmul VJP applied to the quantised forward's cotangent
    gq = jax.grad(lambda x, w: jnp.sum(int8_dense(x, w) ** 2), argnums=(0, 1))
    yq = int8_dense(x, w)
    _, vjp = jax.vjp(lambda x, w: jnp.einsum("...i,io->...o", x, w), x, w)
    want = vjp(2.0 * yq)
    for a, b in zip(gq(x, w), want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_quantdense_param_tree_and_paths(monkeypatch):
    """QuantDense == nn.Dense param tree; exact fp match with int8 off;
    close (and actually quantised) under ADT_INT8=1 at lane-aligned dims."""
    import flax.linen as nn

    from audiodiffuser_tpu.models.layers import QuantDense

    x = jax.random.normal(jax.random.key(2), (2, 64, 128))
    ref_mod = nn.Dense(256, use_bias=False, name="d")
    q_mod = QuantDense(256, use_bias=False, name="d")
    p = ref_mod.init(jax.random.key(3), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        q_mod.init(jax.random.key(3), x)
    )
    np.testing.assert_allclose(
        np.asarray(q_mod.apply(p, x)), np.asarray(ref_mod.apply(p, x)),
        rtol=1e-6, atol=1e-6,
    )

    monkeypatch.setenv("ADT_INT8", "1")
    monkeypatch.setenv("ADT_INT8_DENSE", "1")  # opt-in tier (v5e ablation)
    y_q = q_mod.apply(p, x)
    r = _rel_rms(y_q, ref_mod.apply(p, x))
    assert 0 < r < 0.03, r

    # non-lane-aligned shapes stay on the fp path even with int8 on
    x_odd = jax.random.normal(jax.random.key(4), (2, 8, 96))
    mod_odd = QuantDense(96, use_bias=True, name="d2")
    p_odd = mod_odd.init(jax.random.key(5), x_odd)
    ref_odd = jnp.einsum("...i,io->...o", x_odd, p_odd["params"]["kernel"]) + (
        p_odd["params"]["bias"]
    )
    np.testing.assert_allclose(
        np.asarray(mod_odd.apply(p_odd, x_odd)), np.asarray(ref_odd),
        rtol=1e-5, atol=1e-6,
    )


def test_quant_store_roundtrip_and_ste():
    y = jax.random.normal(jax.random.key(6), (2, 8, 8, 16))
    scale = jnp.max(jnp.abs(y)) / 127.0
    q = quant_store(y, scale)
    # snapped onto the s8 grid: error <= half an LSB, values integral in grid
    err = np.abs(np.asarray(q, np.float32) - np.asarray(y, np.float32))
    assert (err <= float(scale) * 0.5 + 1e-7).all()
    grid = np.asarray(q, np.float32) / float(scale)
    np.testing.assert_allclose(grid, np.round(grid), atol=1e-4)
    # straight-through gradient
    g = jax.grad(lambda y: jnp.sum(quant_store(y, scale) * 3.0))(y)
    np.testing.assert_allclose(np.asarray(g), 3.0)


def test_stats_to_scales_renames_out_absmax():
    stats = {"mod": {"act_absmax": (jnp.asarray(12.7),),
                     "out_absmax": (jnp.asarray(25.4),)}}
    scales = stats_to_scales(stats)
    assert set(scales["mod"]) == {"act_scale", "out_scale"}
    np.testing.assert_allclose(float(scales["mod"]["act_scale"]), 0.1)
    np.testing.assert_allclose(float(scales["mod"]["out_scale"]), 0.2)


def test_stem_cluster_parity(monkeypatch):
    """The clustered fused stem must reproduce the unfused multi-branch stem
    exactly (same math, different evaluation grouping)."""
    from audiodiffuser_tpu.models.layers import CrossEmbedLayer

    x = jax.random.normal(jax.random.key(7), (2, 32, 16, 2))
    mod = CrossEmbedLayer(dim_out=64, kernel_sizes=(3, 7, 15), stride=2)
    p = mod.init(jax.random.key(8), x)

    monkeypatch.setenv("ADT_FUSED_STEM", "0")
    y_unfused = mod.apply(p, x)

    monkeypatch.setenv("ADT_FUSED_STEM", "1")
    monkeypatch.setenv("ADT_STEM_CLUSTER", "0")  # all-in-one max-kernel (default)
    y_allinone = mod.apply(p, x)

    monkeypatch.setenv("ADT_STEM_CLUSTER", "1")  # clustered (opt-in)
    y_cluster = mod.apply(p, x)

    np.testing.assert_allclose(
        np.asarray(y_allinone), np.asarray(y_unfused), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(y_cluster), np.asarray(y_unfused), rtol=1e-5, atol=1e-5
    )


def test_seam_conv_int8_paths(monkeypatch):
    """Upsample (pixel-shuffle, lhs-dilated) and Downsample (space-to-depth)
    keep their param trees and stay close to fp under the int8 seam path."""
    from audiodiffuser_tpu.models.layers import Downsample, PixelShuffleUpsample

    x = jax.random.normal(jax.random.key(9), (2, 16, 8, 128)) * 0.5

    for mod in (PixelShuffleUpsample(dim_out=128), Downsample(dim_out=128)):
        p = mod.init(jax.random.key(10), x)
        y_fp = mod.apply(p, x)

        monkeypatch.setenv("ADT_INT8", "1")
        monkeypatch.setenv("ADT_INT8_SEAM", "1")
        assert jax.tree_util.tree_structure(
            mod.init(jax.random.key(10), x)["params"]
        ) == jax.tree_util.tree_structure(p["params"])
        y_q = mod.apply(p, x)
        r = _rel_rms(y_q, y_fp)
        assert 0 < r < 0.03, (type(mod).__name__, r)

        # seam opt-out restores the exact fp path
        monkeypatch.setenv("ADT_INT8_SEAM", "0")
        np.testing.assert_allclose(
            np.asarray(mod.apply(p, x)), np.asarray(y_fp), rtol=1e-6, atol=1e-6
        )
        monkeypatch.delenv("ADT_INT8")


def test_block_int8_store(monkeypatch):
    """ADT_INT8_STORE snaps Block conv outputs onto a calibrated s8 grid:
    with a bound out_scale the output is on the grid; without one the
    absmax is sown into quant_stats."""
    from audiodiffuser_tpu.models.layers import Block

    x = jax.random.normal(jax.random.key(11), (2, 16, 8, 128), jnp.float32)
    blk = Block(128, groups=8)
    p = blk.init(jax.random.key(12), x)
    y_fp = blk.apply(p, x)

    monkeypatch.setenv("ADT_INT8", "1")
    monkeypatch.setenv("ADT_INT8_STORE", "1")
    # calibration pass: sows act_absmax + out_absmax into quant_stats
    y_cal, aux = blk.apply(p, x, mutable=["quant_stats"])
    scales = stats_to_scales(aux["quant_stats"])
    flat = jax.tree_util.tree_leaves_with_path(scales)
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("out_scale" in n for n in names), names

    # serving pass: quant collection bound -> output snapped onto the grid
    y_q = blk.apply({**p, "quant": scales}, x)
    assert _rel_rms(y_q, y_fp) < 0.06
