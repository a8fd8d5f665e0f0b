"""UNet2dBase backbone tests: shapes, init behavior, CFG paths, jit."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodiffuser_tpu.models.unet2d import UNet2dBase

# miniature version of the SC09 flagship config (dim 128 -> 16 for test speed)
NET = UNet2dBase(
    dim=16,
    num_classes=10,
    dim_mults=[1, 2, 2],
    channels=2,
    num_resnet_blocks=2,
    resnet_groups=8,
    layer_attns=[False, False, True],
    layer_cross_attns=[False, False, True],
    attn_heads=2,
    ff_mult=2.0,
    memory_efficient=True,
)

X = jax.random.normal(jax.random.key(0), (2, 32, 16, 2))
TIME = jnp.asarray([-0.5, 0.3])
CLASSES = jnp.asarray([1, 7])


@pytest.fixture(scope="module")
def params():
    return NET.init(jax.random.key(1), X, TIME, classes=CLASSES)["params"]


def test_output_shape_and_zero_init(params):
    out = NET.apply({"params": params}, X, TIME, classes=CLASSES)
    assert out.shape == X.shape
    # final conv is zero-init -> output must be exactly zero at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_cfg_mask_equals_scalar_drop(params):
    """cond_drop_mask=all-True must equal cond_drop_prob=1 (all null)."""
    p = {"params": params}
    out_prob1 = NET.apply(p, X, TIME, classes=CLASSES, cond_drop_prob=1.0)
    out_mask = NET.apply(
        p, X, TIME, classes=CLASSES, cond_drop_mask=jnp.ones(2, dtype=bool)
    )
    np.testing.assert_allclose(np.asarray(out_prob1), np.asarray(out_mask), atol=1e-6)

    out_prob0 = NET.apply(p, X, TIME, classes=CLASSES, cond_drop_prob=0.0)
    out_mask0 = NET.apply(
        p, X, TIME, classes=CLASSES, cond_drop_mask=jnp.zeros(2, dtype=bool)
    )
    np.testing.assert_allclose(np.asarray(out_prob0), np.asarray(out_mask0), atol=1e-6)


def test_fractional_cond_drop_requires_rng(params):
    p = {"params": params}
    out = NET.apply(
        p, X, TIME, classes=CLASSES, cond_drop_prob=0.5, rngs={"cond": jax.random.key(2)}
    )
    assert out.shape == X.shape


def test_class_conditioning_changes_output():
    """After perturbing params away from zero-init, classes must matter."""
    params = NET.init(jax.random.key(1), X, TIME, classes=CLASSES)["params"]
    params = jax.tree.map(
        lambda a: a + 0.01 * jnp.ones_like(a), params
    )
    p = {"params": params}
    out_a = NET.apply(p, X, TIME, classes=jnp.asarray([0, 0]))
    out_b = NET.apply(p, X, TIME, classes=jnp.asarray([5, 5]))
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-6


def test_jit_and_grad(params):
    @jax.jit
    def loss_fn(params, x):
        out = NET.apply({"params": params}, x, TIME, classes=CLASSES)
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(params, X)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)


def test_non_memory_efficient_and_text():
    net = UNet2dBase(
        dim=16,
        num_classes=0,
        dim_mults=[1, 2],
        channels=2,
        num_resnet_blocks=1,
        resnet_groups=4,
        layer_attns=[False, True],
        layer_cross_attns=[False, True],
        attn_heads=2,
        memory_efficient=False,
        cond_on_text=True,
        text_embed_dim=32,
        max_text_len=4,
        pixel_shuffle_upsample=False,
    )
    text = jax.random.normal(jax.random.key(3), (2, 3, 32))
    tmask = jnp.asarray([[1, 1, 0], [1, 0, 0]], dtype=bool)
    variables = net.init(jax.random.key(4), X, TIME, text_embeds=text, text_mask=tmask)
    out = net.apply(variables, X, TIME, text_embeds=text, text_mask=tmask)
    assert out.shape == X.shape


def test_imagen_layernorm_matches_torch_semantics():
    """g-only LayerNorm with biased variance (reference layer_utils.py:14-32)."""
    import torch

    from audiodiffuser_tpu.models.layers import ImagenLayerNorm

    x = np.random.default_rng(0).standard_normal((2, 5, 8)).astype(np.float32)
    ln = ImagenLayerNorm()
    variables = ln.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(ln.apply(variables, jnp.asarray(x)))

    tx = torch.from_numpy(x)
    var = torch.var(tx, dim=-1, unbiased=False, keepdim=True)
    mean = torch.mean(tx, dim=-1, keepdim=True)
    expect = ((tx - mean) * (var + 1e-5).rsqrt()).numpy()  # g == 1 at init
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_downsample_single_conv_parity():
    """Downsample = ONE 2x2 stride-2 conv, exactly the old
    space-to-depth + 1x1 conv (profile: the transpose was the #1 HBM op)."""
    from audiodiffuser_tpu.models.layers import Downsample

    x = jax.random.normal(jax.random.key(40), (2, 8, 6, 5))
    m = Downsample(7)
    p = m.init(jax.random.key(41), x)
    kern = p["params"]["Conv_0"]["kernel"]
    bias = p["params"]["Conv_0"]["bias"]
    assert kern.shape == (1, 1, 20, 7)  # unchanged checkpoint layout
    b, h, w, c = x.shape
    xs = (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 5, 2, 4)
        .reshape(b, h // 2, w // 2, c * 4)
    )
    old = (
        jax.lax.conv_general_dilated(
            xs, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + bias
    )
    np.testing.assert_allclose(
        np.asarray(m.apply(p, x)), np.asarray(old), rtol=1e-5, atol=1e-5
    )


def test_pixel_shuffle_upsample_single_conv_parity():
    """PixelShuffleUpsample = ONE 2x2 lhs-dilated conv + subpixel bias + SiLU,
    exactly the old 1x1 conv + SiLU + depth-to-space."""
    import flax.linen as nn
    from audiodiffuser_tpu.models.layers import PixelShuffleUpsample

    x = jax.random.normal(jax.random.key(42), (2, 4, 3, 6))
    m = PixelShuffleUpsample(5)
    p = m.init(jax.random.key(43), x)
    kern = p["params"]["Conv_0"]["kernel"]
    bias = p["params"]["Conv_0"]["bias"]
    assert kern.shape == (1, 1, 6, 20)  # unchanged checkpoint layout
    y = (
        jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + bias
    )
    y = nn.silu(y)
    b, h, w, _ = x.shape
    y = (
        y.reshape(b, h, w, 5, 2, 2)
        .transpose(0, 1, 4, 2, 5, 3)
        .reshape(b, 2 * h, 2 * w, 5)
    )
    np.testing.assert_allclose(
        np.asarray(m.apply(p, x)), np.asarray(y), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("stride,ks", [(1, (3, 7, 15)), (2, (2, 4))])
def test_cross_embed_fused_single_conv_parity(stride, ks):
    """CrossEmbedLayer = ONE conv with zero-embedded branch kernels, exactly
    the old per-branch convs + concat (profile: stem was ~7% of sampling)."""
    from audiodiffuser_tpu.models.layers import CrossEmbedLayer

    x = jax.random.normal(jax.random.key(44), (2, 16, 12, 2))
    m = CrossEmbedLayer(24, kernel_sizes=ks, stride=stride)
    p = m.init(jax.random.key(45), x)
    p = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.key(46), a.shape), p
    )

    kernel_sizes = sorted(ks)
    n = len(kernel_sizes)
    dim_scales = [24 // (2**i) for i in range(1, n)]
    dim_scales = [*dim_scales, 24 - sum(dim_scales)]
    fmaps = []
    for i, k in enumerate(kernel_sizes):
        pad = (k - stride) // 2
        w = p["params"][f"Conv_{i}"]["kernel"]
        b = p["params"][f"Conv_{i}"]["bias"]
        fmaps.append(
            jax.lax.conv_general_dilated(
                x, w, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )
    old = jnp.concatenate(fmaps, axis=-1)
    np.testing.assert_allclose(
        np.asarray(m.apply(p, x)), np.asarray(old), rtol=2e-5, atol=2e-5
    )
    # ADT_FUSED_STEM=0 selects the composite formulation (used by bench.py
    # for honest analytic-FLOPs counting) — must match both paths exactly
    os.environ["ADT_FUSED_STEM"] = "0"
    try:
        np.testing.assert_allclose(
            np.asarray(m.apply(p, x)), np.asarray(old), rtol=2e-5, atol=2e-5
        )
    finally:
        os.environ.pop("ADT_FUSED_STEM", None)
