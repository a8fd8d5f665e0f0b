"""Fused GroupNorm+FiLM+SiLU+conv3x3 Pallas kernel (ops/fused_block.py).

Interpret-mode parity against the XLA reference at flagship Block shapes,
including multi-slab halo DMA, FiLM on/off, and the custom-VJP backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodiffuser_tpu.ops.fused_block import (
    _ref_block,
    fused_affine_silu_conv3x3,
    fused_gn_film_silu_conv3x3,
    gn_film_affine,
)


def _mk(shape, co, key, film):
    kx, kw, kb, kg, ks = jax.random.split(jax.random.key(key), 5)
    b, h, w, c = shape
    x = jax.random.normal(kx, shape, jnp.float32)
    wk = jax.random.normal(kw, (3, 3, c, co), jnp.float32) * 0.1
    bias = jax.random.normal(kb, (co,), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(kg, (c,))
    beta = 0.1 * jax.random.normal(kg, (c,))
    if film:
        scale = 1.0 + 0.1 * jax.random.normal(ks, (b, 1, 1, c))
        shift = 0.1 * jax.random.normal(ks, (b, 1, 1, c))
    else:
        scale = shift = None
    return x, gamma, beta, scale, shift, wk, bias


@pytest.mark.parametrize(
    "shape,co,film",
    [
        ((2, 32, 16, 16), 16, True),    # whole-image slab
        ((2, 32, 16, 16), 16, False),
        ((1, 64, 8, 8), 8, True),       # forces multi-slab halo path
    ],
)
def test_fused_block_forward_parity(shape, co, film, monkeypatch):
    monkeypatch.setenv("ADT_FUSED_BLOCK_INTERPRET", "1")
    # shrink the slab budget so the 64-row case exercises the halo DMA
    monkeypatch.setenv("ADT_FUSED_BLOCK_TH", "16")
    x, gamma, beta, scale, shift, wk, bias = _mk(shape, co, 7, film)
    groups = 4
    ref = _ref_block(x, gamma, beta, scale, shift, wk, bias, groups)
    got = fused_gn_film_silu_conv3x3(
        x, gamma, beta, scale, shift, wk, bias, groups
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,  # bf16 kernel vs fp32-ish reference
    )


def test_fused_affine_matches_gn_fold(monkeypatch):
    """gn_film_affine fold == explicit GN+FiLM, checked in fp32."""
    x, gamma, beta, scale, shift, wk, bias = _mk((2, 16, 8, 16), 8, 3, True)
    groups = 4
    a, b = gn_film_affine(x, gamma, beta, groups, scale, shift)
    fold = x * a[:, None, None, :] + b[:, None, None, :]
    bsz, h, w, c = x.shape
    xg = x.reshape(bsz, h * w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3))
    rstd = jax.lax.rsqrt(
        jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean) + 1e-5
    )
    xn = (xg - mean[:, None, :, None]) * rstd[:, None, :, None]
    xn = xn.reshape(x.shape) * gamma + beta
    xn = xn * scale.reshape(bsz, 1, 1, c) + shift.reshape(bsz, 1, 1, c)
    np.testing.assert_allclose(np.asarray(fold), np.asarray(xn), rtol=2e-4, atol=2e-4)


def test_fused_block_backward_parity(monkeypatch):
    monkeypatch.setenv("ADT_FUSED_BLOCK_INTERPRET", "1")
    x, gamma, beta, scale, shift, wk, bias = _mk((1, 16, 8, 16), 8, 11, True)
    groups = 4

    def loss_fused(x, wk, gamma):
        return jnp.sum(
            fused_gn_film_silu_conv3x3(x, gamma, beta, scale, shift, wk, bias, groups)
            ** 2
        )

    def loss_ref(x, wk, gamma):
        return jnp.sum(
            _ref_block(x, gamma, beta, scale, shift, wk, bias, groups) ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, wk, gamma)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wk, gamma)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=0.08, atol=0.08
        )


def test_affine_silu_conv_slab_halo(monkeypatch):
    """Multi-slab output must be identical to single-slab (halo correctness)."""
    monkeypatch.setenv("ADT_FUSED_BLOCK_INTERPRET", "1")
    x = jax.random.normal(jax.random.key(0), (2, 32, 8, 8), jnp.float32)
    a = jnp.ones((2, 8)) * 1.3
    b = jnp.ones((2, 8)) * 0.1
    wk = jax.random.normal(jax.random.key(1), (3, 3, 8, 8)) * 0.2
    monkeypatch.setenv("ADT_FUSED_BLOCK_TH", "32")
    whole = fused_affine_silu_conv3x3(x, a, b, wk)
    monkeypatch.setenv("ADT_FUSED_BLOCK_TH", "8")
    slabbed = fused_affine_silu_conv3x3(x, a, b, wk)
    np.testing.assert_allclose(
        np.asarray(whole, np.float32), np.asarray(slabbed, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_block_fused_path_param_and_output_compat(monkeypatch):
    """Block with the fused kernel must expose the same param tree as the
    composite XLA path (checkpoint interchange) and match its output."""
    from audiodiffuser_tpu.models.layers import Block

    x = jax.random.normal(jax.random.key(2), (2, 16, 8, 16), jnp.float32)
    ss = (
        0.1 * jax.random.normal(jax.random.key(3), (2, 1, 1, 16)),
        0.1 * jax.random.normal(jax.random.key(4), (2, 1, 1, 16)),
    )
    blk = Block(8, groups=4)

    monkeypatch.delenv("ADT_FUSED_BLOCK_INTERPRET", raising=False)
    p_ref = blk.init(jax.random.key(5), x, scale_shift=ss)
    y_ref = blk.apply(p_ref, x, scale_shift=ss)

    monkeypatch.setenv("ADT_FUSED_BLOCK_INTERPRET", "1")
    p_fused = blk.init(jax.random.key(5), x, scale_shift=ss)
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(
        p_fused
    )
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        assert a.shape == b.shape
    # same params through the fused kernel
    y_fused = blk.apply(p_ref, x, scale_shift=ss)
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_ref, np.float32),
        rtol=0.05, atol=0.05,
    )
