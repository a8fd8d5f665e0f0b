"""Winograd F(2x2,3x3) conv: XLA reference and Pallas kernel (interpret
mode) vs lax.conv_general_dilated."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audiodiffuser_tpu.ops.winograd_pallas as wp
from audiodiffuser_tpu.ops.winograd import winograd_conv3x3_xla
from audiodiffuser_tpu.ops.winograd_pallas import (
    polyphase_decompose,
    polyphase_reassemble,
    winograd_conv3x3,
    winograd_eligible,
)


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_xla_winograd_exact_fp32():
    x = jax.random.normal(jax.random.key(0), (2, 8, 6, 5))
    w = jax.random.normal(jax.random.key(1), (3, 3, 5, 7)) * 0.2
    np.testing.assert_allclose(
        winograd_conv3x3_xla(x, w), conv_ref(x, w), rtol=2e-5, atol=2e-5
    )


def test_polyphase_roundtrip():
    x = jax.random.normal(jax.random.key(2), (3, 8, 4, 16))
    phases = polyphase_decompose(x)
    assert phases.shape == (3, 5, 3, 4 * 16)
    # channel group 2i+j holds pad(x,1)[i::2, j::2]; pad shifts parities:
    # group[m,n] = xp[2m+i, 2n+j] = x[2m+i-1, 2n+j-1]
    np.testing.assert_array_equal(phases[:, 1:, 1:, :16], x[:, 1::2, 1::2])
    np.testing.assert_array_equal(phases[:, :-1, :-1, 48:], x[:, 0::2, 0::2])
    # reassemble inverts a [B, th, tw, 4C] channel-major tile layout
    y = jnp.concatenate(
        [x[:, p::2, q::2] for p in range(2) for q in range(2)], axis=-1
    )
    np.testing.assert_array_equal(polyphase_reassemble(y, 3), x)


@pytest.mark.parametrize("shape", [(2, 16, 8, 128, 128), (1, 32, 8, 64, 72)])
def test_pallas_winograd_matches_conv(shape):
    b, h, wd, ci, co = shape
    x = jax.random.normal(jax.random.key(3), (b, h, wd, ci))
    w = jax.random.normal(jax.random.key(4), (3, 3, ci, co)) * 0.05
    got = winograd_conv3x3(x, w, interpret=True)
    ref = conv_ref(x, w)
    # bf16 matmul inputs: tolerance at bf16 resolution of the output scale
    tol = 8e-3 * float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) < tol


def test_pallas_winograd_row_split(monkeypatch):
    monkeypatch.setenv("ADT_WINO_MAX_TILES", "8")
    x = jax.random.normal(jax.random.key(5), (2, 16, 8, 64))
    w = jax.random.normal(jax.random.key(6), (3, 3, 64, 64)) * 0.05
    assert wp._row_split(8, 4, 64, 64) > 1
    got = winograd_conv3x3(x, w, interpret=True)
    ref = conv_ref(x, w)
    tol = 8e-3 * float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) < tol


def test_pallas_winograd_fused_prologue():
    x = jax.random.normal(jax.random.key(7), (1, 8, 8, 64))
    w = jax.random.normal(jax.random.key(8), (3, 3, 64, 64)) * 0.05
    scale = jax.random.normal(jax.random.key(9), (1, 1, 1, 64)) * 0.1 + 1.0
    shift = jax.random.normal(jax.random.key(10), (1, 1, 1, 64)) * 0.1
    ref = conv_ref(jax.nn.silu(x * scale + shift), w)
    got = winograd_conv3x3(x, w, scale=scale, shift=shift, silu=True, interpret=True)
    tol = 8e-3 * float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) < tol


def test_eligibility_gate(monkeypatch):
    ok = ((4, 16, 8, 128), (3, 3, 128, 128))
    # opt-in: measured slower than XLA conv at flagship shapes (docstring)
    assert not winograd_eligible(ok[0], ok[1], (1, 1), "SAME")
    monkeypatch.setenv("ADT_WINOGRAD", "1")
    assert winograd_eligible(ok[0], ok[1], (1, 1), "SAME")
    assert not winograd_eligible((4, 15, 8, 128), (3, 3, 128, 128), (1, 1), "SAME")
    assert not winograd_eligible(ok[0], (3, 3, 128, 128), (2, 2), "SAME")
    assert not winograd_eligible((4, 16, 8, 2), (3, 3, 2, 128), (1, 1), "SAME")
    monkeypatch.setenv("ADT_WINOGRAD", "0")
    assert not winograd_eligible(ok[0], ok[1], (1, 1), "SAME")


def test_block_winograd_wiring(monkeypatch):
    """models.layers.Block routes eligible shapes through the fused kernel
    with nn.Conv-identical params and matching outputs/grads."""
    from audiodiffuser_tpu.models.layers import Block

    x = jax.random.normal(jax.random.key(11), (2, 8, 8, 64))
    ss = (jnp.full((2, 1, 1, 64), 0.3), jnp.full((2, 1, 1, 64), -0.1))
    blk = Block(64, groups=8)

    monkeypatch.setenv("ADT_WINO_INTERPRET", "0")
    params = blk.init(jax.random.key(12), x)
    y_plain = blk.apply(params, x, scale_shift=ss)

    monkeypatch.setenv("ADT_WINO_INTERPRET", "1")
    params_w = blk.init(jax.random.key(12), x)
    # identical parameter structure and init values either way
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_w
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_w)
    ):
        np.testing.assert_array_equal(a, b)

    y_wino = blk.apply(params, x, scale_shift=ss)
    # winograd transforms amplify bf16 rounding ~3x vs a direct bf16 conv
    tol = 3e-2 * float(jnp.abs(y_plain).max())
    assert float(jnp.abs(y_plain - y_wino).max()) < tol

    def loss(p):
        return jnp.sum(blk.apply(p, x, scale_shift=ss) ** 2)

    g_wino = jax.grad(loss)(params)
    monkeypatch.setenv("ADT_WINO_INTERPRET", "0")
    g_plain = jax.grad(loss)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_wino), jax.tree_util.tree_leaves(g_plain)
    ):
        a, b = np.asarray(a), np.asarray(b)
        # forward bf16 error propagates into dL/dy; compare at the grad scale
        assert np.abs(a - b).max() < 3e-2 * max(np.abs(b).max(), 1.0)
