"""W8A8 int8 conv for the sampling fast path (ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.ops.quant import (
    int8_conv,
    quantize_activation,
    quantize_weight,
)


def test_weight_quant_roundtrip_error():
    w = jax.random.normal(jax.random.key(0), (3, 3, 16, 8)) * 0.3
    wq, ws = quantize_weight(w)
    assert wq.dtype == jnp.int8 and ws.shape == (8,)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(ws) - np.asarray(w))
    # symmetric absmax: error bounded by half an LSB per channel
    assert (err <= np.asarray(ws) * 0.5 + 1e-7).all()


def test_activation_quant_roundtrip_error():
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 16))
    xq, xs = quantize_activation(x)
    err = np.abs(np.asarray(xq, np.float32) * float(xs) - np.asarray(x))
    assert (err <= float(xs) * 0.5 + 1e-7).all()


def test_int8_conv_close_to_fp():
    k1, k2 = jax.random.split(jax.random.key(2))
    x = jax.random.normal(k1, (2, 16, 8, 32), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 32, 32)) * 0.1
    bias = jnp.ones((32,)) * 0.05
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    got = int8_conv(x, w, bias)
    ref_n = np.asarray(ref)
    rms = np.sqrt(np.mean((np.asarray(got, np.float32) - ref_n) ** 2))
    scale_ref = np.sqrt(np.mean(ref_n**2))
    # W8A8 double-quant noise: ~1% relative RMS at these magnitudes
    assert rms / scale_ref < 0.03, (rms, scale_ref)


def test_int8_conv_ste_gradient_matches_fp_conv():
    k1, k2 = jax.random.split(jax.random.key(3))
    x = jax.random.normal(k1, (1, 8, 8, 16), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 16, 16)) * 0.1
    bias = jnp.zeros((16,))

    gq = jax.grad(lambda x, w: jnp.sum(int8_conv(x, w, bias) ** 2), argnums=(0, 1))
    # STE backward = the fp conv VJP applied to g = 2*y_q (the quantised
    # forward's cotangent), so compare against the fp VJP with that same g
    yq = int8_conv(x, w, bias)

    def fp_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bias

    _, vjp = jax.vjp(fp_conv, x, w)
    want = vjp(2.0 * yq)
    got = gq(x, w)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_block_int8_path_param_compat(monkeypatch):
    """ADT_INT8=1 must keep the Block param tree identical (ckpt interchange)
    and produce outputs close to the fp path."""
    from audiodiffuser_tpu.models.layers import Block

    x = jax.random.normal(jax.random.key(4), (2, 16, 8, 128), jnp.float32)
    blk = Block(128, groups=8)
    p_ref = blk.init(jax.random.key(5), x)
    y_ref = blk.apply(p_ref, x)

    monkeypatch.setenv("ADT_INT8", "1")
    p_q = blk.init(jax.random.key(5), x)
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(p_q)
    y_q = blk.apply(p_ref, x)
    ref = np.asarray(y_ref, np.float32)
    rms = np.sqrt(np.mean((np.asarray(y_q, np.float32) - ref) ** 2))
    assert rms / (np.sqrt(np.mean(ref**2)) + 1e-9) < 0.03
