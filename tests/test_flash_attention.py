"""Flash-attention kernel parity tests (interpret mode on CPU): streaming
forward, logsumexp emission, and the fused FlashAttention-2-style backward
kernels (dq / dkv) against XLA autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from audiodiffuser_tpu.models.attention import sdpa_xla
from audiodiffuser_tpu.ops import flash_attention as fa


def _flash_interpret(q, k, v, scale, mask=None):
    """Run the kernel in interpreter mode (no TPU needed)."""
    b, h, n, d = q.shape
    qf, kf, vf = (t.reshape(b * h, -1, d) for t in (q, k, v))
    bias = None
    if mask is not None:
        bias = jnp.where(mask.astype(bool), 0.0, -1e30).astype(jnp.float32)
    out, _ = fa._flash_forward(qf, kf, vf, scale, 128, 128, bias, h, interpret=True)
    return out.reshape(b, h, n, d)


@pytest.mark.parametrize("n,d", [(256, 64), (128, 32)])
def test_flash_matches_xla(n, d):
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 2, n, d))
    k = jax.random.normal(kk, (2, 2, n, d))
    v = jax.random.normal(kv, (2, 2, n, d))
    scale = d**-0.5
    expect = np.asarray(sdpa_xla(q, k, v, scale=scale))
    got = np.asarray(_flash_interpret(q, k, v, scale))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_flash_lse_rows():
    """The forward's logsumexp output matches the XLA computation."""
    q = jax.random.normal(jax.random.key(9), (2, 256, 64))
    k = jax.random.normal(jax.random.key(10), (2, 256, 64))
    v = jax.random.normal(jax.random.key(11), (2, 256, 64))
    _, lse = fa._flash_forward(q, k, v, 0.125, 128, 128, interpret=True)
    s = jnp.einsum("bnd,bmd->bnm", q, k) * 0.125
    expect = jax.nn.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(expect), atol=2e-5)


def test_flash_cross_attention_lengths():
    """n_q != n_k (cross attention)."""
    key = jax.random.key(1)
    q = jax.random.normal(key, (1, 2, 128, 64))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 256, 64))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 256, 64))
    expect = np.asarray(sdpa_xla(q, k, v, scale=0.125))
    got = np.asarray(_flash_interpret(q, k, v, 0.125))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_auto_core_falls_back_on_cpu_and_masks():
    # CPU platform -> always the XLA path; just check numerics flow through
    q = jax.random.normal(jax.random.key(2), (1, 2, 64, 32))
    k = jax.random.normal(jax.random.key(3), (1, 2, 64, 32))
    v = jax.random.normal(jax.random.key(4), (1, 2, 64, 32))
    mask = jnp.ones((1, 64), dtype=bool)
    out = fa.attention_core_auto(q, k, v, mask=mask, scale=0.2)
    expect = sdpa_xla(q, k, v, mask=mask, scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_flash_masked_matches_xla():
    key = jax.random.key(8)
    q = jax.random.normal(key, (2, 2, 128, 32))
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 2, 256, 32))
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 2, 256, 32))
    mask = jnp.arange(256)[None, :] < jnp.asarray([[200], [131]])
    expect = np.asarray(sdpa_xla(q, k, v, mask=mask, scale=0.2))
    got = np.asarray(_flash_interpret(q, k, v, 0.2, mask=mask))
    np.testing.assert_allclose(got, expect, atol=2e-5)


@pytest.mark.parametrize("n_q,n_k,d", [(256, 256, 64), (128, 384, 32)])
def test_flash_backward_kernels(n_q, n_k, d):
    """dq/dkv Pallas kernels match autodiff through the XLA reference."""
    q = jax.random.normal(jax.random.key(5), (2, n_q, d))
    k = jax.random.normal(jax.random.key(6), (2, n_k, d))
    v = jax.random.normal(jax.random.key(7), (2, n_k, d))
    scale = d**-0.5

    def loss_ref(q, k, v):
        return jnp.sum(fa._sdpa_reference(q, k, v, None, scale, 1) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(fa._flash_attention(q, k, v, None, scale, 128, 128, 1) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_flash_backward_masked():
    """Backward kernels with a per-key mask bias (text-KV concat shape)."""
    heads = 2
    q = jax.random.normal(jax.random.key(12), (2 * heads, 128, 32))
    k = jax.random.normal(jax.random.key(13), (2 * heads, 256, 32))
    v = jax.random.normal(jax.random.key(14), (2 * heads, 256, 32))
    mask = jnp.arange(256)[None, :] < jnp.asarray([[240], [129]])
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(fa._sdpa_reference(q, k, v, bias, 0.2, heads) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(
            fa._flash_attention(q, k, v, bias, 0.2, 128, 128, heads) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_flash_full_api_grad_through_mask():
    """jax.grad through flash_attention(mask=...) — the bias cotangent path."""
    q = jax.random.normal(jax.random.key(15), (1, 2, 128, 32))
    k = jax.random.normal(jax.random.key(16), (1, 2, 128, 32))
    v = jax.random.normal(jax.random.key(17), (1, 2, 128, 32))
    mask = jnp.ones((1, 128), dtype=bool)

    def loss(q):
        return jnp.sum(fa.flash_attention(q, k, v, mask=mask, scale=0.2) ** 2)

    def loss_ref(q):
        return jnp.sum(sdpa_xla(q, k, v, mask=mask, scale=0.2) ** 2)

    g = jax.grad(loss)(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=3e-4)
