"""Attention blocks for the backbones.

Capability parity with the reference
``src/models/backbones/attention_utils.py``: RoPE (compute_freqs_cis /
apply_rotary_emb, :12-75), Attention with joint self+text K/V concatenation,
optional qk-l2norm with learned scales and fp32 masked softmax (:78-184),
FeedForward / ChanFeedForward (:187-207), LinearAttention (:209-277).

TPU-native notes:
- RoPE is applied with real cos/sin pairs instead of complex64 (same math,
  maps onto the VPU without complex support).
- Per-sequence-length RoPE "caches" are unnecessary: shapes are static under
  jit, the tables are trace-time constants.
- The softmax attention core is routed through a fusable einsum formulation
  that XLA lowers to MXU matmuls; a Pallas flash-attention kernel can be
  swapped in via ``attention_core`` for long sequences.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ImagenLayerNorm, QuantDense, l2norm

Dtype = Any


def rope_cos_sin(head_dim: int, end: int, theta: float = 10000.0):
    """cos/sin tables of shape [end, head_dim//2]."""
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(end, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate pairs (x0,x1) of the last axis; x is [B, N, H, D]."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    out1 = x1 * cos - x2 * sin
    out2 = x1 * sin + x2 * cos
    # interleave back
    out = jnp.stack([out1, out2], axis=-1)
    return out.reshape(x.shape)


def sdpa_xla(q, k, v, mask=None, scale=1.0):
    """Scaled dot-product attention, fp32 softmax; q,k,v are [B, H, N, D]."""
    sim = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    if mask is not None:
        big_neg = jnp.finfo(sim.dtype).min
        sim = jnp.where(mask[:, None, None, :], sim, big_neg)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def sdpa_auto(q, k, v, mask=None, scale=1.0):
    """Default core: Pallas flash-attention on TPU when compatible, XLA else."""
    from ..ops.flash_attention import attention_core_auto

    return attention_core_auto(q, k, v, mask=mask, scale=scale)


class Attention(nn.Module):
    """Multi-head attention over [B, N, D] tokens with optional text context.

    With ``use_self_text_cond`` and a context given, the context's K/V are
    concatenated onto the self K/V (joint self+text attention); otherwise a
    context triggers pure cross-attention. RoPE is applied over the (possibly
    concatenated) key sequence, matching the reference's scheme.
    """

    dim: int
    heads: int = 8
    context_dim: Optional[int] = None
    use_self_text_cond: bool = True
    use_qk_l2norm: bool = False
    use_rope: bool = True
    dtype: Dtype = jnp.float32
    attention_core: Callable = staticmethod(sdpa_auto)

    @nn.compact
    def __call__(self, x, context=None, context_mask=None):
        assert self.dim % self.heads == 0
        head_dim = self.dim // self.heads
        # QuantDense == nn.Dense in bf16; rides the W8A8 int8 serving path
        # (ADT_INT8=1) at lane-aligned shapes (deep-level dims)
        dense = lambda feats, name: QuantDense(feats, use_bias=False, dtype=self.dtype, name=name)

        q = dense(self.dim, "to_q")(x)

        if self.use_self_text_cond and context is not None:
            k, v = jnp.split(dense(self.dim * 2, "to_kv")(x), 2, axis=-1)
            ck, cv = jnp.split(dense(self.dim * 2, "to_context")(context), 2, axis=-1)
            k = jnp.concatenate([k, ck], axis=-2)
            v = jnp.concatenate([v, cv], axis=-2)
            if self.use_rope:
                b, n = q.shape[:2]
                m = k.shape[1]
                qh = q.reshape(b, n, self.heads, head_dim)
                kh = k.reshape(b, m, self.heads, head_dim)
                cos, sin = rope_cos_sin(head_dim, m)
                qh = apply_rope(qh, cos[:n], sin[:n])
                kh = apply_rope(kh, cos, sin)
                q = qh.reshape(b, n, self.dim)
                k = kh.reshape(b, m, self.dim)
            if context_mask is not None:
                x_mask_pad = jnp.ones((x.shape[0], x.shape[-2]), dtype=bool)
                context_mask = jnp.concatenate(
                    [x_mask_pad, context_mask.astype(bool)], axis=1
                )
        elif context is not None:
            k, v = jnp.split(dense(self.dim * 2, "to_context")(context), 2, axis=-1)
            if self.use_rope:
                b, n = q.shape[:2]
                m = k.shape[1]
                qh = q.reshape(b, n, self.heads, head_dim)
                kh = k.reshape(b, m, self.heads, head_dim)
                cos, sin = rope_cos_sin(head_dim, n + m)
                qh = apply_rope(qh, cos[:n], sin[:n])
                kh = apply_rope(kh, cos[n:], sin[n:])
                q = qh.reshape(b, n, self.dim)
                k = kh.reshape(b, m, self.dim)
        else:
            k, v = jnp.split(dense(self.dim * 2, "to_kv")(x), 2, axis=-1)

        b, n = q.shape[:2]
        m = k.shape[1]
        qh = q.reshape(b, n, self.heads, head_dim).transpose(0, 2, 1, 3)
        kh = k.reshape(b, m, self.heads, head_dim).transpose(0, 2, 1, 3)
        vh = v.reshape(b, m, self.heads, head_dim).transpose(0, 2, 1, 3)

        if self.use_qk_l2norm:
            q_scale = self.param("q_scale", nn.initializers.ones, (head_dim,))
            k_scale = self.param("k_scale", nn.initializers.ones, (head_dim,))
            qh = l2norm(qh) * q_scale
            kh = l2norm(kh) * k_scale
            scale = head_dim**0.5
        else:
            scale = head_dim**-0.5

        out = self.attention_core(qh, kh, vh, mask=context_mask, scale=scale)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return dense(self.dim, "to_out")(out)


class FeedForward(nn.Module):
    """LN -> Dense -> GELU -> LN -> Dense (reference :187-195)."""

    dim: int
    mult: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.mult)
        x = ImagenLayerNorm(dtype=self.dtype)(x)
        # names pin the nn.Dense param paths (checkpoint compatibility)
        x = QuantDense(hidden, use_bias=False, dtype=self.dtype, name="Dense_0")(x)
        x = nn.gelu(x)
        x = ImagenLayerNorm(dtype=self.dtype)(x)
        return QuantDense(self.dim, use_bias=False, dtype=self.dtype, name="Dense_1")(x)


# In NHWC the channel feedforward is the token feedforward with 1x1 convs ==
# Dense over the last axis; reuse the same module.
ChanFeedForward = FeedForward


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention for high-res feature maps
    (reference :209-277). Operates on NHWC feature maps."""

    dim: int
    heads: int = 8
    dropout: float = 0.05
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap, context=None, deterministic: bool = True):
        b, h, w, c = fmap.shape
        heads = self.heads
        head_dim = self.dim // heads
        inner = head_dim * heads

        fmap = ImagenLayerNorm(dtype=self.dtype)(fmap)

        def qkv_proj(name):
            def proj(t):
                t = nn.Dropout(self.dropout, deterministic=deterministic)(t)
                t = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype, name=f"{name}_proj")(t)
                t = nn.Conv(
                    inner,
                    (3, 3),
                    use_bias=False,
                    feature_group_count=inner,
                    dtype=self.dtype,
                    name=f"{name}_dw",
                )(t)
                return t

            return proj

        q = qkv_proj("to_q")(fmap)
        k = qkv_proj("to_k")(fmap)
        v = qkv_proj("to_v")(fmap)

        # [(b h), n, d]
        seq = lambda t: t.reshape(b, h * w, heads, head_dim).transpose(0, 2, 1, 3).reshape(
            b * heads, h * w, head_dim
        )
        q, k, v = seq(q), seq(k), seq(v)

        if context is not None:
            ck, cv = jnp.split(
                nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_context")(context),
                2,
                axis=-1,
            )
            ctx_seq = lambda t: t.reshape(
                b, -1, heads, head_dim
            ).transpose(0, 2, 1, 3).reshape(b * heads, -1, head_dim)
            k = jnp.concatenate([k, ctx_seq(ck)], axis=-2)
            v = jnp.concatenate([v, ctx_seq(cv)], axis=-2)

        q = jax.nn.softmax(q, axis=-1) * head_dim**-0.5
        k = jax.nn.softmax(k, axis=-2)

        ctx = jnp.einsum("bnd,bne->bde", k, v)
        out = jnp.einsum("bnd,bde->bne", q, ctx)
        out = out.reshape(b, heads, h * w, head_dim).transpose(0, 2, 1, 3).reshape(
            b, h, w, inner
        )
        out = nn.silu(out)
        return nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype)(out)
