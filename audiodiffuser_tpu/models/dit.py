"""Diffusion Transformer (DiT) with adaLN-Zero conditioning.

Capability parity with the reference ``src/models/backbones/dit.py``:
PatchEmbed (:56-124), Mlp (:126-161), fixed 2D sin-cos positional embedding
(:168-214), DiTBlock adaLN-Zero (:220-255), FinalLayer (:258-275), DiT
(:278-429) incl. rectangular patches, 3-D (B, T, C) input support and
zero-init of adaLN/final layers.

TPU-native notes: NHWC input [B, H, W, C]; the frozen sin-cos positional
table is a trace-time constant (no frozen parameter needed); patch embedding
is a strided conv that XLA lowers onto the MXU.

Size chart (reference :25-48): S=depth12/hidden384/heads6,
B=12/768/12, L=24/1024/16, XL=28/1152/16, each at patch 2/4/8.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention import Attention, sdpa_auto
from .conditioner import LabelEmbedder, TextEmbedder, TimestepEmbedder

Dtype = Any


def get_2d_sincos_pos_embed(embed_dim: int, grid_size) -> np.ndarray:
    """[H*W, D] fixed sin-cos table (reference :168-214)."""
    gh, gw = grid_size
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w first
    grid = np.stack(grid, axis=0).reshape([2, 1, gh, gw])

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = emb_1d(embed_dim // 2, grid[0])
    emb_w = emb_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)
        x = nn.gelu(x)  # tanh approximation, matching reference
        return nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block (reference :220-255)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_self_text_cond: bool = True
    use_qk_l2norm: bool = False
    use_rope: bool = True
    dtype: Dtype = jnp.float32
    # pluggable token-mixing core; swap in a context-parallel ring core
    # (ops.context_parallel.make_ring_attention_core) for sharded sequences
    attention_core: Any = staticmethod(sdpa_auto)

    @nn.compact
    def __call__(self, x, c, context=None, context_mask=None):
        mod = nn.silu(c)
        mod = nn.Dense(
            6 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="adaLN_modulation",
        )(mod)
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = jnp.split(
            mod, 6, axis=-1
        )

        norm1 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        attn_out = Attention(
            dim=self.hidden_size,
            heads=self.num_heads,
            context_dim=self.hidden_size,
            use_self_text_cond=self.use_self_text_cond,
            use_qk_l2norm=self.use_qk_l2norm,
            use_rope=self.use_rope,
            dtype=self.dtype,
            attention_core=self.attention_core,
            name="attn",
        )(modulate(norm1, shift_msa, scale_msa), context, context_mask)
        x = x + gate_msa[:, None, :] * attn_out

        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x)
        mlp_out = Mlp(
            hidden_features=int(self.hidden_size * self.mlp_ratio),
            out_features=self.hidden_size,
            dtype=self.dtype,
            name="mlp",
        )(modulate(norm2, shift_mlp, scale_mlp))
        return x + gate_mlp[:, None, :] * mlp_out


class DiT(nn.Module):
    """Diffusion Transformer (reference :278-429). Input [B, H, W, C] or [B, T, C]."""

    input_size: Sequence[int] = (256, 128)
    patch_size: Sequence[int] = (8, 4)
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    cond_drop_prob: float = 0.1
    num_classes: Optional[int] = None
    class_embed_dim: Optional[int] = None
    label_cond: bool = False
    text_cond: bool = False
    text_embed_dim: int = 512
    max_text_len: int = 128
    use_self_text_cond: bool = True
    use_qk_l2norm: bool = False
    dtype: Dtype = jnp.float32
    attention_core: Any = staticmethod(sdpa_auto)

    @nn.compact
    def __call__(
        self,
        x,
        t,
        classes=None,
        text_embeds=None,
        text_mask=None,
        cond_drop_prob: Optional[float] = None,
        cond_drop_mask=None,
    ):
        cond_drop_prob = (
            self.cond_drop_prob if cond_drop_prob is None else cond_drop_prob
        )
        squeeze_h = x.ndim == 3
        if squeeze_h:
            x = x[:, None, :, :]  # [B, T, C] -> [B, 1, T, C]

        b, h, w, c = x.shape
        p1, p2 = self.patch_size
        gh, gw = h // p1, w // p2

        # patch embedding (conv stride=patch), xavier init like nn.Linear
        x = nn.Conv(
            self.hidden_size,
            (p1, p2),
            strides=(p1, p2),
            padding="VALID",
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="x_embedder",
        )(x)
        x = x.reshape(b, gh * gw, self.hidden_size)

        pos = jnp.asarray(get_2d_sincos_pos_embed(self.hidden_size, (gh, gw)))
        x = x + pos[None]

        t_emb = TimestepEmbedder(
            self.hidden_size, self.hidden_size, dtype=self.dtype, name="t_embedder"
        )(t)

        if classes is not None and self.label_cond:
            cvec = LabelEmbedder(
                num_classes=self.num_classes if self.class_embed_dim is None else None,
                class_embed_dim=self.class_embed_dim,
                model_channels=self.hidden_size,
                class_channels=self.hidden_size,
                dtype=self.dtype,
                name="y_embedder",
            )(classes, cond_drop_prob, cond_drop_mask)
            cvec = cvec + t_emb
        else:
            cvec = t_emb

        if text_embeds is not None and self.text_cond:
            context, text_mask = TextEmbedder(
                text_cond_dim=self.hidden_size,
                text_embed_dim=self.text_embed_dim,
                max_text_len=self.max_text_len,
                dtype=self.dtype,
                name="text_conditioner",
            )(text_embeds, text_mask, cond_drop_prob, cond_drop_mask)
        else:
            context, text_mask = None, None

        for i in range(self.depth):
            x = DiTBlock(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                use_self_text_cond=self.use_self_text_cond,
                use_qk_l2norm=self.use_qk_l2norm,
                dtype=self.dtype,
                attention_core=self.attention_core,
                name=f"block_{i}",
            )(x, cvec, context, text_mask)

        # final layer: adaLN + zero-init linear to patch pixels
        mod = nn.silu(cvec)
        mod = nn.Dense(
            2 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="final_adaLN",
        )(mod)
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x), shift, scale
        )
        x = nn.Dense(
            p1 * p2 * c,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="final_linear",
        )(x)

        # unpatchify -> [B, H, W, C]
        x = x.reshape(b, gh, gw, p1, p2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * p1, gw * p2, c)
        if squeeze_h:
            x = x[:, 0]
        return x
