"""Conditioning modules shared by all backbones.

Capability parity with the reference ``src/models/backbones/conditioner.py``:
L2NormalizationLayer (:10-17), TimestepEmbedder (:19-56), LabelEmbedder with
null-embedding CFG dropout (:59-111), TextEmbedder with padded/masked null
text replacement (:113-177).

CFG dropout design for JAX: in addition to the reference's scalar
``cond_drop_prob`` (0 / 1 are deterministic; fractional draws a Bernoulli
keep-mask from the 'cond' RNG collection), modules accept an explicit
``cond_drop_mask`` (bool [B], True = replace with the null embedding). The
mask path is what the batched single-call CFG evaluation uses.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import l2norm

Dtype = Any


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """OpenAI-style sinusoidal embedding of fractional timesteps."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """Sinusoid -> Dense -> SiLU -> Dense (reference :19-56)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        t_freq = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, dtype=self.dtype)(t_freq)
        x = nn.silu(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype)(x)


def _keep_mask(
    mod: nn.Module,
    batch: int,
    cond_drop_prob: float,
    cond_drop_mask: Optional[jnp.ndarray],
) -> Optional[jnp.ndarray]:
    """True = keep the real conditioning; None = keep everything."""
    if cond_drop_mask is not None:
        return ~cond_drop_mask
    if cond_drop_prob == 0:
        return None
    if cond_drop_prob == 1:
        return jnp.zeros((batch,), dtype=bool)
    key = mod.make_rng("cond")
    return jax.random.uniform(key, (batch,)) < (1.0 - cond_drop_prob)


class LabelEmbedder(nn.Module):
    """Class-label (or external class-embedding) conditioner with a learned
    null embedding for classifier-free guidance (reference :59-111)."""

    num_classes: Optional[int]
    class_embed_dim: Optional[int]
    model_channels: int
    class_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, classes, cond_drop_prob: float = 0.0, cond_drop_mask=None):
        assert (self.num_classes is None) or (self.class_embed_dim is None)
        batch = classes.shape[0]

        if self.num_classes is not None:
            classes_emb = nn.Embed(
                self.num_classes, self.model_channels, dtype=self.dtype
            )(classes)
            null_init = nn.initializers.normal(1.0)
        else:
            classes = l2norm(classes)
            classes_emb = nn.Dense(self.model_channels, dtype=self.dtype)(classes)
            null_init = nn.initializers.normal(1.0 / self.model_channels**0.5)

        null_emb = self.param("null_classes_emb", null_init, (1, self.model_channels))

        keep = _keep_mask(self, batch, cond_drop_prob, cond_drop_mask)
        if keep is not None:
            classes_emb = jnp.where(keep[:, None], classes_emb, null_emb)

        x = nn.LayerNorm(dtype=self.dtype)(classes_emb)
        x = nn.Dense(self.class_channels, dtype=self.dtype)(x)
        x = nn.silu(x)
        return nn.Dense(self.class_channels, dtype=self.dtype)(x)


class TextEmbedder(nn.Module):
    """Projects encoder text embeddings to the conditioning dim, pads to
    max_text_len, and swaps in a learned null text embedding for CFG
    (reference :113-177). Returns (context, text_mask)."""

    text_cond_dim: int
    text_embed_dim: int
    max_text_len: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text_embeds,
        text_mask=None,
        cond_drop_prob: float = 0.0,
        cond_drop_mask=None,
    ):
        batch = text_embeds.shape[0]
        text_vectors = nn.Dense(self.text_cond_dim, dtype=self.dtype)(text_embeds)
        text_vectors = text_vectors[:, : self.max_text_len]
        remainder = self.max_text_len - text_vectors.shape[1]
        if remainder > 0:
            text_vectors = jnp.pad(text_vectors, ((0, 0), (0, remainder), (0, 0)))

        if text_mask is not None:
            text_mask = text_mask[:, : self.max_text_len].astype(bool)
            if remainder > 0:
                text_mask = jnp.pad(
                    text_mask, ((0, 0), (0, remainder)), constant_values=False
                )

        null_text = self.param(
            "null_text_embed",
            nn.initializers.normal(1.0),
            (1, self.max_text_len, self.text_cond_dim),
        )

        keep = _keep_mask(self, batch, cond_drop_prob, cond_drop_mask)
        if keep is not None:
            keep_embed = keep[:, None, None]
            if text_mask is not None:
                keep_embed = text_mask[:, :, None] & keep_embed
                text_mask = jnp.where(
                    keep[:, None], text_mask, jnp.ones_like(text_mask)
                )
            text_vectors = jnp.where(keep_embed, text_vectors, null_text)

        context = nn.LayerNorm(dtype=self.dtype)(text_vectors)
        return context, text_mask
