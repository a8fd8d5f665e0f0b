"""ADM / guided-diffusion UNet ("OpenAI UNet").

Capability parity with the reference ``src/models/backbones/unet2d_oai.py``:
fp32 GroupNorm (:10-21), zero_module (:23-29), sinusoidal timestep embedding
(:31-49), Up/Downsample (:110-159), ResBlock with scale-shift-norm and
gradient checkpointing (:162-272), AttentionBlock + fp16-stable pre-scaled
QKV attention (:274-380), UNetModel with attention_resolutions parsed from a
downsample-rate string and shared LabelEmbedder class conditioning
(:382-634).

TPU-native notes: NHWC; gradient checkpointing via ``nn.remat`` (XLA
rematerialisation) instead of a custom autograd Function; norms computed in
fp32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conditioner import LabelEmbedder, timestep_embedding

Dtype = Any


class GroupNorm32(nn.Module):
    """GroupNorm evaluated in fp32 (reference :10-21)."""

    groups: int = 32

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        out = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(
            x.astype(jnp.float32)
        )
        return out.astype(dtype)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling over a feature map (reference :51-80):
    prepend the spatial mean as a query token, QKV-attend, return its output.
    Input [B, H, W, C] -> [B, output_dim]."""

    spacial_dim: int
    embed_dim: int
    num_heads_channels: int
    output_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, HW+1, C]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(1.0 / c**0.5),
            (self.spacial_dim**2 + 1, c),
        )
        tokens = tokens + pos[None, : tokens.shape[1]]

        heads = self.embed_dim // self.num_heads_channels
        ch = c // heads
        qkv = nn.Conv(3 * c, (1,), dtype=self.dtype, name="qkv_proj")(tokens)
        qkv = qkv.reshape(b, tokens.shape[1], heads, 3 * ch).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / (ch**0.25)
        weight = jnp.einsum("bhtc,bhsc->bhts", q * scale, k * scale)
        weight = jax.nn.softmax(weight.astype(jnp.float32), axis=-1).astype(weight.dtype)
        a = jnp.einsum("bhts,bhsc->bhtc", weight, v)
        a = a.transpose(0, 2, 1, 3).reshape(b, tokens.shape[1], c)
        out = nn.Conv(
            self.output_dim or self.embed_dim, (1,), dtype=self.dtype, name="c_proj"
        )(a)
        return out[:, 0]


class ResBlock(nn.Module):
    """ADM residual block with optional scale-shift-norm FiLM and built-in
    up/downsampling (reference :162-272)."""

    out_channels: int
    emb_channels: int
    dropout: float = 0.0
    use_conv: bool = False
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        def resample(t):
            if self.up:
                t = jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
            elif self.down:
                t = nn.avg_pool(t, (2, 2), strides=(2, 2))
            return t

        h = GroupNorm32()(x)
        h = nn.silu(h)
        if self.up or self.down:
            h = resample(h)
            x = resample(x)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.silu(emb)
        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            name="emb_proj",
        )(emb_out)
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32()(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNorm32()(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_conv",
        )(h)

        if x.shape[-1] != self.out_channels:
            if self.use_conv:
                x = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="skip")(x)
            else:
                x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention with pre-scaled fp32 softmax (reference :274-380)."""

    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert self.channels % self.num_head_channels == 0
            heads = self.channels // self.num_head_channels
        b, h, w, c = x.shape
        ch = c // heads

        tokens = x.reshape(b, h * w, c)
        tokens_n = GroupNorm32()(tokens)
        qkv = nn.Conv(3 * c, (1,), dtype=self.dtype, name="qkv")(tokens_n)
        # legacy order: split heads before qkv
        qkv = qkv.reshape(b, h * w, heads, 3 * ch).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        scale = 1.0 / (ch**0.25)
        weight = jnp.einsum("bhtc,bhsc->bhts", q * scale, k * scale)
        weight = jax.nn.softmax(weight.astype(jnp.float32), axis=-1).astype(weight.dtype)
        a = jnp.einsum("bhts,bhsc->bhtc", weight, v)
        a = a.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        a = nn.Conv(
            c,
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj_out",
        )(a)
        return (tokens_n + a).reshape(b, h, w, c)


class UNetModel(nn.Module):
    """The full ADM UNet (reference :382-634). Input [B, H, W, C]."""

    image_size: int = 256
    in_channels: int = 2
    model_channels: int = 128
    out_channels: int = 2
    num_res_blocks: int = 2
    attention_resolutions: str = "16"
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 2, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    cond_drop_prob: float = 0.0
    use_checkpoint: bool = False
    num_heads: int = 8
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    class_embed_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        time,
        classes=None,
        cond_drop_prob: Optional[float] = None,
        cond_drop_mask=None,
        deterministic: bool = True,
        **_,
    ):
        cond_drop_prob = (
            self.cond_drop_prob if cond_drop_prob is None else cond_drop_prob
        )
        assert (classes is not None) == (self.num_classes is not None)

        attention_ds = tuple(
            self.image_size // int(res) for res in self.attention_resolutions.split(",")
        )

        # XLA rematerialisation replaces the reference's custom autograd
        # CheckpointFunction (operator_utils.py:140-185)
        res_block = (
            nn.remat(ResBlock, static_argnums=(2,)) if self.use_checkpoint else ResBlock
        )

        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(time, self.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_1")(emb)

        if classes is not None:
            classes_emb = LabelEmbedder(
                num_classes=self.num_classes if self.class_embed_dim is None else None,
                class_embed_dim=self.class_embed_dim,
                model_channels=self.model_channels,
                class_channels=time_embed_dim,
                dtype=self.dtype,
                name="label_conditioner",
            )(classes, cond_drop_prob, cond_drop_mask)
            emb = emb + classes_emb

        def attn(ch, name):
            return AttentionBlock(
                channels=ch,
                num_heads=self.num_heads,
                num_head_channels=self.num_head_channels,
                dtype=self.dtype,
                name=name,
            )

        # ---- input blocks --------------------------------------------------
        ch = input_ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), dtype=self.dtype, name="in_conv")(x)
        hs = [h]
        input_block_chans = [ch]
        ds = 1
        blk = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res_block(
                    out_channels=int(mult * self.model_channels),
                    emb_channels=time_embed_dim,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"in_res_{blk}",
                )(h, emb, deterministic)
                ch = int(mult * self.model_channels)
                if ds in attention_ds:
                    h = attn(ch, f"in_attn_{blk}")(h)
                hs.append(h)
                input_block_chans.append(ch)
                blk += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res_block(
                        out_channels=ch,
                        emb_channels=time_embed_dim,
                        dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True,
                        dtype=self.dtype,
                        name=f"down_{level}",
                    )(h, emb, deterministic)
                elif self.conv_resample:
                    h = nn.Conv(
                        ch, (3, 3), strides=(2, 2), dtype=self.dtype, name=f"down_{level}"
                    )(h)
                else:
                    h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                hs.append(h)
                input_block_chans.append(ch)
                ds *= 2

        # ---- middle --------------------------------------------------------
        h = res_block(
            out_channels=ch,
            emb_channels=time_embed_dim,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype,
            name="mid_res_0",
        )(h, emb, deterministic)
        h = attn(ch, "mid_attn")(h)
        h = res_block(
            out_channels=ch,
            emb_channels=time_embed_dim,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype,
            name="mid_res_1",
        )(h, emb, deterministic)

        # ---- output blocks -------------------------------------------------
        blk = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = input_block_chans.pop()
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res_block(
                    out_channels=int(self.model_channels * mult),
                    emb_channels=time_embed_dim,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"out_res_{blk}",
                )(h, emb, deterministic)
                ch = int(self.model_channels * mult)
                if ds in attention_ds:
                    h = attn(ch, f"out_attn_{blk}")(h)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res_block(
                            out_channels=ch,
                            emb_channels=time_embed_dim,
                            dropout=self.dropout,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            up=True,
                            dtype=self.dtype,
                            name=f"up_{level}",
                        )(h, emb, deterministic)
                    else:
                        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                        if self.conv_resample:
                            h = nn.Conv(
                                ch, (3, 3), dtype=self.dtype, name=f"up_{level}"
                            )(h)
                    ds //= 2
                blk += 1

        h = GroupNorm32()(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels,
            (3, 3),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_conv",
        )(h)
