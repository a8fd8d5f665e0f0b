"""Imagen/DALLE2-style 2D UNet for complex-spectrogram diffusion — the
flagship SC09 backbone.

Capability parity with the reference ``src/models/backbones/unet2d.py``
(UNet2dBase :622-970 and its block zoo), redesigned for TPU:

- NHWC layout end to end (input [B, F, T, C]); channels-last keeps every conv
  MXU-friendly and turns channel LayerNorms into last-axis reductions.
- CFG dropout via scalar ``cond_drop_prob`` (RNG collection 'cond') or an
  explicit per-sample ``cond_drop_mask`` for the batched single-call CFG path.
- Optional parallel condition-encoder branch (``use_condition_block``) whose
  features infuse each downsampling stage via conv or scaled add, with CFG
  masking of the injected channels (reference :927-939).
- The final conv is zero-initialised (reference :872-874).

Dead code in the reference (``to_time_tokens``, the never-activated resnet
cross-attention path in UNet2dBase) is not reproduced.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import Attention, ChanFeedForward, FeedForward, LinearAttention
from .conditioner import LabelEmbedder, TextEmbedder, _keep_mask
from .layers import (
    Block,
    CrossEmbedLayer,
    Downsample,
    GlobalContext,
    ImagenLayerNorm,
    LearnedSinusoidalPosEmb,
    PixelShuffleUpsample,
    QuantConv,
    Upsample,
    WNConv,
)

Dtype = Any


def _tuple_of(val, n):
    if isinstance(val, (list, tuple)):
        assert len(val) == n, f"expected {n} entries, got {val}"
        return tuple(val)
    return (val,) * n


class ResnetBlock(nn.Module):
    """Two conv blocks with FiLM time conditioning, optional cross-attention
    and GlobalContext gating (reference unet2d.py:106-168)."""

    dim_out: int
    cond_dim: Optional[int] = None
    time_cond_dim: Optional[int] = None
    groups: int = 8
    linear_attn: bool = False
    use_gca: bool = False
    attn_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None, cond=None):
        scale_shift = None
        if self.time_cond_dim is not None and time_emb is not None:
            t = nn.silu(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="time_mlp")(t)
            t = t[:, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype)(x)

        if cond is not None and self.cond_dim is not None:
            b, fh, fw, c = h.shape
            tokens = h.reshape(b, fh * fw, c)
            if self.linear_attn:
                # LinearAttention consumes NHWC maps directly
                h = LinearAttention(
                    dim=self.dim_out,
                    heads=self.attn_heads,
                    context_dim=self.cond_dim,
                    dtype=self.dtype,
                )(h, context=cond) + h
            else:
                tokens = Attention(
                    dim=self.dim_out,
                    heads=self.attn_heads,
                    context_dim=self.cond_dim,
                    dtype=self.dtype,
                )(tokens, context=cond) + tokens
                h = tokens.reshape(b, fh, fw, c)

        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype)(h, scale_shift=scale_shift)

        if self.use_gca:
            h = h * GlobalContext(dim_out=self.dim_out, dtype=self.dtype)(h)

        if x.shape[-1] != self.dim_out:
            x = QuantConv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class TransformerBlock(nn.Module):
    """Self(+joint-text)-attention transformer over flattened fmap tokens
    (reference :197-232)."""

    dim: int
    depth: int = 1
    heads: int = 8
    ff_mult: float = 2.0
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, context_mask=None):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        norm = ImagenLayerNorm(dtype=self.dtype)
        for _ in range(self.depth):
            attn = Attention(
                dim=self.dim, heads=self.heads, context_dim=self.context_dim, dtype=self.dtype
            )
            if context is None:
                tokens = attn(norm(tokens)) + tokens
            else:
                tokens = attn(norm(tokens), context, context_mask) + tokens
            tokens = FeedForward(dim=self.dim, mult=self.ff_mult, dtype=self.dtype)(tokens) + tokens
        return tokens.reshape(b, h, w, c)


class LinearAttentionTransformerBlock(nn.Module):
    """LinearAttention + channel feedforward (reference :234-258)."""

    dim: int
    depth: int = 1
    heads: int = 8
    ff_mult: float = 2.0
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, context_mask=None):
        for _ in range(self.depth):
            x = LinearAttention(
                dim=self.dim, heads=self.heads, context_dim=self.context_dim, dtype=self.dtype
            )(x, context=context) + x
            x = ChanFeedForward(dim=self.dim, mult=self.ff_mult, dtype=self.dtype)(x) + x
        return x


class DownsamplingBlock(nn.Module):
    """(optional pre-downsample) -> init resnet -> resnets -> attention ->
    (optional post-downsample); collects skip hiddens (reference :322-436)."""

    dim_in: int
    dim_out: int
    cond_dim: int
    time_cond_dim: int
    attn_heads: int
    use_global_context_attn: bool
    layer_num_resnet_blocks: int
    groups: int
    layer_attn: bool
    layer_attn_depth: int
    layer_cross_attn: bool
    layer_use_linear_attn: bool
    layer_use_linear_cross_attn: bool
    ff_mult: float
    memory_efficient: bool
    is_last_layer: bool
    cross_embed_downsample: bool
    cross_embed_downsample_kernel_sizes: Sequence[int]
    channel_infuse_mode: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t=None, c=None, context=None, context_mask=None, inj_channels=None):
        if inj_channels is not None:
            if self.channel_infuse_mode == "conv":
                x = WNConv(self.dim_in, (3, 3), dtype=self.dtype, name="channel_cond_conv")(
                    jnp.concatenate([x, inj_channels], axis=-1)
                )
            elif self.channel_infuse_mode == "add":
                x = (x + inj_channels) / math.sqrt(2)

        layer_cond_dim = (
            self.cond_dim
            if (self.layer_cross_attn or self.layer_use_linear_cross_attn)
            else None
        )

        def downsample(name):
            if self.cross_embed_downsample:
                return CrossEmbedLayer(
                    self.dim_out,
                    kernel_sizes=self.cross_embed_downsample_kernel_sizes,
                    stride=2,
                    dtype=self.dtype,
                    name=name,
                )
            return Downsample(self.dim_out, dtype=self.dtype, name=name)

        current_dim = self.dim_out if self.memory_efficient else self.dim_in
        if self.memory_efficient:
            x = downsample("pre_downsample")(x)

        x = ResnetBlock(
            current_dim,
            cond_dim=layer_cond_dim,
            linear_attn=self.layer_use_linear_cross_attn,
            time_cond_dim=self.time_cond_dim,
            groups=self.groups,
            attn_heads=self.attn_heads,
            dtype=self.dtype,
            name="init_block",
        )(x, time_emb=t, cond=c)

        hiddens = []
        for i in range(self.layer_num_resnet_blocks):
            x = ResnetBlock(
                current_dim,
                time_cond_dim=self.time_cond_dim,
                groups=self.groups,
                use_gca=self.use_global_context_attn,
                attn_heads=self.attn_heads,
                dtype=self.dtype,
                name=f"resnet_{i}",
            )(x, time_emb=t)
            hiddens.append(x)

        if self.layer_attn:
            x = TransformerBlock(
                dim=current_dim,
                depth=self.layer_attn_depth,
                heads=self.attn_heads,
                ff_mult=self.ff_mult,
                context_dim=self.cond_dim,
                dtype=self.dtype,
                name="attn_block",
            )(x, context=context, context_mask=context_mask)
        elif self.layer_use_linear_attn:
            x = LinearAttentionTransformerBlock(
                dim=current_dim,
                depth=self.layer_attn_depth,
                heads=self.attn_heads,
                ff_mult=self.ff_mult,
                context_dim=self.cond_dim,
                dtype=self.dtype,
                name="attn_block",
            )(x, context=context)
        hiddens.append(x)

        if not self.memory_efficient:
            if not self.is_last_layer:
                x = downsample("post_downsample")(x)
            else:
                x = QuantConv(
                    self.dim_out, (3, 3), dtype=self.dtype, name="post_conv3"
                )(x) + QuantConv(
                    self.dim_out, (1, 1), dtype=self.dtype, name="post_conv1"
                )(x)

        return x, hiddens


class MiddleBlock(nn.Module):
    """resnet -> (attention) -> resnet at the bottleneck (reference :438-469)."""

    mid_dim: int
    cond_dim: int
    time_cond_dim: int
    groups: int
    attn_depth: int
    attn_heads: int
    attend_at_middle: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, c=None):
        x = ResnetBlock(
            self.mid_dim,
            cond_dim=self.cond_dim,
            time_cond_dim=self.time_cond_dim,
            groups=self.groups,
            attn_heads=self.attn_heads,
            dtype=self.dtype,
            name="mid_block1",
        )(x, time_emb=t, cond=c)
        if self.attend_at_middle:
            x = TransformerBlock(
                dim=self.mid_dim,
                depth=self.attn_depth,
                heads=self.attn_heads,
                dtype=self.dtype,
                name="mid_attn",
            )(x)
        return ResnetBlock(
            self.mid_dim,
            cond_dim=self.cond_dim,
            time_cond_dim=self.time_cond_dim,
            groups=self.groups,
            attn_heads=self.attn_heads,
            dtype=self.dtype,
            name="mid_block2",
        )(x, time_emb=t, cond=c)


class UpsamplingBlock(nn.Module):
    """Skip-concat resnets -> attention -> upsample (reference :471-538)."""

    dim_in: int
    dim_out: int
    skip_connect_dim: int
    cond_dim: int
    time_cond_dim: int
    attn_heads: int
    use_global_context_attn: bool
    layer_num_resnet_blocks: int
    groups: int
    layer_attn: bool
    layer_attn_depth: int
    layer_cross_attn: bool
    layer_use_linear_attn: bool
    layer_use_linear_cross_attn: bool
    ff_mult: float
    memory_efficient: bool
    pixel_shuffle_upsample: bool
    is_last_layer: bool
    skip_connect_scale: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, c, context, context_mask, down_hiddens):
        layer_cond_dim = (
            self.cond_dim
            if (self.layer_cross_attn or self.layer_use_linear_cross_attn)
            else None
        )

        x = jnp.concatenate([x, down_hiddens.pop() * self.skip_connect_scale], axis=-1)
        x = ResnetBlock(
            self.dim_out,
            cond_dim=layer_cond_dim,
            linear_attn=self.layer_use_linear_cross_attn,
            time_cond_dim=self.time_cond_dim,
            groups=self.groups,
            attn_heads=self.attn_heads,
            dtype=self.dtype,
            name="init_block",
        )(x, time_emb=t, cond=c)

        for i in range(self.layer_num_resnet_blocks):
            x = jnp.concatenate(
                [x, down_hiddens.pop() * self.skip_connect_scale], axis=-1
            )
            x = ResnetBlock(
                self.dim_out,
                time_cond_dim=self.time_cond_dim,
                groups=self.groups,
                use_gca=self.use_global_context_attn,
                attn_heads=self.attn_heads,
                dtype=self.dtype,
                name=f"resnet_{i}",
            )(x, time_emb=t)

        if self.layer_attn:
            x = TransformerBlock(
                dim=self.dim_out,
                depth=self.layer_attn_depth,
                heads=self.attn_heads,
                ff_mult=self.ff_mult,
                context_dim=self.cond_dim,
                dtype=self.dtype,
                name="attn_block",
            )(x, context=context, context_mask=context_mask)
        elif self.layer_use_linear_attn:
            x = LinearAttentionTransformerBlock(
                dim=self.dim_out,
                depth=self.layer_attn_depth,
                heads=self.attn_heads,
                ff_mult=self.ff_mult,
                context_dim=self.cond_dim,
                dtype=self.dtype,
                name="attn_block",
            )(x, context=context)

        up_hidden = x
        if (not self.is_last_layer) or self.memory_efficient:
            if self.pixel_shuffle_upsample:
                x = PixelShuffleUpsample(self.dim_in, dtype=self.dtype, name="upsample")(x)
            else:
                x = Upsample(self.dim_in, dtype=self.dtype, name="upsample")(x)

        return x, down_hiddens, up_hidden


class CondResnetBlock(nn.Module):
    """Time-independent resnet for the condition encoder (reference :540-560)."""

    dim_out: int
    groups: int = 8
    use_gca: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype)(x)
        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype)(h)
        if self.use_gca:
            h = h * GlobalContext(dim_out=self.dim_out, dtype=self.dtype)(h)
        if x.shape[-1] != self.dim_out:
            x = QuantConv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class CondEncoderBlock(nn.Module):
    """Downsampling stage of the parallel condition encoder (reference :562-620)."""

    dim_in: int
    dim_out: int
    layer_num_resnet_blocks: int
    use_global_context_attn: bool
    groups: int
    memory_efficient: bool
    is_last_layer: bool
    cross_embed_downsample: bool
    cross_embed_downsample_kernel_sizes: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def downsample(name):
            if self.cross_embed_downsample:
                return CrossEmbedLayer(
                    self.dim_out,
                    kernel_sizes=self.cross_embed_downsample_kernel_sizes,
                    stride=2,
                    dtype=self.dtype,
                    name=name,
                )
            return Downsample(self.dim_out, dtype=self.dtype, name=name)

        current_dim = self.dim_out if self.memory_efficient else self.dim_in
        if self.memory_efficient:
            x = downsample("pre_downsample")(x)

        x = CondResnetBlock(current_dim, groups=self.groups, dtype=self.dtype, name="init")(x)
        for i in range(self.layer_num_resnet_blocks):
            x = CondResnetBlock(
                current_dim,
                groups=self.groups,
                use_gca=self.use_global_context_attn,
                dtype=self.dtype,
                name=f"resnet_{i}",
            )(x)

        if not self.memory_efficient:
            if not self.is_last_layer:
                x = downsample("post_downsample")(x)
            else:
                x = QuantConv(
                    self.dim_out, (3, 3), dtype=self.dtype, name="post_conv3"
                )(x) + QuantConv(
                    self.dim_out, (1, 1), dtype=self.dtype, name="post_conv1"
                )(x)
        return x


class UNet2dBase(nn.Module):
    """The full UNet (reference unet2d.py:622-970). Input [B, H, W, channels]."""

    dim: int
    num_classes: int = 0
    cond_drop_prob: float = 0.0
    num_resnet_blocks: Union[int, Sequence[int]] = 1
    cond_dim: Optional[int] = None
    learned_sinu_pos_emb_dim: int = 16
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    channels_out: Optional[int] = None
    attn_heads: int = 8
    ff_mult: float = 2.0
    layer_attns: Union[bool, Sequence[bool]] = True
    layer_attns_depth: Union[int, Sequence[int]] = 1
    layer_mid_attns_depth: int = 1
    attend_at_middle: bool = True
    layer_cross_attns: Union[bool, Sequence[bool]] = True
    use_linear_attn: Union[bool, Sequence[bool]] = False
    use_linear_cross_attn: Union[bool, Sequence[bool]] = False
    text_embed_dim: int = 768
    class_embed_dim: Optional[int] = None
    cond_on_text: bool = False
    max_text_len: int = 3
    init_dim: Optional[int] = None
    resnet_groups: Union[int, Sequence[int]] = 8
    init_conv_kernel_size: int = 7
    init_cross_embed: bool = True
    init_cross_embed_kernel_sizes: Sequence[int] = (3, 7, 15)
    cross_embed_downsample: bool = False
    cross_embed_downsample_kernel_sizes: Sequence[int] = (2, 4)
    memory_efficient: bool = False
    init_conv_to_final_conv_residual: bool = False
    use_global_context_attn: bool = True
    scale_skip_connection: bool = True
    final_resnet_block: bool = True
    final_conv_kernel_size: int = 3
    pixel_shuffle_upsample: bool = True
    use_condition_block: bool = False
    channel_infuse_mode: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        time,
        classes=None,
        text_embeds=None,
        text_mask=None,
        cond_drop_prob: Optional[float] = None,
        cond_drop_mask=None,
        inj_channels=None,
    ):
        if self.use_condition_block and self.channel_infuse_mode not in ("conv", "add"):
            raise ValueError(
                "use_condition_block=True requires channel_infuse_mode='conv' or "
                "'add'; with the default None the condition-encoder branch is "
                "computed and then silently discarded by every DownBlock."
            )
        cond_drop_prob = (
            self.cond_drop_prob if cond_drop_prob is None else cond_drop_prob
        )
        batch = x.shape[0]
        num_layers = len(self.dim_mults)

        init_dim = self.init_dim or self.dim
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        num_resnet_blocks = _tuple_of(self.num_resnet_blocks, num_layers)
        resnet_groups = _tuple_of(self.resnet_groups, num_layers)
        layer_attns = _tuple_of(self.layer_attns, num_layers)
        layer_attns_depth = _tuple_of(self.layer_attns_depth, num_layers)
        layer_cross_attns = _tuple_of(self.layer_cross_attns, num_layers)
        use_linear_attn = _tuple_of(self.use_linear_attn, num_layers)
        use_linear_cross_attn = _tuple_of(self.use_linear_cross_attn, num_layers)

        cond_dim = self.cond_dim or self.dim
        time_cond_dim = cond_dim * 4

        # --- initial convolution -------------------------------------------
        def make_init_conv(name):
            if self.init_cross_embed:
                return CrossEmbedLayer(
                    init_dim,
                    kernel_sizes=self.init_cross_embed_kernel_sizes,
                    stride=1,
                    dtype=self.dtype,
                    name=name,
                )
            return nn.Conv(
                init_dim,
                (self.init_conv_kernel_size, self.init_conv_kernel_size),
                dtype=self.dtype,
                name=name,
            )

        x = make_init_conv("init_conv")(x)
        if inj_channels is not None and self.use_condition_block:
            inj_channels = make_init_conv("init_conv_cond")(inj_channels)

        init_conv_residual = x if self.init_conv_to_final_conv_residual else None

        # --- time conditioning ---------------------------------------------
        time_hiddens = LearnedSinusoidalPosEmb(self.learned_sinu_pos_emb_dim)(time)
        time_hiddens = nn.Dense(time_cond_dim, dtype=self.dtype, name="to_time_hidden")(
            time_hiddens
        )
        time_hiddens = nn.silu(time_hiddens)
        t = nn.Dense(time_cond_dim, dtype=self.dtype, name="to_time_cond")(time_hiddens)

        # --- class conditioning --------------------------------------------
        if self.num_classes != 0:
            assert classes is not None, "class-conditional net requires classes"
            classes_emb = LabelEmbedder(
                num_classes=self.num_classes if self.class_embed_dim is None else None,
                class_embed_dim=self.class_embed_dim,
                model_channels=self.dim,
                class_channels=self.dim * 4,
                dtype=self.dtype,
                name="label_conditioner",
            )(classes, cond_drop_prob, cond_drop_mask)
            t = t + classes_emb

        # --- text conditioning ---------------------------------------------
        if text_embeds is not None:
            context, context_mask = TextEmbedder(
                text_cond_dim=cond_dim,
                text_embed_dim=self.text_embed_dim,
                max_text_len=self.max_text_len,
                dtype=self.dtype,
                name="text_conditioner",
            )(text_embeds, text_mask, cond_drop_prob, cond_drop_mask)
        else:
            context, context_mask = None, None

        # --- initial resnet (memory-efficient variant) ----------------------
        if self.memory_efficient:
            x = ResnetBlock(
                init_dim,
                time_cond_dim=time_cond_dim,
                groups=resnet_groups[0],
                use_gca=self.use_global_context_attn,
                attn_heads=self.attn_heads,
                dtype=self.dtype,
                name="init_resnet_block",
            )(x, time_emb=t)
            if inj_channels is not None and self.use_condition_block:
                inj_channels = CondResnetBlock(
                    init_dim,
                    groups=resnet_groups[0],
                    use_gca=self.use_global_context_attn,
                    dtype=self.dtype,
                    name="init_resnet_block_cond",
                )(inj_channels)

        skip_connect_scale = 1.0 if not self.scale_skip_connection else 2**-0.5

        # condition-injection CFG mask
        if self.use_condition_block and inj_channels is not None:
            keep = _keep_mask(self, batch, cond_drop_prob, cond_drop_mask)
        else:
            keep = None

        # --- down path ------------------------------------------------------
        hiddens = []
        skip_connect_dims = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= (num_layers - 1)
            current_dim = dim_out if self.memory_efficient else dim_in
            skip_connect_dims.append(current_dim)

            block_inj = None
            if self.use_condition_block and inj_channels is not None:
                block_inj = inj_channels
                if keep is not None:
                    block_inj = jnp.where(
                        keep[:, None, None, None], block_inj, 0.0
                    )

            x, stage_hiddens = DownsamplingBlock(
                dim_in=dim_in,
                dim_out=dim_out,
                cond_dim=cond_dim,
                time_cond_dim=time_cond_dim,
                attn_heads=self.attn_heads,
                use_global_context_attn=self.use_global_context_attn,
                layer_num_resnet_blocks=num_resnet_blocks[ind],
                groups=resnet_groups[ind],
                layer_attn=layer_attns[ind],
                layer_attn_depth=layer_attns_depth[ind],
                layer_cross_attn=layer_cross_attns[ind],
                layer_use_linear_attn=use_linear_attn[ind],
                layer_use_linear_cross_attn=use_linear_cross_attn[ind],
                ff_mult=self.ff_mult,
                memory_efficient=self.memory_efficient,
                is_last_layer=is_last,
                cross_embed_downsample=self.cross_embed_downsample,
                cross_embed_downsample_kernel_sizes=self.cross_embed_downsample_kernel_sizes,
                channel_infuse_mode=self.channel_infuse_mode,
                dtype=self.dtype,
                name=f"down_{ind}",
            )(x, t=t, c=None, context=context, context_mask=context_mask, inj_channels=block_inj)
            hiddens.extend(stage_hiddens)

            if self.use_condition_block and inj_channels is not None:
                inj_channels = CondEncoderBlock(
                    dim_in=dim_in,
                    dim_out=dim_out,
                    layer_num_resnet_blocks=num_resnet_blocks[ind],
                    use_global_context_attn=self.use_global_context_attn,
                    groups=resnet_groups[ind],
                    memory_efficient=self.memory_efficient,
                    is_last_layer=is_last,
                    cross_embed_downsample=self.cross_embed_downsample,
                    cross_embed_downsample_kernel_sizes=self.cross_embed_downsample_kernel_sizes,
                    dtype=self.dtype,
                    name=f"down_cond_{ind}",
                )(inj_channels)

        # --- middle ---------------------------------------------------------
        x = MiddleBlock(
            mid_dim=dims[-1],
            cond_dim=cond_dim,
            time_cond_dim=time_cond_dim,
            groups=resnet_groups[-1],
            attn_depth=self.layer_mid_attns_depth,
            attn_heads=self.attn_heads,
            attend_at_middle=self.attend_at_middle,
            dtype=self.dtype,
            name="mid_block",
        )(x, t, c=None)

        # --- up path --------------------------------------------------------
        rev_in_out = list(reversed(in_out))
        rev = lambda tup: tuple(reversed(tup))
        r_resnet_blocks = rev(num_resnet_blocks)
        r_groups = rev(resnet_groups)
        r_layer_attns = rev(layer_attns)
        r_layer_attns_depth = rev(layer_attns_depth)
        r_layer_cross = rev(layer_cross_attns)
        r_lin_attn = rev(use_linear_attn)
        r_lin_cross = rev(use_linear_cross_attn)

        for ind, (dim_in, dim_out) in enumerate(rev_in_out):
            is_last = ind == (num_layers - 1)
            x, hiddens, _up = UpsamplingBlock(
                dim_in=dim_in,
                dim_out=dim_out,
                skip_connect_dim=skip_connect_dims.pop(),
                cond_dim=cond_dim,
                time_cond_dim=time_cond_dim,
                attn_heads=self.attn_heads,
                use_global_context_attn=self.use_global_context_attn,
                layer_num_resnet_blocks=r_resnet_blocks[ind],
                groups=r_groups[ind],
                layer_attn=r_layer_attns[ind],
                layer_attn_depth=r_layer_attns_depth[ind],
                layer_cross_attn=r_layer_cross[ind],
                layer_use_linear_attn=r_lin_attn[ind],
                layer_use_linear_cross_attn=r_lin_cross[ind],
                ff_mult=self.ff_mult,
                memory_efficient=self.memory_efficient,
                pixel_shuffle_upsample=self.pixel_shuffle_upsample,
                is_last_layer=is_last,
                skip_connect_scale=skip_connect_scale,
                dtype=self.dtype,
                name=f"up_{ind}",
            )(x, t, None, context, context_mask, hiddens)

        assert len(hiddens) == 0

        if init_conv_residual is not None:
            x = jnp.concatenate([x, init_conv_residual], axis=-1)

        if self.final_resnet_block:
            x = ResnetBlock(
                self.dim,
                time_cond_dim=time_cond_dim,
                groups=resnet_groups[0],
                use_gca=True,
                attn_heads=self.attn_heads,
                dtype=self.dtype,
                name="final_res_block",
            )(x, time_emb=t)

        k = self.final_conv_kernel_size
        out = nn.Conv(
            self.channels_out or self.channels,
            (k, k),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="final_conv",
        )(x)
        return out
