"""1D Efficient-UNet (imagen-style) for raw waveforms.

Capability parity with the reference ``src/models/backbones/unet1d.py``:
LayerNorm/LayerNorm1d (:16-43), FeedForward1d (:49-61), TransformerBlock1d
(:67-122), time embeddings (:128-148), ConvBlock1d with FiLM + diffae
``inj_embeddings`` (:163-207), strided Downsample1d (:214-225), Upsample1d
(:227-255), ResnetBlock1d (:257-316), BottleneckBlock1d (:322-380),
DownsampleBlock1d (:382-468), UpsampleBlock1d (:470-566), learned waveform
"patchify" WAVenc1d/WAVdec1d (:572-622), UNet1d (:624-816), UNet1dBase
(:818-893).

TPU-native notes: NWC layout ([B, T, C]); the transposed convolutions are
expressed as lhs-dilated ``conv_general_dilated`` (same connectivity/shape as
torch ConvTranspose1d); channel LayerNorms become last-axis reductions.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import Attention
from .conditioner import LabelEmbedder, TextEmbedder
from .layers import LearnedSinusoidalPosEmb

Dtype = Any


class ChanLayerNorm1d(nn.Module):
    """Channel LayerNorm (g, optional bias); in NWC this is the last axis."""

    use_bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feats = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (feats,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + self.eps) * g
        if self.use_bias:
            out = out + self.param("b", nn.initializers.zeros, (feats,))
        return out


def conv1d(
    features,
    kernel_size,
    strides=1,
    padding=0,
    dilation=1,
    use_bias=True,
    dtype=jnp.float32,
    name=None,
    kernel_init=None,
):
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Conv(
        features,
        (kernel_size,),
        strides=(strides,),
        padding=[(padding, padding)],
        kernel_dilation=(dilation,),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
        **kwargs,
    )


class ConvTranspose1d(nn.Module):
    """torch-ConvTranspose1d-shaped upsampling conv via lhs dilation.

    out_len = (in_len - 1) * stride - 2*padding + kernel_size + output_padding
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    use_bias: bool = True
    kernel_init: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        kernel_init = self.kernel_init or nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel", kernel_init, (k, x.shape[-1], self.features)
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NWC", "WIO", "NWC")
        )
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p + op)],
            lhs_dilation=(s,),
            dimension_numbers=dn,
        )
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


class FeedForward1d(nn.Module):
    """LN -> 1x1 conv -> GELU -> LN -> 1x1 conv (reference :49-61)."""

    channels: int
    multiplier: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.channels * self.multiplier)
        x = ChanLayerNorm1d(use_bias=False)(x)
        x = conv1d(mid, 1, use_bias=False, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = ChanLayerNorm1d(use_bias=False)(x)
        return conv1d(self.channels, 1, use_bias=False, dtype=self.dtype)(x)


class TransformerBlock1d(nn.Module):
    """Self-attn (+ separate or joint text attention) + conv feedforward
    (reference :67-122). Input [B, T, C]."""

    channels: int
    num_heads: int = 8
    multiplier: float = 2.0
    context_features: Optional[int] = None
    use_self_text_cond: bool = False
    use_qk_l2norm: bool = False
    use_rope: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, context_mask=None):
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        if context is None:
            x = Attention(dim=self.channels, heads=self.num_heads, dtype=self.dtype, name="attention")(
                norm(x)
            ) + x
        elif not self.use_self_text_cond:
            x = Attention(dim=self.channels, heads=self.num_heads, dtype=self.dtype, name="attention")(
                norm(x)
            ) + x
            x = Attention(
                dim=self.channels,
                heads=self.num_heads,
                context_dim=self.context_features,
                use_self_text_cond=False,
                use_rope=self.use_rope,
                dtype=self.dtype,
                name="cross_attention",
            )(nn.LayerNorm(dtype=self.dtype, name="cross_norm")(x), context, context_mask) + x
        else:
            x = Attention(
                dim=self.channels,
                heads=self.num_heads,
                context_dim=self.context_features,
                use_self_text_cond=True,
                use_qk_l2norm=self.use_qk_l2norm,
                use_rope=self.use_rope,
                dtype=self.dtype,
                name="attention",
            )(norm(x), context, context_mask) + x

        return FeedForward1d(self.channels, self.multiplier, dtype=self.dtype)(x) + x


class ConvBlock1d(nn.Module):
    """GroupNorm -> FiLM -> (inj_embeddings gate) -> SiLU -> conv (reference :163-207)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    num_groups: int = 8
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None, inj_embeddings=None):
        if self.use_norm:
            x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        if inj_embeddings is not None:
            x = inj_embeddings * x
        x = nn.silu(x)
        return conv1d(
            self.out_channels,
            self.kernel_size,
            strides=self.stride,
            padding=self.dilation,
            dilation=self.dilation,
            dtype=self.dtype,
        )(x)


class ResnetBlock1d(nn.Module):
    """Two conv blocks, FiLM from concat(time, class) embedding (reference :257-316)."""

    out_channels: int
    num_groups: int
    dilation: int = 1
    use_cond_embedding: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_embed=None, class_embed=None, inj_embeddings=None):
        scale_shift = None
        embeds = [e for e in (time_embed, class_embed) if e is not None]
        if self.use_cond_embedding and embeds:
            cond = jnp.concatenate(embeds, axis=-1)
            cond = nn.silu(cond)
            cond = nn.Dense(self.out_channels * 2, dtype=self.dtype, name="to_cond")(cond)
            cond = cond[:, None, :]
            scale_shift = jnp.split(cond, 2, axis=-1)

        h = ConvBlock1d(
            self.out_channels,
            num_groups=self.num_groups,
            dilation=self.dilation,
            dtype=self.dtype,
        )(x)
        h = ConvBlock1d(self.out_channels, num_groups=self.num_groups, dtype=self.dtype)(
            h, scale_shift=scale_shift, inj_embeddings=inj_embeddings
        )

        if x.shape[-1] != self.out_channels:
            x = conv1d(self.out_channels, 1, dtype=self.dtype, name="to_out")(x)
        return h + x


class Downsample1d(nn.Module):
    """Strided conv downsample (reference :214-225)."""

    out_channels: int
    factor: int
    kernel_multiplier: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.kernel_multiplier % 2 == 0
        return conv1d(
            self.out_channels,
            self.factor * self.kernel_multiplier + 1,
            strides=self.factor,
            padding=self.factor * (self.kernel_multiplier // 2),
            dtype=self.dtype,
        )(x)


class Upsample1d(nn.Module):
    """Nearest+conv or transposed-conv upsample (reference :227-255)."""

    out_channels: int
    factor: int
    use_nearest: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        if f == 1:
            return conv1d(self.out_channels, 3, padding=1, dtype=self.dtype)(x)
        if self.use_nearest:
            x = jnp.repeat(x, f, axis=1)
            x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="reflect")
            return conv1d(self.out_channels, 3, padding=0, dtype=self.dtype)(x)
        return ConvTranspose1d(
            self.out_channels,
            kernel_size=f * 2,
            stride=f,
            padding=f // 2 + f % 2,
            output_padding=f % 2,
            dtype=self.dtype,
        )(x)


class BottleneckBlock1d(nn.Module):
    """resnet -> (transformer) -> resnet (reference :322-380)."""

    channels: int
    num_groups: int
    use_attention: bool = False
    attention_heads: Optional[int] = None
    attention_multiplier: Optional[float] = None
    text_embed_dim: Optional[int] = None
    use_self_text_cond: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t=None, c=None, context=None, context_mask=None, inj_embeddings=None):
        x = ResnetBlock1d(
            self.channels, num_groups=self.num_groups, dtype=self.dtype, name="pre_block"
        )(x, t, c, inj_embeddings)
        if self.use_attention:
            x = TransformerBlock1d(
                channels=self.channels,
                num_heads=self.attention_heads,
                multiplier=self.attention_multiplier,
                context_features=self.text_embed_dim,
                use_self_text_cond=self.use_self_text_cond,
                dtype=self.dtype,
                name="transformer",
            )(x, context, context_mask)
        return ResnetBlock1d(
            self.channels, num_groups=self.num_groups, dtype=self.dtype, name="post_block"
        )(x, t, c, inj_embeddings)


class DownsampleBlock1d(nn.Module):
    """(pre-)downsample -> resnets -> (transformer); collects skips
    (reference :382-468)."""

    in_channels: int
    out_channels: int
    factor: int
    num_groups: int
    num_layers: int
    kernel_multiplier: int = 2
    use_pre_downsample: bool = True
    use_skip: bool = False
    use_attention: bool = False
    attention_heads: Optional[int] = None
    attention_multiplier: Optional[float] = None
    text_embed_dim: Optional[int] = None
    use_self_text_cond: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        t=None,
        c=None,
        context=None,
        context_mask=None,
        inj_embeddings=None,
        inj_channels=None,
    ):
        if inj_channels is not None and inj_channels.shape[1] == x.shape[1]:
            x = x + inj_channels

        channels = self.out_channels if self.use_pre_downsample else self.in_channels
        down = Downsample1d(
            self.out_channels,
            factor=self.factor,
            kernel_multiplier=self.kernel_multiplier,
            dtype=self.dtype,
            name="downsample",
        )

        if self.use_pre_downsample:
            x = down(x)

        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock1d(
                channels, num_groups=self.num_groups, dtype=self.dtype, name=f"block_{i}"
            )(x, t, c, inj_embeddings)
            if self.use_skip:
                skips.append(x)

        if self.use_attention:
            x = TransformerBlock1d(
                channels=channels,
                num_heads=self.attention_heads,
                multiplier=self.attention_multiplier,
                context_features=self.text_embed_dim,
                use_self_text_cond=self.use_self_text_cond,
                dtype=self.dtype,
                name="transformer",
            )(x, context, context_mask)
            if self.use_skip:
                skips.append(x)

        if not self.use_pre_downsample:
            x = down(x)

        return (x, skips) if self.use_skip else x


class UpsampleBlock1d(nn.Module):
    """Skip-concat resnets -> (transformer) -> upsample (reference :470-566)."""

    in_channels: int
    out_channels: int
    factor: int
    num_layers: int
    num_groups: int
    use_nearest: bool = False
    use_pre_upsample: bool = False
    use_skip: bool = False
    use_skip_scale: bool = False
    use_attention: bool = False
    attention_heads: Optional[int] = None
    attention_multiplier: Optional[float] = None
    text_embed_dim: Optional[int] = None
    use_self_text_cond: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        skips=None,
        t=None,
        c=None,
        context=None,
        context_mask=None,
        inj_embeddings=None,
    ):
        skip_scale = 2**-0.5 if self.use_skip_scale else 1.0
        channels = self.out_channels if self.use_pre_upsample else self.in_channels

        up = Upsample1d(
            self.out_channels,
            factor=self.factor,
            use_nearest=self.use_nearest,
            dtype=self.dtype,
            name="upsample",
        )

        if self.use_pre_upsample:
            x = up(x)

        for i in range(self.num_layers):
            if skips is not None:
                x = jnp.concatenate([x, skips.pop() * skip_scale], axis=-1)
            x = ResnetBlock1d(
                channels, num_groups=self.num_groups, dtype=self.dtype, name=f"block_{i}"
            )(x, t, c, inj_embeddings)

        if self.use_attention:
            x = TransformerBlock1d(
                channels=channels,
                num_heads=self.attention_heads,
                multiplier=self.attention_multiplier,
                context_features=self.text_embed_dim,
                use_self_text_cond=self.use_self_text_cond,
                dtype=self.dtype,
                name="transformer",
            )(x, context, context_mask)

        if not self.use_pre_upsample:
            x = up(x)
        return x


class UNet1d(nn.Module):
    """The 1D UNet over patchified waveforms (reference :624-816)."""

    num_filters: int
    window_length: int
    stride: int
    in_channels: int
    channels: int
    multipliers: Sequence[int]
    factors: Sequence[int]
    num_blocks: Sequence[int]
    attentions: Sequence[bool]
    attention_heads: int
    attention_multiplier: float
    resnet_groups: int
    kernel_multiplier_downsample: int
    use_nearest_upsample: bool
    use_skip_scale: bool
    use_attention_bottleneck: bool
    use_condition_block: bool = False
    out_channels: Optional[int] = None
    classes_dim: Optional[int] = None
    text_dim: Optional[int] = None
    use_self_text_cond: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        t,
        classes=None,
        context=None,
        context_mask=None,
        inj_embeddings=None,
        inj_channels=None,
    ):
        num_layers = len(self.multipliers) - 1
        assert (
            len(self.factors) == num_layers
            and len(self.attentions) == num_layers
            and len(self.num_blocks) == num_layers
        )
        time_embed_dim = self.channels * 4

        # learned conv "patchify" frontend (WAVenc1d, reference :572-591)
        pad = self.window_length // 2 - self.stride // 2
        x = conv1d(
            self.num_filters,
            self.window_length,
            strides=self.stride,
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
            name="to_in",
        )(x)
        if inj_channels is not None:
            inj_channels = conv1d(
                self.num_filters,
                self.window_length,
                strides=self.stride,
                padding=pad,
                use_bias=False,
                dtype=self.dtype,
                name="condition_to_in",
            )(inj_channels)

        # time embedding
        te = LearnedSinusoidalPosEmb(self.channels)(t)
        te = nn.Dense(time_embed_dim, dtype=self.dtype, name="to_time_0")(te)
        te = nn.silu(te)
        te = nn.Dense(time_embed_dim, dtype=self.dtype, name="to_time_1")(te)

        skips_list = []
        for i in range(num_layers):
            x, skips = DownsampleBlock1d(
                in_channels=self.channels * self.multipliers[i],
                out_channels=self.channels * self.multipliers[i + 1],
                factor=self.factors[i],
                num_groups=self.resnet_groups,
                num_layers=self.num_blocks[i],
                kernel_multiplier=self.kernel_multiplier_downsample,
                use_pre_downsample=True,
                use_skip=True,
                use_attention=self.attentions[i],
                attention_heads=self.attention_heads,
                attention_multiplier=self.attention_multiplier,
                text_embed_dim=self.text_dim,
                use_self_text_cond=self.use_self_text_cond,
                dtype=self.dtype,
                name=f"down_{i}",
            )(
                x,
                te,
                classes,
                context=context,
                context_mask=context_mask,
                inj_embeddings=inj_embeddings,
                inj_channels=inj_channels,
            )
            if inj_channels is not None:
                inj_channels = DownsampleBlock1d(
                    in_channels=self.channels * self.multipliers[i],
                    out_channels=self.channels * self.multipliers[i + 1],
                    factor=self.factors[i],
                    num_groups=self.resnet_groups,
                    num_layers=self.num_blocks[i],
                    kernel_multiplier=self.kernel_multiplier_downsample,
                    use_pre_downsample=True,
                    use_skip=False,
                    use_attention=self.attentions[i],
                    attention_heads=self.attention_heads,
                    attention_multiplier=self.attention_multiplier,
                    dtype=self.dtype,
                    name=f"condition_block_{i}",
                )(inj_channels, te, classes)
            skips_list.append(skips)

        x = BottleneckBlock1d(
            channels=self.channels * self.multipliers[-1],
            num_groups=self.resnet_groups,
            use_attention=self.use_attention_bottleneck,
            attention_heads=self.attention_heads,
            attention_multiplier=self.attention_multiplier,
            text_embed_dim=self.text_dim,
            use_self_text_cond=self.use_self_text_cond,
            dtype=self.dtype,
            name="bottleneck",
        )(x, te, classes, context=context, context_mask=context_mask, inj_embeddings=inj_embeddings)

        for j, i in enumerate(reversed(range(num_layers))):
            skips = skips_list.pop()
            x = UpsampleBlock1d(
                in_channels=self.channels * self.multipliers[i + 1],
                out_channels=self.channels * self.multipliers[i],
                factor=self.factors[i],
                num_layers=self.num_blocks[i] + (1 if self.attentions[i] else 0),
                num_groups=self.resnet_groups,
                use_nearest=self.use_nearest_upsample,
                use_skip_scale=self.use_skip_scale,
                use_pre_upsample=False,
                use_skip=True,
                use_attention=self.attentions[i],
                attention_heads=self.attention_heads,
                attention_multiplier=self.attention_multiplier,
                text_embed_dim=self.text_dim,
                use_self_text_cond=self.use_self_text_cond,
                dtype=self.dtype,
                name=f"up_{j}",
            )(x, skips, te, classes, context=context, context_mask=context_mask, inj_embeddings=inj_embeddings)

        # zero-init transposed-conv head (WAVdec1d, reference :593-622)
        out_channels = self.out_channels or self.in_channels
        x = ConvTranspose1d(
            out_channels,
            kernel_size=self.window_length,
            stride=self.stride,
            padding=pad,
            use_bias=False,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="to_out",
        )(x)
        return x


class UNet1dBase(nn.Module):
    """UNet1d + CFG conditioners (reference :818-893)."""

    channels: int
    cond_drop_prob: float = 0.0
    num_classes: Optional[int] = None
    class_embed_dim: Optional[int] = None
    class_cond: bool = False
    text_cond: bool = False
    max_text_len: Optional[int] = None
    text_embed_dim: int = 768
    text_cond_multiplier: Optional[int] = None
    use_self_text_cond: bool = False
    use_condition_block: bool = False
    # UNet1d kwargs
    num_filters: int = 128
    window_length: int = 3
    stride: int = 1
    in_channels: int = 1
    multipliers: Sequence[int] = (1, 2, 4, 4)
    factors: Sequence[int] = (2, 2, 2)
    num_blocks: Sequence[int] = (2, 2, 2)
    attentions: Sequence[bool] = (False, False, True)
    attention_heads: int = 8
    attention_multiplier: float = 2.0
    resnet_groups: int = 8
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    use_attention_bottleneck: bool = True
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        t,
        classes=None,
        text_embeds=None,
        text_mask=None,
        inj_embeddings=None,
        inj_channels=None,
        cond_drop_prob: Optional[float] = None,
        cond_drop_mask=None,
    ):
        cond_drop_prob = (
            self.cond_drop_prob if cond_drop_prob is None else cond_drop_prob
        )

        classes_emb = None
        classes_channels = None
        if self.class_cond and classes is not None:
            classes_channels = self.channels * 4
            classes_emb = LabelEmbedder(
                num_classes=self.num_classes if self.class_embed_dim is None else None,
                class_embed_dim=self.class_embed_dim,
                model_channels=self.channels,
                class_channels=classes_channels,
                dtype=self.dtype,
                name="label_conditioner",
            )(classes, cond_drop_prob, cond_drop_mask)

        context = None
        text_cond_dim = None
        if self.text_cond and text_embeds is not None:
            mult = self.text_cond_multiplier or 4
            text_cond_dim = self.channels * mult
            context, text_mask = TextEmbedder(
                text_cond_dim=text_cond_dim,
                text_embed_dim=self.text_embed_dim,
                max_text_len=self.max_text_len,
                dtype=self.dtype,
                name="text_conditioner",
            )(text_embeds, text_mask, cond_drop_prob, cond_drop_mask)
        elif self.text_cond:
            mult = self.text_cond_multiplier or 4
            text_cond_dim = self.channels * mult

        return UNet1d(
            num_filters=self.num_filters,
            window_length=self.window_length,
            stride=self.stride,
            in_channels=self.in_channels,
            channels=self.channels,
            multipliers=self.multipliers,
            factors=self.factors,
            num_blocks=self.num_blocks,
            attentions=self.attentions,
            attention_heads=self.attention_heads,
            attention_multiplier=self.attention_multiplier,
            resnet_groups=self.resnet_groups,
            kernel_multiplier_downsample=self.kernel_multiplier_downsample,
            use_nearest_upsample=self.use_nearest_upsample,
            use_skip_scale=self.use_skip_scale,
            use_attention_bottleneck=self.use_attention_bottleneck,
            use_condition_block=self.use_condition_block,
            out_channels=self.out_channels,
            classes_dim=classes_channels,
            text_dim=text_cond_dim,
            use_self_text_cond=self.use_self_text_cond,
            dtype=self.dtype,
            name="unet",
        )(
            x,
            t,
            classes=classes_emb,
            context=context,
            context_mask=text_mask,
            inj_embeddings=inj_embeddings,
            inj_channels=inj_channels,
        )
