"""Shared Flax building blocks for the denoiser backbones.

Capability parity with the reference's layer helpers
(``src/models/backbones/layer_utils.py``, ``operator_utils.py`` and the block
zoo inside ``unet2d.py:19-320``), re-expressed as linen modules in **NHWC**
layout — channels-last is the TPU-native layout (convolutions tile onto the
MXU without transposes, and channel LayerNorm becomes a plain last-axis
reduction).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def l2norm(t: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    denom = jnp.sqrt(jnp.sum(t * t, axis=axis, keepdims=True))
    return t / jnp.maximum(denom, eps)


def prob_keep_mask(key: jax.Array, batch: int, keep_prob: float) -> jnp.ndarray:
    """Bernoulli keep-mask for classifier-free-guidance dropout."""
    return jax.random.uniform(key, (batch,)) < keep_prob


class ImagenLayerNorm(nn.Module):
    """g-only LayerNorm with biased variance (reference layer_utils.py:14-32).

    In NHWC both the imagen token LayerNorm (dim=-1) and the channel LayerNorm
    (dim=-3 in NCHW) normalize the last axis.
    """

    stable: bool = False
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (feats,))
        if self.stable:
            x = x / jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (out * g).astype(x.dtype)


class WNConv(nn.Module):
    """Weight-normalized conv: kernel = g * v / ||v|| (per output channel).

    Covers the reference's ``cond_weight_norm`` (layer_utils.py:9-12, with
    N(0, 0.01) direction init) and the DAC codec's weight-norm convs.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Any = None
    padding: Any = "SAME"
    kernel_dilation: Any = None
    transpose: bool = False
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.normal(0.01)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ndim_sp = len(self.kernel_size)
        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        v = self.param("v", self.kernel_init, kshape)
        g = self.param(
            "g",
            lambda key: jnp.sqrt(
                jnp.sum(v.reshape(-1, self.features) ** 2, axis=0)
            ),
        )
        norm = jnp.sqrt(jnp.sum(v.reshape(-1, self.features) ** 2, axis=0))
        kernel = v * (g / jnp.maximum(norm, 1e-12))

        strides = self.strides or (1,) * ndim_sp
        if isinstance(strides, int):
            strides = (strides,) * ndim_sp
        dilation = self.kernel_dilation or (1,) * ndim_sp
        if isinstance(dilation, int):
            dilation = (dilation,) * ndim_sp
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if ndim_sp == 1:
            dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
        else:
            dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        if self.transpose:
            out = jax.lax.conv_transpose(
                x, kernel, strides, self.padding, dimension_numbers=dn
            )
        else:
            padding = self.padding
            if isinstance(padding, int):
                padding = [(padding, padding)] * ndim_sp
            out = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=strides,
                padding=padding,
                rhs_dilation=dilation,
                dimension_numbers=dn,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, 2H, 2W, C] nearest-neighbour."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class Upsample(nn.Module):
    """Nearest 2x upsample + 3x3 conv (reference unet2d.py:19-25)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        return nn.Conv(self.dim_out, (3, 3), dtype=self.dtype)(x)


def _static_act_scale(mod: nn.Module, x: jnp.ndarray):
    """Shared calibration seam for the W8A8 static-scale path: read the
    calibrated ``quant``/act_scale if bound, else sow the running absmax
    into ``quant_stats`` (no-op unless applied with that collection
    mutable — see ops/quant.stats_to_scales)."""
    if mod.has_variable("quant", "act_scale"):
        return mod.variable("quant", "act_scale", lambda: jnp.ones(())).value
    mod.sow(
        "quant_stats",
        "act_absmax",
        jnp.max(jnp.abs(x.astype(jnp.float32))),
        reduce_fn=jnp.maximum,
        init_fn=lambda: jnp.zeros(()),
    )
    return None


def _pixel_shuffle_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform kernel replicated over the 4 sub-pixels so the
    upsample starts smooth (anti-checkerboard; reference unet2d.py:45-52)."""
    kh, kw, cin, cout4 = shape
    base = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")(
        key, (kh, kw, cin, cout4 // 4), dtype
    )
    return jnp.repeat(base, 4, axis=-1)


class PixelShuffleUpsample(nn.Module):
    """1x1 conv to 4x channels, SiLU, depth-to-space (reference :27-55).

    Evaluated as ONE 2x2 stride-2 transposed conv + per-subpixel bias + SiLU:
    identical math (SiLU commutes with the pixel-shuffle permutation), but no
    materialized depth-to-space transpose — on the v5e the old formulation's
    transpose+mul was the #2 HBM consumer of the whole sampling profile.
    Parameter layout is unchanged (Conv_0/{kernel [1,1,C,4*dim_out], bias})."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _PixelShuffleConv(
            dim_out=self.dim_out, dtype=self.dtype, name="Conv_0"
        )(x)


class _PixelShuffleConv(nn.Module):
    """Param-compatible core of Upsample: holds the [1,1,C,4*dim_out] kernel
    of the original 1x1 conv and applies it as a flipped 2x2 lhs-dilated conv
    (= transposed conv), then per-subpixel bias + SiLU."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        d = self.dim_out
        kernel = self.param(
            "kernel", _pixel_shuffle_init, (1, 1, c, 4 * d)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (4 * d,))
        # out[2y+i, 2x+j, d] = sum_c x[y,x,c] * W[c, d*4+i*2+j]  (shuffle of
        # the 1x1 conv). As lhs-dilated conv the kernel is spatially flipped.
        from ..ops.quant import int8_conv, int8_conv_eligible, int8_seam_enabled

        k = kernel.reshape(c, d, 2, 2).transpose(2, 3, 0, 1)[::-1, ::-1]
        if int8_seam_enabled() and int8_conv_eligible(c, 4 * d):
            out = int8_conv(
                x.astype(self.dtype),
                k,
                strides=(1, 1),
                padding=((1, 1), (1, 1)),
                lhs_dilation=(2, 2),
                act_scale=_static_act_scale(self, x),
            )
        else:
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                k.astype(self.dtype),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # bias varies per (i, j) subpixel: pure-reshape broadcast (no copy)
        bias_ij = bias.reshape(d, 2, 2).transpose(1, 2, 0).astype(self.dtype)
        out = out.reshape(b, h, 2, w, 2, d)
        out = out + bias_ij[None, :, None, :, :][None]
        out = nn.silu(out)
        return out.reshape(b, 2 * h, 2 * w, d)


class Downsample(nn.Module):
    """Space-to-depth ('pixel unshuffle') + 1x1 conv (reference :57-64).

    Evaluated as ONE 2x2 stride-2 conv: identical math, but no materialized
    space-to-depth transpose (the #1 HBM consumer in the v5e sampling
    profile). Parameter layout is unchanged (Conv_0/{kernel [1,1,4C,dim_out],
    bias})."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _SpaceToDepthConv(
            dim_out=self.dim_out, dtype=self.dtype, name="Conv_0"
        )(x)


class _SpaceToDepthConv(nn.Module):
    """Param-compatible core of Downsample: holds the [1,1,4C,dim_out] kernel
    of the original 1x1 conv and applies it as a 2x2 stride-2 conv."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, 4 * c, self.dim_out)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.dim_out,)
        )
        # space-to-depth channel m = c*4 + i*2 + j  ->  kernel [2,2,C,out]
        from ..ops.quant import int8_conv, int8_conv_eligible, int8_seam_enabled

        k = kernel.reshape(c, 2, 2, self.dim_out).transpose(1, 2, 0, 3)
        if int8_seam_enabled() and int8_conv_eligible(c, self.dim_out):
            return int8_conv(
                x.astype(self.dtype),
                k,
                bias,
                strides=(2, 2),
                padding="VALID",
                act_scale=_static_act_scale(self, x),
            )
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k.astype(self.dtype),
            window_strides=(2, 2),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(self.dtype)


class LearnedSinusoidalPosEmb(nn.Module):
    """crowsonkb's learned Fourier time embedding (reference :66-81)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,))
        freqs = t[:, None] * w[None, :] * 2 * jnp.pi
        return jnp.concatenate([t[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


def _winograd_dispatch(x_shape, dim_out: int) -> bool:
    """Route the Block's SiLU+3x3 conv through the fused Winograd Pallas
    kernel on TPU at eligible shapes (ops/winograd_pallas.winograd_eligible)."""
    from ..ops.winograd_pallas import winograd_eligible

    import os

    if jax.devices()[0].platform not in ("tpu", "axon") and not (
        os.environ.get("ADT_WINO_INTERPRET") == "1"
    ):
        return False
    w_shape = (3, 3, x_shape[-1], dim_out)
    return winograd_eligible(x_shape, w_shape, (1, 1), "SAME")


class _FusedBlockConv(nn.Module):
    """3x3 SAME conv with nn.Conv-compatible params (kernel/bias names,
    HWIO layout, lecun-normal init) whose forward runs the fused
    scale/shift+SiLU Winograd Pallas kernel. Gradients fall back to the
    standard XLA conv VJP (ops/winograd_pallas.fused_scale_shift_silu_conv3x3)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale=None, shift=None):
        from ..ops.winograd_pallas import fused_scale_shift_silu_conv3x3

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        y = fused_scale_shift_silu_conv3x3(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            None if scale is None else scale.astype(self.dtype),
            None if shift is None else shift.astype(self.dtype),
        )
        return y + bias.astype(self.dtype)


class QuantConv(nn.Module):
    """nn.Conv-compatible conv that rides the W8A8 int8 path under
    ``ADT_INT8_ALL=1`` (extended-coverage tier: non-GN-normalised inputs
    like 1x1 residual projections and strided downsamples). Param tree is
    identical to nn.Conv, so checkpoints interchange; calibration uses the
    same quant_stats sow / 'quant' static-scale collections as Block."""

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_all_enabled, int8_conv, int8_conv_eligible

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        if int8_all_enabled() and int8_conv_eligible(x.shape[-1], self.features):
            act_scale = None
            if self.has_variable("quant", "act_scale"):
                act_scale = self.variable(
                    "quant", "act_scale", lambda: jnp.ones(())
                ).value
            else:
                self.sow(
                    "quant_stats",
                    "act_absmax",
                    jnp.max(jnp.abs(x.astype(jnp.float32))),
                    reduce_fn=jnp.maximum,
                    init_fn=lambda: jnp.zeros(()),
                )
            return int8_conv(
                x.astype(self.dtype), kernel, bias,
                strides=self.strides, padding=self.padding,
                act_scale=act_scale,
            )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            self.strides,
            self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class QuantDense(nn.Module):
    """nn.Dense-compatible matmul that rides the W8A8 int8 path under
    ``ADT_INT8=1`` when the shapes are lane-aligned (128-multiple in/out).

    Used for the attention QKV/out projections and transformer feedforwards
    at the deep UNet levels: their inputs are LayerNorm-normalised, the same
    bounded-range regime as Block's GroupNorm-normalised conv inputs, so the
    same static-calibration scheme applies (sow ``quant_stats``/read
    ``quant`` collections — see ops/quant.py). Param tree is identical to
    nn.Dense, so checkpoints interchange."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_dense, int8_dense_eligible

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        if int8_dense_eligible(x.shape[-1], self.features):
            act_scale = None
            if self.has_variable("quant", "act_scale"):
                act_scale = self.variable(
                    "quant", "act_scale", lambda: jnp.ones(())
                ).value
            else:
                self.sow(
                    "quant_stats",
                    "act_absmax",
                    jnp.max(jnp.abs(x.astype(jnp.float32))),
                    reduce_fn=jnp.maximum,
                    init_fn=lambda: jnp.zeros(()),
                )
            y = int8_dense(x.astype(self.dtype), kernel, act_scale=act_scale)
        else:
            y = jnp.einsum(
                "...i,io->...o", x.astype(self.dtype), kernel.astype(self.dtype)
            )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class _GroupNormParams(nn.Module):
    """Declares nn.GroupNorm-compatible scale/bias params without applying
    the norm (for the fused Block kernel, which folds the stats itself)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return scale, bias


class Block(nn.Module):
    """GroupNorm -> (FiLM scale/shift) -> SiLU -> 3x3 conv (reference :83-104).

    On TPU, ``ADT_FUSED_BLOCK=1`` opts eligible shapes into running the
    whole chain as ONE fused Pallas kernel (ops/fused_block.py: XLA stats
    pass + fused affine/SiLU/direct-conv; param tree identical to the
    composite path, so checkpoints interchange). The default is the
    composite XLA path, which measured faster in-model (PROFILE.md); the
    Winograd variant is likewise opt-in via ``ADT_WINOGRAD=1``.

    Precedence: the W8A8 int8 serving path (``ADT_INT8=1``) wins over the
    fused kernel — int8 is the measured-faster default and the fused kernel
    has no int8 variant, so taking it would silently drop quantization
    (and calibration sowing) for Block convs."""

    dim_out: int
    groups: int = 8
    norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift: Optional[Tuple] = None):
        from ..ops.fused_block import fused_block_eligible, fused_gn_film_silu_conv3x3
        from ..ops.quant import int8_conv_eligible as _int8_elig

        if (
            self.norm
            and not _winograd_dispatch(x.shape, self.dim_out)
            and fused_block_eligible(x.shape, self.dim_out)
            # int8 serving wins over the fused kernel (see class docstring)
            and not _int8_elig(x.shape[-1], self.dim_out)
        ):
            gamma, beta = _GroupNormParams(x.shape[-1], name="GroupNorm_0")()
            kernel, bias = _ConvParams(self.dim_out, 3, name="Conv_0")(x.shape[-1])
            scale = shift = None
            if scale_shift is not None:
                s, t = scale_shift
                scale, shift = s + 1.0, t
            return fused_gn_film_silu_conv3x3(
                x.astype(self.dtype),
                gamma,
                beta,
                scale,
                shift,
                kernel,
                bias,
                self.groups,
            )
        if self.norm:
            x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype)(x)
        scale = shift = None
        if scale_shift is not None:
            s, t = scale_shift
            scale, shift = s + 1.0, t
        if _winograd_dispatch(x.shape, self.dim_out):
            return _FusedBlockConv(self.dim_out, dtype=self.dtype, name="Conv_0")(
                x, scale, shift
            )
        if scale is not None:
            x = x * scale + shift
        x = nn.silu(x)
        from ..ops.quant import int8_conv, int8_conv_eligible

        if int8_conv_eligible(x.shape[-1], self.dim_out):
            kernel, bias = _ConvParams(self.dim_out, 3, name="Conv_0")(x.shape[-1])
            act_scale = None
            if self.has_variable("quant", "act_scale"):
                # static calibrated scale: quantization fuses into the
                # SiLU producer (no dynamic absmax pass)
                act_scale = self.variable(
                    "quant", "act_scale", lambda: jnp.ones(())
                ).value
            else:
                # calibration capture: running max of the conv input absmax
                # (no-op unless applied with mutable=["quant_stats"])
                self.sow(
                    "quant_stats",
                    "act_absmax",
                    jnp.max(jnp.abs(x.astype(jnp.float32))),
                    reduce_fn=jnp.maximum,
                    init_fn=lambda: jnp.zeros(()),
                )
            y = int8_conv(x.astype(self.dtype), kernel, bias,
                          act_scale=act_scale)
            return self._maybe_store_s8(y)
        return nn.Conv(self.dim_out, (3, 3), dtype=self.dtype)(x)

    def _maybe_store_s8(self, y):
        """s8 activation storage for the conv output (``ADT_INT8_STORE``):
        snap onto the int8 grid of a calibrated static scale, so the map is
        materialised in HBM at half the bytes — the downstream GroupNorm
        normalise/FiLM/SiLU pass and residual/GCA reads are HBM-bound on
        these full-resolution maps (PROFILE.md)."""
        from ..ops.quant import int8_store_enabled, quant_store

        if not int8_store_enabled():
            return y
        if self.has_variable("quant", "out_scale"):
            return quant_store(
                y, self.variable("quant", "out_scale", lambda: jnp.ones(())).value
            )
        self.sow(
            "quant_stats",
            "out_absmax",
            jnp.max(jnp.abs(y.astype(jnp.float32))),
            reduce_fn=jnp.maximum,
            init_fn=lambda: jnp.zeros(()),
        )
        return y


class GlobalContext(nn.Module):
    """Squeeze-excite with attention pooling (reference :170-195)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        context = nn.Conv(1, (1, 1), dtype=self.dtype)(x)  # [B,H,W,1]
        attn = jax.nn.softmax(context.reshape(b, h * w), axis=-1)
        pooled = jnp.einsum("bn,bnc->bc", attn, x.reshape(b, h * w, c))
        pooled = pooled[:, None, None, :]  # [B,1,1,C]
        hidden = max(3, self.dim_out // 2)
        out = nn.Conv(hidden, (1, 1), dtype=self.dtype)(pooled)
        out = nn.silu(out)
        out = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(out)
        return jax.nn.sigmoid(out)


class _ConvParams(nn.Module):
    """Declares nn.Conv-compatible kernel/bias params without applying them
    (for modules that evaluate several branches as one fused conv)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class CrossEmbedLayer(nn.Module):
    """Multi-kernel-size conv stem (reference :260-286).

    Evaluated as ONE conv: each branch kernel is zero-embedded at the centre
    of a max-size kernel (identical math for the reference's aligned-padding
    branches), so the input is read once instead of once per branch and the
    per-branch bias adds + concat disappear — on the v5e profile the separate
    15x15 stem conv + bias adds were ~7% of sampling time. Parameter layout
    is unchanged (Conv_0..Conv_n with per-branch shapes)."""

    dim_out: int
    kernel_sizes: Sequence[int]
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        kernel_sizes = sorted(self.kernel_sizes)
        num_scales = len(kernel_sizes)
        dim_scales = [self.dim_out // (2**i) for i in range(1, num_scales)]
        dim_scales = [*dim_scales, self.dim_out - sum(dim_scales)]
        cin = x.shape[-1]
        k_max = kernel_sizes[-1]
        pad_max = (k_max - self.stride) // 2
        # ADT_FUSED_STEM=0 selects the per-branch composite (identical math;
        # used for honest analytic-FLOPs counting and ablation)
        fuse = os.environ.get("ADT_FUSED_STEM", "1") != "0"

        params = []
        for i, (kernel, dim_scale) in enumerate(zip(kernel_sizes, dim_scales)):
            kern, bias = _ConvParams(
                features=dim_scale, kernel_size=kernel, name=f"Conv_{i}"
            )(cin)
            params.append((kernel, dim_scale, kern, bias))

        if not fuse:
            fmaps = []
            for kernel, dim_scale, kern, bias in params:
                pad = (kernel - self.stride) // 2
                fmaps.append(
                    jax.lax.conv_general_dilated(
                        x.astype(self.dtype),
                        kern.astype(self.dtype),
                        window_strides=(self.stride, self.stride),
                        padding=[(pad, pad), (pad, pad)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    + bias.astype(self.dtype)
                )
            return jnp.concatenate(fmaps, axis=-1)

        # Cluster adjacent kernel sizes and evaluate each cluster as ONE
        # conv, embedding each branch kernel zero-padded at the centre of
        # the cluster-max window (identical math for the reference's
        # aligned-padding branches). Clustering bounds the zero-pad FLOP
        # blow-up ({3,7}+{15} is ~100 GFLOP of padded work vs 240 GFLOP
        # all-in-one), but the v5e ablation (2026-08-17) measured the
        # all-in-one max-kernel stem FASTER end-to-end: 17.90 vs 16.34
        # samples/s — two strided stem convs cost more in launch + relayout
        # than the padded FLOPs they save, because the big fused conv still
        # runs on the MXU at a higher absolute rate. Default is therefore
        # the all-in-one fusion; ADT_STEM_CLUSTER=1 opts into clustering
        # (useful on smaller parts where the padded FLOPs dominate).
        if os.environ.get("ADT_STEM_CLUSTER", "0") == "0":
            clusters = [list(params)]  # all-in-one max-kernel fusion (ablation)
        else:
            clusters = []
            for branch in params:
                if clusters and (branch[0] / clusters[-1][0][0]) ** 2 <= 6:
                    clusters[-1].append(branch)
                else:
                    clusters.append([branch])
        fmaps = []
        for cluster in clusters:
            k_c = max(b[0] for b in cluster)
            pad_c = (k_c - self.stride) // 2
            dim_c = sum(b[1] for b in cluster)
            fused = jnp.zeros((k_c, k_c, cin, dim_c), jnp.float32)
            biases, start = [], 0
            for kernel, dim_scale, kern, bias in cluster:
                pad = (kernel - self.stride) // 2
                # branch output o taps x[o*s - pad_i + t]; embedding at
                # offset pad_c - pad_i inside the cluster window reproduces
                # them exactly
                off = pad_c - pad
                fused = fused.at[
                    off : off + kernel,
                    off : off + kernel,
                    :,
                    start : start + dim_scale,
                ].set(kern.astype(jnp.float32))
                biases.append(bias)
                start += dim_scale
            bias = jnp.concatenate(biases)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                fused.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad_c, pad_c), (pad_c, pad_c)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            fmaps.append(out + bias.astype(self.dtype))
        return fmaps[0] if len(fmaps) == 1 else jnp.concatenate(fmaps, axis=-1)


def resize_image_to(image: jnp.ndarray, target_size: int) -> jnp.ndarray:
    """Nearest resize on the trailing spatial dims (NHWC)."""
    b, h, w, c = image.shape
    if w == target_size and h == target_size:
        return image
    return jax.image.resize(image, (b, target_size, target_size, c), method="nearest")
