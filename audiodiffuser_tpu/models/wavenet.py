"""DiffWave-style WaveNet denoiser for unconditional waveform diffusion.

Capability parity with the reference ``src/models/backbones/wavenet.py``:
scalar WeightNorm (:15-55 — note: a single g for the whole kernel, unlike
per-channel weight norm), ZeroConv1d (:57-66), kaiming+weight-norm Conv
(:68-82), power-of-2 sinusoidal diffusion embedding (:88-92), gated-tanh
dilated ResidualBlock (:94-115), ResidualGroup with dilation cycle and
1/sqrt(N) skip normalisation (:117-151), WaveNetNoise (:153-180).

TPU-native notes: NWC layout; dilated convolutions lower to XLA's dilated
convolution (MXU); the swish/gated activations fuse into the surrounding ops.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ScalarWNConv1d(nn.Module):
    """Conv1d with scalar weight norm w = g * v/||v|| (one g per kernel)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        kshape = (k, x.shape[-1], self.features)
        v = self.param(
            "v", nn.initializers.variance_scaling(2.0, "fan_in", "normal"), kshape
        )
        g = self.param("g", lambda key: jnp.linalg.norm(v.reshape(-1)))
        kernel = v * (g / jnp.maximum(jnp.linalg.norm(v.reshape(-1)), 1e-12))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=dn,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return out + bias


def diffusion_embedding(diffusion_step: jnp.ndarray, dim_in: int) -> jnp.ndarray:
    """Sinusoidal noise-level embedding (reference :88-92)."""
    half = dim_in // 2
    dim_vec = jnp.arange(half, dtype=jnp.float32)
    table = diffusion_step[:, None] * jnp.exp(-dim_vec * 4.0 / (half - 1))
    return jnp.concatenate([jnp.sin(table), jnp.cos(table)], axis=1)


def swish(x):
    return x * jax.nn.sigmoid(x)


class ResidualBlock(nn.Module):
    """Gated-tanh dilated conv block (reference :94-115)."""

    residual_channels: int
    dilation: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, diffusion_embed):
        proj = nn.Dense(self.residual_channels, dtype=self.dtype, name="diffusion_projection")(
            diffusion_embed
        )
        y = x + proj[:, None, :]
        y = ScalarWNConv1d(
            2 * self.residual_channels, 3, dilation=self.dilation, dtype=self.dtype,
            name="dilated_conv",
        )(y)
        gate, filters = jnp.split(y, 2, axis=-1)
        out = jax.nn.sigmoid(gate) * jnp.tanh(filters)
        out = ScalarWNConv1d(
            2 * self.residual_channels, 1, dtype=self.dtype, name="output_projection"
        )(out)
        residual, skip = jnp.split(out, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class ResidualGroup(nn.Module):
    """Dilation-cycle stack with skip accumulation (reference :117-151)."""

    res_channels: int
    num_res_layers: int = 30
    dilation_cycle: int = 10
    dim_in: int = 128
    dim_mid: int = 512
    dim_out: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, diffusion_step):
        emb = diffusion_embedding(diffusion_step, self.dim_in)
        emb = swish(nn.Dense(self.dim_mid, dtype=self.dtype, name="fc_t1")(emb))
        emb = swish(nn.Dense(self.dim_out, dtype=self.dtype, name="fc_t2")(emb))

        h = x
        skip = 0.0
        for n in range(self.num_res_layers):
            h, skip_n = ResidualBlock(
                self.res_channels,
                dilation=2 ** (n % self.dilation_cycle),
                dtype=self.dtype,
                name=f"res_{n}",
            )(h, emb)
            skip = skip + skip_n
        return skip * math.sqrt(1.0 / self.num_res_layers)


class WaveNetNoise(nn.Module):
    """Unconditional DiffWave (reference :153-180). Input [B, T] or [B, T, 1]."""

    residual_channels: int = 256
    residual_layers: int = 36
    dilation_cycle: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio, diffusion_step, **_):
        squeeze = audio.ndim == 2
        x = audio[..., None] if squeeze else audio
        x = ScalarWNConv1d(self.residual_channels, 1, dtype=self.dtype, name="input_projection")(x)
        x = jax.nn.relu(x)
        x = ResidualGroup(
            res_channels=self.residual_channels,
            num_res_layers=self.residual_layers,
            dilation_cycle=self.dilation_cycle,
            dtype=self.dtype,
            name="residual_layer",
        )(x, diffusion_step)
        x = ScalarWNConv1d(self.residual_channels, 1, dtype=self.dtype, name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(
            1,
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="output_projection",
        )(x)
        return x[..., 0] if squeeze else x
