"""Descript Audio Codec (DAC): snake-activation conv codec + residual VQ +
fine-tune VAE head, for latent-diffusion support.

Capability parity with the reference ``src/models/backbones/dac/``:
layers.py (snake :17-23, Snake1d :26-32, weight-norm convs :8-13),
quantize.py (VectorQuantize factorized+l2-normalized codes w/ straight-through
:9-90, ResidualVectorQuantize w/ quantizer dropout, from_codes/from_latents
:93-251), dac.py (ResidualUnit/Encoder/Decoder/DAC :17-294) and
``dac_vae.py`` (FineTuneAutoencoder VAE bottleneck :11-77).

TPU-native notes: NWC layout ([B, T, C]); straight-through estimator via
stop_gradient; quantizer-dropout randomness from the 'quantizer' RNG
collection; codebook lookup as one-hot matmul-free argmin over cosine
distance (MXU einsum).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import WNConv, l2norm
from .unet1d import ConvTranspose1d

Dtype = Any

_trunc02 = nn.initializers.truncated_normal(0.02)


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """x + sin^2(alpha x) / alpha (reference dac/layers.py:17-23)."""
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


class Snake1d(nn.Module):
    """Per-channel learned snake activation."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
        return snake(x, alpha)


def wn_conv1d(features, kernel_size, strides=1, padding=0, dilation=1, name=None):
    return WNConv(
        features=features,
        kernel_size=(kernel_size,),
        strides=strides,
        padding=padding,
        kernel_dilation=dilation,
        kernel_init=_trunc02,
        name=name,
    )


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed conv (torch ConvTranspose1d shapes)."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        kshape = (k, x.shape[-1], self.features)
        v = self.param("v", _trunc02, kshape)
        g = self.param(
            "g", lambda key: jnp.sqrt(jnp.sum(v.reshape(-1, self.features) ** 2, axis=0))
        )
        norm = jnp.sqrt(jnp.sum(v.reshape(-1, self.features) ** 2, axis=0))
        kernel = v * (g / jnp.maximum(norm, 1e-12))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,),
            dimension_numbers=dn,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return out + bias


class ResidualUnit(nn.Module):
    """snake -> dilated conv7 -> snake -> conv1 with center-cropped residual
    (reference dac/dac.py:17-33)."""

    dim: int = 16
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d()(x)
        y = wn_conv1d(self.dim, 7, padding=pad, dilation=self.dilation)(y)
        y = Snake1d()(y)
        y = wn_conv1d(self.dim, 1)(y)
        crop = (x.shape[1] - y.shape[1]) // 2
        if crop > 0:
            x = x[:, crop:-crop]
        return x + y


class EncoderBlock(nn.Module):
    dim: int = 16
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = ResidualUnit(self.dim // 2, dilation=1)(x)
        x = ResidualUnit(self.dim // 2, dilation=3)(x)
        x = ResidualUnit(self.dim // 2, dilation=9)(x)
        x = Snake1d()(x)
        return wn_conv1d(
            self.dim,
            2 * self.stride,
            strides=self.stride,
            padding=math.ceil(self.stride / 2),
        )(x)


class Encoder(nn.Module):
    d_model: int = 64
    strides: Sequence[int] = (2, 4, 8, 8)
    d_latent: int = 64

    @nn.compact
    def __call__(self, x):
        d = self.d_model
        x = wn_conv1d(d, 7, padding=3)(x)
        for stride in self.strides:
            d *= 2
            x = EncoderBlock(d, stride=stride)(x)
        x = Snake1d()(x)
        return wn_conv1d(self.d_latent, 3, padding=1)(x)


class DecoderBlock(nn.Module):
    output_dim: int = 8
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = Snake1d()(x)
        x = WNConvTranspose1d(
            self.output_dim,
            kernel_size=2 * self.stride,
            stride=self.stride,
            padding=math.ceil(self.stride / 2),
        )(x)
        x = ResidualUnit(self.output_dim, dilation=1)(x)
        x = ResidualUnit(self.output_dim, dilation=3)(x)
        return ResidualUnit(self.output_dim, dilation=9)(x)


class Decoder(nn.Module):
    channels: int
    rates: Sequence[int]
    d_out: int = 1

    @nn.compact
    def __call__(self, x):
        x = wn_conv1d(self.channels, 7, padding=3)(x)
        output_dim = self.channels
        for i, stride in enumerate(self.rates):
            output_dim = self.channels // 2 ** (i + 1)
            x = DecoderBlock(output_dim, stride)(x)
        x = Snake1d()(x)
        x = wn_conv1d(self.d_out, 7, padding=3)(x)
        return jnp.tanh(x)


class VectorQuantize(nn.Module):
    """Factorized, l2-normalized VQ with straight-through gradients
    (reference dac/quantize.py:9-90). Operates on [B, T, D]."""

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.in_proj = wn_conv1d(self.codebook_dim, 1, name="in_proj")
        self.out_proj = wn_conv1d(self.input_dim, 1, name="out_proj")
        self.codebook = nn.Embed(self.codebook_size, self.codebook_dim, name="codebook")

    def decode_latents(self, latents):
        """latents [B, T, D] -> (z_q [B, T, D], indices [B, T])."""
        enc = l2norm(latents)
        cb = l2norm(self.codebook.embedding)
        # cosine distance == euclidean on l2-normalized vectors
        dist = (
            jnp.sum(enc**2, axis=-1, keepdims=True)
            - 2 * jnp.einsum("btd,nd->btn", enc, cb)
            + jnp.sum(cb**2, axis=-1)[None, None, :]
        )
        indices = jnp.argmin(dist, axis=-1)
        z_q = self.codebook(indices)
        return z_q, indices

    def decode_code(self, embed_id):
        return self.codebook(embed_id)

    def __call__(self, z):
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e)

        commitment_loss = jnp.mean(
            (z_e - jax.lax.stop_gradient(z_q)) ** 2, axis=(1, 2)
        )
        codebook_loss = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2, axis=(1, 2))

        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # straight-through
        z_q = self.out_proj(z_q)
        return z_q, commitment_loss, codebook_loss, indices, z_e


class ResidualVectorQuantize(nn.Module):
    """SoundStream-style RVQ with quantizer dropout (reference :93-251)."""

    input_dim: int = 512
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0

    def setup(self):
        dims = (
            [self.codebook_dim] * self.n_codebooks
            if isinstance(self.codebook_dim, int)
            else list(self.codebook_dim)
        )
        self.codebook_dims = dims
        self.quantizers = [
            VectorQuantize(self.input_dim, self.codebook_size, dims[i], name=f"vq_{i}")
            for i in range(self.n_codebooks)
        ]

    def __call__(self, z, n_quantizers: Optional[int] = None, train: bool = False):
        b = z.shape[0]
        if n_quantizers is None:
            n_quantizers = self.n_codebooks
        if train and self.quantizer_dropout > 0:
            key = self.make_rng("quantizer")
            dropout = jax.random.randint(key, (b,), 1, self.n_codebooks + 1)
            n_per_item = jnp.full((b,), self.n_codebooks + 1)
            n_dropout = int(b * self.quantizer_dropout)
            n_per_item = n_per_item.at[:n_dropout].set(dropout[:n_dropout])
        else:
            n_per_item = jnp.full((b,), n_quantizers)

        z_q = 0.0
        residual = z
        commitment_loss = 0.0
        codebook_loss = 0.0
        codebook_indices = []
        latents = []

        for i, quantizer in enumerate(self.quantizers):
            if not train and i >= n_quantizers:
                break
            z_q_i, commit_i, cb_i, indices_i, z_e_i = quantizer(residual)
            mask = (i < n_per_item).astype(z.dtype)
            z_q = z_q + z_q_i * mask[:, None, None]
            residual = residual - z_q_i
            commitment_loss = commitment_loss + jnp.mean(commit_i * mask)
            codebook_loss = codebook_loss + jnp.mean(cb_i * mask)
            codebook_indices.append(indices_i)
            latents.append(z_e_i)

        codes = jnp.stack(codebook_indices, axis=1)  # [B, N, T]
        latents = jnp.concatenate(latents, axis=-1)  # [B, T, N*D]
        return z_q, codes, latents, commitment_loss, codebook_loss

    def from_codes(self, codes):
        """codes [B, N, T] -> (z_q [B, T, D], z_p, codes)."""
        z_q = 0.0
        z_p = []
        n_codebooks = codes.shape[1]
        for i in range(n_codebooks):
            z_p_i = self.quantizers[i].decode_code(codes[:, i, :])
            z_p.append(z_p_i)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
        return z_q, jnp.concatenate(z_p, axis=-1), codes

    def from_latents(self, latents):
        """latents [B, T, sum(D_i)] -> quantized reconstruction."""
        z_q = 0.0
        z_p = []
        codes = []
        dims = [0]
        for d in self.codebook_dims:
            dims.append(dims[-1] + d)
        n_codebooks = max(i for i in range(len(dims)) if dims[i] <= latents.shape[-1])
        for i in range(n_codebooks):
            j, k = dims[i], dims[i + 1]
            z_p_i, codes_i = self.quantizers[i].decode_latents(latents[:, :, j:k])
            z_p.append(z_p_i)
            codes.append(codes_i)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
        return z_q, jnp.concatenate(z_p, axis=-1), jnp.stack(codes, axis=1)


class DAC(nn.Module):
    """Full codec (reference dac/dac.py:140-294). Audio is [B, T, 1]."""

    encoder_dim: int = 64
    encoder_rates: Sequence[int] = (2, 4, 8, 8)
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: Sequence[int] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0

    def setup(self):
        latent_dim = self.latent_dim or self.encoder_dim * (2 ** len(self.encoder_rates))
        self._latent = latent_dim
        self.encoder = Encoder(self.encoder_dim, self.encoder_rates, latent_dim)
        self.quantizer = ResidualVectorQuantize(
            input_dim=latent_dim,
            n_codebooks=self.n_codebooks,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
            quantizer_dropout=self.quantizer_dropout,
        )
        self.decoder = Decoder(self.decoder_dim, self.decoder_rates)

    def encode(self, audio_data, n_quantizers=None, train: bool = False):
        z = self.encoder(audio_data)
        return self.quantizer(z, n_quantizers, train=train)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, audio_data, n_quantizers=None, train: bool = False):
        length = audio_data.shape[1]
        z, codes, latents, commitment_loss, codebook_loss = self.encode(
            audio_data, n_quantizers, train=train
        )
        x = self.decode(z)
        return {
            "audio": x[:, :length],
            "z": z,
            "codes": codes,
            "latents": latents,
            "vq/commitment_loss": commitment_loss,
            "vq/codebook_loss": codebook_loss,
        }


def kl_loss(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    losses = mean**2 + jnp.exp(logvar) - logvar - 1.0
    return 0.5 * jnp.mean(jnp.sum(losses, axis=(1, 2)), axis=0)


class FineTuneAutoencoder(nn.Module):
    """VAE bottleneck fine-tuned on frozen-DAC embeddings (dac_vae.py:11-77)."""

    intermediate_embedding_size: Sequence[int] = (1024, 512, 256, 128)
    conv_kernel: int = 3
    tanh_btnk: bool = False
    latent_dim: int = 32

    @nn.compact
    def __call__(self, x, is_train: bool = True):
        sizes = list(self.intermediate_embedding_size)
        assert sizes[0] == 1024, "original DAC embedding size"

        for out_ch in sizes[1:]:
            x = Snake1d()(x)
            x = wn_conv1d(out_ch, self.conv_kernel, padding=1)(x)

        mean_and_logvar = nn.Conv(self.latent_dim * 2, (1,), name="btnk")(x)
        mean, logvar = jnp.split(mean_and_logvar, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        if self.tanh_btnk:
            mean = jnp.tanh(mean)
        kl = kl_loss(mean, logvar)

        if is_train:
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(self.make_rng("vae"), std.shape)
        else:
            z = mean

        x = wn_conv1d(sizes[-1], self.conv_kernel, padding=1)(z)
        for out_ch in sizes[::-1][1:]:
            x = Snake1d()(x)
            x = wn_conv1d(out_ch, self.conv_kernel, padding=1)(x)
        return x, kl
