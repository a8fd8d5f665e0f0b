"""Small pure-jnp tensor helpers shared by diffusion objectives and samplers.

Capability parity with ``src/models/components/utils.py`` of the reference
(extend_dim ``:16-18``, clip ``:20-33``, to_batch ``:41-52``), re-expressed as
jit-safe pure functions.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp


def extend_dim(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Append trailing singleton axes until ``x.ndim == ndim``.

    e.g. a per-batch sigma of shape [B] becomes [B, 1, 1, 1] for ndim=4 so it
    broadcasts against [B, C, H, W] activations.
    """
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def clip(x: jnp.ndarray, dynamic_threshold: float = 0.0) -> jnp.ndarray:
    """Clamp to [-1, 1], or apply Imagen-style dynamic thresholding.

    With ``dynamic_threshold = q`` in (0, 1): per-sample, take the q-quantile of
    |x|, floor it at 1, clamp x to [-s, s] and rescale by 1/s.
    """
    if dynamic_threshold == 0.0:
        return jnp.clip(x, -1.0, 1.0)
    flat = jnp.abs(x.reshape(x.shape[0], -1))
    scale = jnp.quantile(flat, dynamic_threshold, axis=-1)
    scale = jnp.maximum(scale, 1.0)
    scale = extend_dim(scale, x.ndim)
    return jnp.clip(x, -scale, scale) / scale


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_length] bool mask (True inside the sequence).

    jit-safe variant of the reference's sequence_mask/lengths_to_mask
    (operator_utils.py:11-34): max_length must be static under jit.
    """
    positions = jnp.arange(max_length)
    return positions[None, :] < lengths[:, None]


def to_batch(
    batch_size: int,
    sigma: Optional[Union[float, jnp.ndarray]] = None,
    sigmas: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Return a [B] vector of noise levels from either a scalar or a vector."""
    if sigmas is not None:
        sigmas = jnp.asarray(sigmas, dtype=dtype)
        if sigmas.ndim == 0:
            sigmas = jnp.full((batch_size,), sigmas, dtype=dtype)
        return sigmas
    if sigma is None:
        raise ValueError("either sigma or sigmas must be provided")
    return jnp.full((batch_size,), sigma, dtype=dtype)
