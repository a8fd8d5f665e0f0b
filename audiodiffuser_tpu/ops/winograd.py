"""Winograd F(2x2, 3x3) convolution for the UNet's stride-1 SAME 3x3 convs.

The FLOPs hotspot of the flagship spectrogram UNet (reference
``src/models/backbones/unet2d.py:83-104`` Block = GroupNorm+SiLU+3x3 conv) is
MXU-bound through XLA's implicit-GEMM conv lowering at ~60% of the chip's
dense-matmul rate. Winograd F(2x2,3x3) replaces each 2x2 output tile's 9-tap
convolution with a 4x4 transformed elementwise product — 2.25x fewer MXU
multiplies — turning the conv into 16 dense (tiles x Cin) @ (Cin x Cout)
matmuls that run at full matmul rate.

Two implementations:
- ``winograd_conv3x3_xla``: pure-jnp einsum form (correctness reference; the
  transformed activations round-trip HBM, so it is bandwidth-bound).
- ``winograd_conv3x3`` (ops/winograd_pallas.py): fused Pallas kernel — input
  transform, 16 matmuls and inverse transform in VMEM, with an optional
  fused scale/shift + SiLU prologue (the GroupNorm epilogue).

Transforms (Lavin & Gray 2015, eq. F(2x2,3x3)):
    Y = A^T [ (G g G^T) (.) (B^T d B) ] A
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# B^T (4x4), G (4x3), A^T (2x4)
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def transform_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Cin, Cout] -> U [4, 4, Cin, Cout] = G w G^T (fp32)."""
    w = w.astype(jnp.float32)
    return jnp.einsum("ak,bl,klio->abio", G, G, w)


def _input_tiles(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] (H, W even) -> d [B, H/2, W/2, 4, 4, C]: overlapping 4x4
    patches at stride 2 from the SAME-padded input."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for i in range(4):
        cols = []
        for j in range(4):
            cols.append(xp[:, i : i + h : 2, j : j + w : 2, :])
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)  # [B, th, tw, 4(i), 4(j), C]


def winograd_conv3x3_xla(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv via Winograd F(2x2,3x3), pure XLA ops.

    x: [B, H, W, Cin] (H, W even), w: [3, 3, Cin, Cout] -> [B, H, W, Cout].
    Transforms run in fp32; the 16 channel-contraction matmuls keep x's dtype
    (bf16 in the flagship) with fp32 accumulation.
    """
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    d = _input_tiles(x)
    v = jnp.einsum("ai,bj,BhwijC->BhwabC", BT, BT, d.astype(jnp.float32))
    u = transform_kernel(w)
    m = jnp.einsum(
        "BhwabC,abCD->BhwabD",
        v.astype(x.dtype),
        u.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    y = jnp.einsum("pa,qb,BhwabD->BhwpqD", AT, AT, m)
    # [B, th, tw, 2, 2, Co] -> [B, H, W, Co]
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, co)
    return y.astype(x.dtype)
