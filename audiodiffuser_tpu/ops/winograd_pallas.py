"""Fused Winograd F(2x2,3x3) conv Pallas kernel (see ops/winograd.py for the
algorithm and the XLA reference implementation).

Pipeline:
  1. ``polyphase_decompose`` (XLA, one fused elementwise pass; optionally
     fuses a scale/shift + SiLU prologue, i.e. the GroupNorm epilogue of the
     UNet Block): x [B,H,W,C] -> phases [B,2,2,H/2+1,W/2+1,C] where
     phases[i,j] = pad(x,1)[i::2, j::2]. Every Winograd input-tile slice
     d_ij is then a *unit-stride* shifted window of a phase plane — no
     strided VMEM access, no halo blocks.
  2. Pallas kernel, grid (B, Co-blocks): per program, transform the full
     tile plane (V = B^T d B as +/- sums on the VPU), 16 channel-contraction
     matmuls against the pre-transformed kernel U (MXU, fp32 accumulation),
     inverse transform (A^T M A), all in VMEM. HBM sees x once in and y once
     out — the 2.25x multiply reduction comes with no transform traffic.
  3. ``polyphase_reassemble`` (XLA): [B,2,2,H/2,W/2,Co] -> [B,H,W,Co].

Used by the UNet Block at inference for stride-1 SAME 3x3 convs with even
H, W and Cin, Cout >= 128 (ADT_WINOGRAD=0 disables; =1 forces where legal).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .winograd import transform_kernel

# B^T row combinations: V row transform. BT = [[1,0,-1,0],[0,1,1,0],
# [0,-1,1,0],[0,1,0,-1]]; A^T = [[1,1,1,0],[0,1,-1,-1]].


def polyphase_decompose(x, scale=None, shift=None, silu: bool = False):
    """[B, H, W, C] -> [B, 2, 2, H/2+1, W/2+1, C]; optional fused
    y = silu(x * scale + shift) prologue (scale/shift broadcastable)."""
    if scale is not None:
        x = x * scale
    if shift is not None:
        x = x + shift
    if silu:
        x = jax.nn.silu(x)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = [
        jnp.stack([xp[:, i::2, j::2, :] for j in range(2)], axis=1)
        for i in range(2)
    ]
    return jnp.stack(rows, axis=1)  # [B, 2, 2, H/2+1, W/2+1, C]


def polyphase_reassemble(y):
    """[B, 2, 2, TH, TW, Co] -> [B, 2*TH, 2*TW, Co]."""
    b, _, _, th, tw, co = y.shape
    # [B, TH, 2(p), TW, 2(q), Co]
    y = y.transpose(0, 3, 1, 4, 2, 5)
    return y.reshape(b, 2 * th, 2 * tw, co)


def _winograd_kernel(phases_ref, u_ref, out_ref, *, th, tw, ci, co_b, out_dtype):
    """One (batch item, Co-block): full tile-plane Winograd in VMEM.

    phases_ref: [1, 2, 2, TH+1, TW+1, Ci]
    u_ref:      [16, Ci, Co_b]  (G w G^T, positions flattened row-major)
    out_ref:    [1, 2, 2, TH, TW, Co_b]  (polyphase output)
    """
    # d_ij(ty,tx) = xp[2ty+i, 2tx+j] = phases[i%2, j%2][ty + i//2, tx + j//2]
    def d(i, j):
        return phases_ref[0, i % 2, j % 2, i // 2 : i // 2 + th,
                          j // 2 : j // 2 + tw, :].astype(jnp.float32)

    # row transform R_a,j = sum_i BT[a,i] d_ij ; BT rows: (d0 - d2),
    # (d1 + d2), (d2 - d1), (d1 - d3)
    m_acc = []
    d_cache = {}

    def dget(i, j):
        if (i, j) not in d_cache:
            d_cache[(i, j)] = d(i, j)
        return d_cache[(i, j)]

    for a in range(4):
        r = []
        for j in range(4):
            if a == 0:
                r.append(dget(0, j) - dget(2, j))
            elif a == 1:
                r.append(dget(1, j) + dget(2, j))
            elif a == 2:
                r.append(dget(2, j) - dget(1, j))
            else:
                r.append(dget(1, j) - dget(3, j))
        # column transform V_ab = sum_j BT[b,j] R_a,j
        vs = (r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3])
        for b, v in enumerate(vs):
            vm = v.reshape(th * tw, ci).astype(jnp.bfloat16)
            m = jax.lax.dot_general(
                vm, u_ref[a * 4 + b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_acc.append(m)  # [TH*TW, Co_b] fp32

    # inverse transform Y_pq = sum_ab AT[p,a] AT[q,b] M_ab
    # AT rows: (m0 + m1 + m2), (m1 - m2 - m3)
    def mrow(p, b):
        i = lambda a: m_acc[a * 4 + b]
        return (i(0) + i(1) + i(2)) if p == 0 else (i(1) - i(2) - i(3))

    for p in range(2):
        rb = [mrow(p, b) for b in range(4)]
        y0 = rb[0] + rb[1] + rb[2]
        y1 = rb[1] - rb[2] - rb[3]
        out_ref[0, p, 0] = y0.reshape(th, tw, co_b).astype(out_dtype)
        out_ref[0, p, 1] = y1.reshape(th, tw, co_b).astype(out_dtype)


def _pick_co_block(th, tw, ci, co) -> int:
    """Largest Co block keeping the kernel's VMEM footprint under budget."""
    tiles = th * tw
    budget = 13 * 2**20  # leave headroom out of ~16MB VMEM
    for co_b in (co, co // 2, co // 4):
        if co_b is None or co_b < 8 or co % co_b:
            continue
        phases = 2 * 2 * 2 * (th + 1) * (tw + 1) * ci  # bf16, double-buffered
        u = 16 * ci * co_b * 2
        m = 16 * tiles * co_b * 4
        out = 2 * 4 * tiles * co_b * 2
        v = tiles * ci * 4 * 6  # transform temporaries (rough)
        if phases + u + m + out + v < budget:
            return co_b
    return max(co // 8, 8)


def winograd_conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    scale=None,
    shift=None,
    silu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused [silu((x*scale)+shift)] -> 3x3 SAME conv, via the Pallas
    Winograd kernel. x: [B, H, W, Cin] (H, W even), w: [3, 3, Cin, Cout]."""
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    th, tw = h // 2, wd // 2
    phases = polyphase_decompose(x, scale, shift, silu).astype(jnp.bfloat16)
    u = transform_kernel(w).reshape(16, ci, co).astype(jnp.bfloat16)
    co_b = _pick_co_block(th, tw, ci, co)

    out = pl.pallas_call(
        functools.partial(
            _winograd_kernel, th=th, tw=tw, ci=ci, co_b=co_b, out_dtype=x.dtype
        ),
        grid=(b, co // co_b),
        in_specs=[
            pl.BlockSpec(
                (1, 2, 2, th + 1, tw + 1, ci), lambda i, j: (i, 0, 0, 0, 0, 0)
            ),
            pl.BlockSpec((16, ci, co_b), lambda i, j: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, 2, th, tw, co_b), lambda i, j: (i, 0, 0, 0, 0, j)
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2, 2, th, tw, co), x.dtype),
        interpret=interpret,
    )(phases, u)
    return polyphase_reassemble(out)


def winograd_eligible(x_shape, w_shape, stride, padding) -> bool:
    """The kernel handles stride-1 SAME 3x3 with even H, W and real channel
    counts (transform overhead dominates below 64 channels)."""
    if os.environ.get("ADT_WINOGRAD", "1") == "0":
        return False
    b, h, wd, ci = x_shape
    kh, kw, _, co = w_shape
    return (
        (kh, kw) == (3, 3)
        and tuple(stride) == (1, 1)
        and h % 2 == 0
        and wd % 2 == 0
        and ci >= 64
        and co >= 64
        and ci % 8 == 0
        and co % 8 == 0
    )
