"""Fused Winograd F(2x2,3x3) conv Pallas kernel (see ops/winograd.py for the
algorithm and the XLA reference implementation).

Pipeline:
  1. ``polyphase_decompose`` (XLA, one fused elementwise pass; optionally
     fuses a scale/shift + SiLU prologue, i.e. the GroupNorm epilogue of the
     UNet Block): x [B,H,W,C] -> phases [B,H/2+1,W/2+1,4*C] where channel
     group k = 2*i+j holds pad(x,1)[i::2, j::2]. Every Winograd input-tile
     slice d_ij is then a *unit-stride* shifted window of a channel group —
     no strided VMEM access, no halo BlockSpecs — and the channel-major
     layout keeps DMA rows wide (lane dim 4C) instead of fragmenting into
     (2,2,·,·) micro-tiles.
  2. Tile-row split (XLA): the tile plane is cut into row slabs of <=
     ``_MAX_TILES`` tiles with a duplicated one-row halo, flattened into the
     grid's leading dim, bounding per-program VMEM.
  3. Pallas kernel, grid (B*S,): V = B^T d B as +/- sums on the VPU, 16
     channel-contraction matmuls against the pre-transformed kernel U (MXU,
     fp32 accumulation), inverse transform A^T M A, all in VMEM. HBM sees
     the activation once in and once out — the 2.25x multiply reduction
     comes with no transform traffic.
  4. ``polyphase_reassemble`` (XLA): [B*S,THb,TW,4*Co] -> [B,H,W,Co].

Used by the UNet Block at inference for stride-1 SAME 3x3 convs with even
H, W and Cin, Cout >= 64 (ADT_WINOGRAD=0 disables).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .winograd import transform_kernel

def _max_tiles(ci: int, co: int) -> int:
    """Per-program tile budget: the VMEM-resident compute terms are
    M (16*t*co*2 bf16), R (4*t*ci*4 fp32) and d temporaries (~2*t*ci*4);
    cap them near 6 MB, leaving room for the pipelined in/out blocks and U.
    ADT_WINO_MAX_TILES overrides for tuning."""
    env = os.environ.get("ADT_WINO_MAX_TILES")
    if env:
        return int(env)
    return max(6_000_000 // (32 * co + 24 * ci), 64)


def polyphase_decompose(x, scale=None, shift=None, silu: bool = False):
    """[B, H, W, C] -> [B, H/2+1, W/2+1, 4*C]; channel group 2i+j =
    pad(x,1)[i::2, j::2]. Optional fused y = silu(x*scale + shift) prologue."""
    if scale is not None:
        x = x * scale
    if shift is not None:
        x = x + shift
    if silu:
        x = jax.nn.silu(x)
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # reshape/transpose form (one relayout) rather than 4 strided slices
    xp = xp.reshape(b, h // 2 + 1, 2, w // 2 + 1, 2, c)
    xp = xp.transpose(0, 1, 3, 2, 4, 5)  # [B, TH+1, TW+1, 2(i), 2(j), C]
    return xp.reshape(b, h // 2 + 1, w // 2 + 1, 4 * c)


def polyphase_reassemble(y, batch: int):
    """[B*S, THb, TW, 4*Co] -> [B, 2*S*THb, 2*TW, Co] (group 2p+q holds
    output pixels (2ty+p, 2tx+q))."""
    bs, thb, tw, co4 = y.shape
    s, co = bs // batch, co4 // 4
    y = y.reshape(batch, s * thb, tw, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(batch, 2 * s * thb, 2 * tw, co)


def _row_split(th: int, tw: int, ci: int = 128, co: int = 128) -> int:
    """Number of tile-row slabs so each program fits the VMEM tile budget."""
    cap = _max_tiles(ci, co)
    s = 1
    while th % (2 * s) == 0 and (th // s) * tw > cap:
        s *= 2
    return s


def _winograd_kernel(phases_ref, u_ref, out_ref, *, th, tw, ci, co, out_dtype):
    """One (batch item x row slab): Winograd transform + 16 matmuls +
    inverse transform, fully in VMEM.

    phases_ref: [1, TH+1, TW+1, 4*Ci]
    u_ref:      [16, Ci, Co]  (G w G^T, positions flattened row-major)
    out_ref:    [1, TH, TW, 4*Co]  (channel-major polyphase output)
    """
    # d_ij(ty,tx) = xp[2ty+i, 2tx+j] = group[2*(i%2)+(j%2)][ty+i//2, tx+j//2]
    def d(i, j):
        g = 2 * (i % 2) + (j % 2)
        return phases_ref[0, i // 2 : i // 2 + th, j // 2 : j // 2 + tw,
                          g * ci : (g + 1) * ci].astype(jnp.float32)

    # BT rows: (d0 - d2), (d1 + d2), (d2 - d1), (d1 - d3)
    def bt_row(a, j):
        if a == 0:
            return d(0, j) - d(2, j)
        if a == 1:
            return d(1, j) + d(2, j)
        if a == 2:
            return d(2, j) - d(1, j)
        return d(1, j) - d(3, j)

    m_acc = []
    for a in range(4):
        r = [bt_row(a, j) for j in range(4)]
        # column transform V_ab = sum_j BT[b,j] R_a,j
        vs = (r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3])
        for b, v in enumerate(vs):
            vm = v.reshape(th * tw, ci).astype(jnp.bfloat16)
            m = jax.lax.dot_general(
                vm, u_ref[a * 4 + b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_acc.append(m.astype(jnp.bfloat16))  # [TH*TW, Co]

    # inverse transform Y_pq = sum_ab AT[p,a] AT[q,b] M_ab
    # AT rows: (m0 + m1 + m2), (m1 - m2 - m3)
    def mrow(p, b):
        i = lambda a: m_acc[a * 4 + b].astype(jnp.float32)
        return (i(0) + i(1) + i(2)) if p == 0 else (i(1) - i(2) - i(3))

    for p in range(2):
        rb = [mrow(p, b) for b in range(4)]
        y0 = rb[0] + rb[1] + rb[2]
        y1 = rb[1] - rb[2] - rb[3]
        g0, g1 = 2 * p, 2 * p + 1
        out_ref[0, :, :, g0 * co : (g0 + 1) * co] = y0.reshape(th, tw, co).astype(out_dtype)
        out_ref[0, :, :, g1 * co : (g1 + 1) * co] = y1.reshape(th, tw, co).astype(out_dtype)


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
    interpret = interpret or os.environ.get("ADT_WINO_INTERPRET") == "1"
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    th, tw = h // 2, wd // 2
    phases = polyphase_decompose(x, scale, shift, silu).astype(jnp.bfloat16)
    u = transform_kernel(w).reshape(16, ci, co).astype(jnp.bfloat16)

    s = _row_split(th, tw, ci, co)
    thb = th // s
    if s > 1:
        # row slabs with a duplicated one-row halo, folded into the grid dim
        phases = jnp.concatenate(
            [phases[:, k * thb : k * thb + thb + 1] for k in range(s)], axis=0
        ).reshape(s, b, thb + 1, tw + 1, 4 * ci).transpose(1, 0, 2, 3, 4
        ).reshape(b * s, thb + 1, tw + 1, 4 * ci)

    out = pl.pallas_call(
        functools.partial(
            _winograd_kernel, th=thb, tw=tw, ci=ci, co=co, out_dtype=x.dtype
        ),
        grid=(b * s,),
        in_specs=[
            pl.BlockSpec((1, thb + 1, tw + 1, 4 * ci), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((16, ci, co), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, thb, tw, 4 * co), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * s, thb, tw, 4 * co), x.dtype),
        interpret=interpret,
    )(phases, u)
    return polyphase_reassemble(out, b)


def _ref_fused(x, w, scale, shift):
    """XLA reference of the fused op: silu(x*scale + shift) -> 3x3 SAME conv.
    Used for the backward pass (XLA DCEs the unused forward conv, leaving the
    standard dX/dW conv gradients plus the elementwise recompute)."""
    y = x
    if scale is not None:
        y = y * scale
    if shift is not None:
        y = y + shift
    y = jax.nn.silu(y)
    return jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@jax.custom_vjp
def fused_scale_shift_silu_conv3x3(x, w, scale, shift):
    """Fused ``silu(x*scale + shift) -> conv3x3(w)`` via the Pallas Winograd
    kernel (forward) with standard XLA conv gradients (backward). scale/shift
    broadcast against x (e.g. [B,1,1,C] FiLM rows) and may be None."""
    return winograd_conv3x3(x, w, scale=scale, shift=shift, silu=True)


def _fused_fwd(x, w, scale, shift):
    return fused_scale_shift_silu_conv3x3(x, w, scale, shift), (x, w, scale, shift)


def _fused_bwd(res, g):
    x, w, scale, shift = res
    _, vjp = jax.vjp(_ref_fused, x, w, scale, shift)
    return vjp(g)


fused_scale_shift_silu_conv3x3.defvjp(_fused_fwd, _fused_bwd)


def winograd_eligible(x_shape, w_shape, stride, padding) -> bool:
    """The kernel handles stride-1 SAME 3x3 with even H, W and real channel
    counts (transform overhead dominates below 64 channels).

    Opt-in (``ADT_WINOGRAD=1``): measured on the v5e at the flagship UNet
    Block shapes (scripts/microbench_winograd.py, 2026-08-16), the fused
    kernel reaches only 0.45-1.03x of XLA's implicit-GEMM conv (26-43 vs
    50-67 TF/s) — the polyphase HBM round-trips outweigh the 2.25x multiply
    reduction at these sizes. Kept as infrastructure for larger feature maps.
    ``ADT_WINO_INTERPRET=1`` (interpret-mode tests) also enables dispatch."""
    flag = os.environ.get("ADT_WINOGRAD")
    if flag == "0":
        return False
    if flag != "1" and os.environ.get("ADT_WINO_INTERPRET") != "1":
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
