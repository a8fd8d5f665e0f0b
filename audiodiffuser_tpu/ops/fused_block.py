"""Fused GroupNorm + FiLM + SiLU + 3x3 conv Pallas kernel (direct form).

The UNet Block (reference ``src/models/backbones/unet2d.py:83-104``) is
GroupNorm -> (FiLM scale/shift) -> SiLU -> conv3x3.  XLA materialises the
normalised/activated tensor between the elementwise chain and the conv, so
each Block costs five full HBM passes of the activation (stats read,
normalise read+write, conv read, conv write).  This kernel folds the GN
statistics + affine + FiLM into one per-(batch, channel) affine row pair
``(a, b)`` computed by XLA from a single stats pass, then runs

    y = conv3x3_SAME(silu(x * a + b), w) + bias

as ONE Pallas kernel: the activation is DMA'd HBM->VMEM once per row-slab
(with a one-row halo), the prologue runs on the VPU in VMEM, and the 3x3
conv is 9 shifted [M, Cin] x [Cin, Cout] MXU matmuls with fp32
accumulation.  Three HBM passes total, and the prologue/epilogue ride along
for free.

Unlike the Winograd path (ops/winograd_pallas.py, which loses to XLA's
implicit-GEMM conv at flagship shapes due to polyphase relayout traffic),
this kernel keeps XLA's data layout untouched — its win is pure fusion.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-program VMEM budget for choosing the row-slab height (bytes).
# Scoped VMEM must hold scratch + the padded value copy + the fp32
# accumulator + double-buffered out blocks; 1.5M of fp32 accumulator
# keeps the total under the 16M scoped limit at C=512 shapes.
_ACC_BUDGET = int(1.5 * 1024 * 1024)


def _slab_height(h: int, w: int, co: int) -> int:
    """Largest power-of-two divisor of H whose fp32 accumulator fits budget."""
    env = os.environ.get("ADT_FUSED_BLOCK_TH")
    if env:
        th = int(env)
        # ns = h // th truncates: a non-divisor would leave the bottom
        # h - ns*th rows unwritten (silent garbage), so reject it here.
        if th < 8 or h % th:
            raise ValueError(
                f"ADT_FUSED_BLOCK_TH={th} must be >= 8 and divide H={h}"
            )
        return th
    th = h
    while th > 8 and th * w * co * 4 > _ACC_BUDGET:
        th //= 2
    return th


def _kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, out_ref, scratch, sem,
            *, th, hh, ww, ci, co, out_dtype):
    """One (batch item x row slab).

    x_hbm:   [B, H, W, C] (ANY/HBM; sliced manually for the H halo)
    a_ref:   [1, C]   fused affine scale   (VMEM)
    b_ref:   [1, C]   fused affine shift   (VMEM)
    w_ref:   [3, 3, C, Co]                 (VMEM)
    bias_ref:[1, Co]                       (VMEM)
    out_ref: [1, TH, W, Co]                (VMEM, blocked)
    scratch: [TH+2, W, C] bf16 activated slab (H halo only; the W halo is
             applied as a value-level pad — sublane offsets stay aligned,
             which Mosaic requires for stores/DMA)
    """
    bi = pl.program_id(0)
    si = pl.program_id(1)
    ns = pl.num_programs(1)

    if ns == 1:
        # whole image in one slab: top+bottom borders zeroed below
        dma = pltpu.make_async_copy(
            x_hbm.at[bi, :, :, :], scratch.at[pl.ds(1, hh), :, :], sem
        )
        dma.start()
        dma.wait()
    else:
        first = si == 0
        last = si == ns - 1

        @pl.when(first)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(0, th + 1), :, :],
                scratch.at[pl.ds(1, th + 1), :, :],
                sem,
            )
            dma.start()
            dma.wait()

        @pl.when(last)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(si * th - 1, th + 1), :, :],
                scratch.at[pl.ds(0, th + 1), :, :],
                sem,
            )
            dma.start()
            dma.wait()

        @pl.when(jnp.logical_not(jnp.logical_or(first, last)))
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(si * th - 1, th + 2), :, :],
                scratch.at[pl.ds(0, th + 2), :, :],
                sem,
            )
            dma.start()
            dma.wait()

    # prologue: y = silu(x * a + b) over the whole slab (the stale top/bottom
    # border rows are masked to zero here — SAME padding applies AFTER the
    # activation, so borders must be exactly 0, not silu(b))
    a = a_ref[0, 0, :].astype(jnp.float32)
    b = b_ref[0, 0, :].astype(jnp.float32)
    z = scratch[...].astype(jnp.float32) * a + b
    z = z * jax.nn.sigmoid(z)
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    if ns == 1:
        valid = (row >= 1) & (row <= hh)
    else:
        lo = jnp.where(si == 0, 1, 0)
        hi = jnp.where(si == ns - 1, th, th + 1)
        valid = (row >= lo) & (row <= hi)
    z = jnp.where(valid, z, 0.0).astype(jnp.bfloat16)

    # 3x3 SAME conv = 9 shifted matmuls, fp32 accumulation on the MXU.
    # The W halo costs only TWO sublane relayouts (left/right shifted
    # copies); the H (ki) shifts are free dim-0 slices of each copy.
    zcol = jnp.zeros((th + 2, 1, ci), jnp.bfloat16)
    shifted = (
        jnp.concatenate([zcol, z[:, : ww - 1, :]], axis=1),   # kj = 0
        z,                                                    # kj = 1
        jnp.concatenate([z[:, 1:, :], zcol], axis=1),         # kj = 2
    )
    acc = jnp.zeros((th * ww, co), jnp.float32)
    for kj, zk in enumerate(shifted):
        for ki in range(3):
            d = zk[ki : ki + th].reshape(th * ww, ci)
            acc += jax.lax.dot_general(
                d,
                w_ref[ki, kj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += bias_ref[0, :].astype(jnp.float32)
    out_ref[0] = acc.reshape(th, ww, co).astype(out_dtype)


def fused_affine_silu_conv3x3(x, a, b, w, bias=None, *, interpret=False):
    """``conv3x3_SAME(silu(x * a + b), w) + bias`` as one Pallas kernel.

    x: [B, H, W, C]; a, b: [B, C] per-item affine rows (fold GroupNorm
    stats, gamma/beta and FiLM here — see :func:`gn_film_affine`);
    w: [3, 3, C, Co]; bias: [Co] or None.
    """
    interpret = interpret or os.environ.get("ADT_FUSED_BLOCK_INTERPRET") == "1"
    bsz, h, ww, ci = x.shape
    co = w.shape[-1]
    th = _slab_height(h, ww, co)
    ns = h // th
    if bias is None:
        bias = jnp.zeros((co,), x.dtype)

    kern = functools.partial(
        _kernel, th=th, hh=h, ww=ww, ci=ci, co=co, out_dtype=x.dtype
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, ns),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, ci), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, 1, ci), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((3, 3, ci, co), lambda bi, si: (0, 0, 0, 0)),
            pl.BlockSpec((1, co), lambda bi, si: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, ww, co), lambda bi, si: (bi, si, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, ww, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, ww, ci), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), a.reshape(bsz, 1, ci), b.reshape(bsz, 1, ci),
      w.astype(jnp.bfloat16), bias.reshape(1, co))
    return out


def gn_film_affine(x, gamma, beta, groups, scale=None, shift=None, eps=1e-5):
    """Fold GroupNorm statistics + affine + FiLM into per-(B, C) rows.

    Returns (a, b) with ``silu_input = x * a + b`` equal to
    ``(GN(x) * gamma + beta) * scale + shift`` (scale/shift broadcast rows
    [B, 1, 1, C] or None).  The stats pass is the only extra HBM read.
    """
    bsz, h, w, c = x.shape
    xg = x.reshape(bsz, h * w, groups, c // groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3))                      # [B, G]
    var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)                       # [B, G]
    rstd_c = jnp.repeat(rstd, c // groups, axis=1)        # [B, C]
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    gamma = gamma.astype(jnp.float32)[None, :]
    beta = beta.astype(jnp.float32)[None, :]
    a = rstd_c * gamma                                    # [B, C]
    b = beta - mean_c * rstd_c * gamma
    if scale is not None:
        s = scale.astype(jnp.float32).reshape(bsz, c)
        t = shift.astype(jnp.float32).reshape(bsz, c)
        a = a * s
        b = b * s + t
    return a, b


def _ref_block(x, gamma, beta, scale, shift, w, bias, groups, eps=1e-5):
    """XLA reference of the full fused Block op (also the backward path)."""
    bsz, h, wd, c = x.shape
    xg = x.reshape(bsz, h * wd, groups, c // groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3))
    var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    xn = (xg - mean[:, None, :, None]) * rstd[:, None, :, None]
    xn = xn.reshape(bsz, h, wd, c) * gamma + beta
    if scale is not None:
        xn = xn * scale.reshape(bsz, 1, 1, c) + shift.reshape(bsz, 1, 1, c)
    y = jax.nn.silu(xn).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_gn_film_silu_conv3x3(x, gamma, beta, scale, shift, w, bias,
                               groups=8):
    """Full fused Block forward: GroupNorm(groups) -> FiLM -> SiLU -> conv3x3.

    Pallas kernel forward (one fused HBM pass after the stats read); XLA
    recompute backward.  scale/shift are [B, 1, 1, C] FiLM rows or None;
    ``groups`` is static (nondiff)."""
    a, b = gn_film_affine(x, gamma, beta, groups, scale, shift)
    return fused_affine_silu_conv3x3(x, a, b, w, bias)


def _fwd(x, gamma, beta, scale, shift, w, bias, groups):
    out = fused_gn_film_silu_conv3x3(x, gamma, beta, scale, shift, w, bias,
                                     groups)
    return out, (x, gamma, beta, scale, shift, w, bias)


def _bwd(groups, res, g):
    x, gamma, beta, scale, shift, w, bias = res
    _, vjp = jax.vjp(
        lambda x, gamma, beta, scale, shift, w, bias: _ref_block(
            x, gamma, beta, scale, shift, w, bias, groups
        ),
        x, gamma, beta, scale, shift, w, bias,
    )
    return vjp(g)


fused_gn_film_silu_conv3x3.defvjp(_fwd, _bwd)


def fused_block_eligible(x_shape, dim_out: int) -> bool:
    """Dispatch gate for the Block fused path.

    Requires TPU (or interpret override), stride-1 SAME 3x3, C a multiple of
    the lane width, and H large enough that a slab is at least 8 rows.
    Shapes below 32x16 stay on XLA (matmul M too small to feed the MXU).

    Opt-in via ``ADT_FUSED_BLOCK=1`` until validated+measured on hardware."""
    b, h, w, c = x_shape
    if os.environ.get("ADT_FUSED_BLOCK_INTERPRET") == "1":
        return h % 8 == 0 and w >= 8 and c % 8 == 0 and dim_out % 8 == 0
    if os.environ.get("ADT_FUSED_BLOCK", "0") != "1":
        return False
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return False
    # below this many pixels the per-program DMA/launch overhead and the
    # broken XLA fusion boundary outweigh the saved HBM passes (measured
    # in-model on v5e; ADT_FUSED_BLOCK_MIN_HW tunes)
    min_hw = int(os.environ.get("ADT_FUSED_BLOCK_MIN_HW", 2048))
    return (
        h * w >= min_hw
        and h % 8 == 0
        and c % 128 == 0
        and dim_out % 128 == 0
    )
