"""Pallas int8 3x3 conv (stride 1, SAME, thick channels, NHWC).

The int8 extractor path (models/sfd2_int8.py) routes its convs through
XLA's s8 ``conv_general_dilated``; measured end-to-end that delivered
only ~1.2x over bf16 (ROUND_NOTES r4) — far from the 2x s8 MXU rate, so
XLA is not keeping the s8 convs on the MXU's int path. This kernel is
the convpair-style im2col formulation (ops/convpair_pallas.py) with
s8 x s8 -> s32 matmuls:

- input arrives bf16 and is quantized ONCE per tile in VMEM with the
  layer's static calibrated scale (the XLA path pays an extra HBM round
  trip for the [B, H, W, C] quantize);
- the im2col gathers are lane-aligned [W, C] slab copies (C a multiple
  of 128), built from pre-shifted s8 buffers exactly like the bf16 pair
  kernel;
- each output row is one ``[W, 9C] @ [9C, Cout]`` s8 MXU matmul with s32
  accumulation, dequantized in-register (f32 scale + folded-BN bias,
  optional ReLU) and written bf16.

Unlike the bf16 pair kernel — which lost to XLA because XLA already runs
thick bf16 convs at the roofline — the s8 kernel's competitor is XLA's
*poor* s8 conv lowering, not the roofline. The stride-1 form covers
conv3a/conv3b, the residual grouped-conv dense splits, and
convDa_0/convDa_3/convPa_3; the stride-2 form (column-PAIRING relayout
so every tap is a lane-aligned channel slice) adds conv2b and convPa_0
— together ~77% of the extractor's conv FLOPs. Thin-input convs
(stem, conv2a at C=64) keep their existing paths.

Enabled with PRAM_INT8_CONV=1 (off until chip-validated); correctness is
gated by the image-level rendered guard like every other int8 path.
Reference hot spot: nets/sfd2.py:127-272.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 14 << 20  # same headroom as ops/mlp_pallas.py

# test escape: force interpret-mode execution on non-TPU backends so the
# model-level wiring (models/sfd2_int8.py) can be exercised on CPU
_INTERPRET = False


def _conv_kernel(
    x_hbm, sa_ref, w_ref, ws_ref, b_ref, o_ref,
    xt, xq, xs1, xs2, x1, sem,
    *, th, w, cin, relu,
):
    """One (batch, row-tile) program: th output rows x w cols.

    Logical shapes:
      xt:  [th+8, wp, cin] bf16   input rows (t*th - 1) .. (t*th + th + 6)
                                  of the padded image (1-row top halo)
      xq:  [th+8, wp, cin] s8     the tile quantized once
      xs1/xs2: [th+8, w, cin] s8  xq shifted by 1/2 along W (aligned taps)
      x1:  [w, 9*cin] s8          im2col for one output row
    """
    b = pl.program_id(0)
    t = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * th, th + 8), :, :], xt, sem
    )
    cp.start()
    cp.wait()

    # static per-tensor quantization of the whole tile, once — DIVIDE by
    # the scale (not multiply by a precomputed reciprocal) so boundary
    # values round bit-identically to models/sfd2_int8.py:_qlayer
    xf = xt[:, :, :].astype(jnp.float32) / sa_ref[0, 0]
    xq[:, :, :] = jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
    xs1[:, :, :] = xq[:, 1 : w + 1, :]
    xs2[:, :, :] = xq[:, 2 : w + 2, :]

    def tap(dx, row):
        return (xq, xs1, xs2)[dx][row, :w, :]

    for j in range(th):
        # output row r = t*th + j needs padded rows r-1..r+1 -> local j..j+2
        for dy in range(3):
            for dx in range(3):
                blk = (dy * 3 + dx) * cin
                x1[:, blk : blk + cin] = tap(dx, j + dy)
        y = jax.lax.dot_general(
            x1[:, :], w_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        y = y * ws_ref[:, :] + b_ref[:, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, j] = y.astype(o_ref.dtype)


def conv3x3_int8_supported(h: int, w: int, cin: int, cout: int) -> bool:
    """Shape gate: stride-1 SAME 3x3, lane-aligned channels, VMEM fit."""
    if cin % 128 != 0 or cout % 128 != 0 or h % 8 != 0:
        return False
    wp = -(-(w + 2) // 8) * 8
    vmem = (
        16 * wp * cin * 2  # xt bf16
        + 16 * wp * cin  # xq s8
        + 2 * 16 * w * cin  # xs1/xs2 s8
        + w * 9 * cin  # x1 s8
        + 9 * cin * cout  # weights s8
        + 8 * w * cout * 2  # out tile bf16
        + w * cout * 4  # s32/f32 accumulator
    )
    return vmem <= _VMEM_BUDGET


def _conv_s2_kernel(
    x_hbm, sa_ref, w_ref, ws_ref, b_ref, o_ref,
    xt, xq, xs1, x1, sem,
    *, th, wo, cin, relu,
):
    """Stride-2 program: th output rows x wo cols.

    The input arrives column-PAIRED ([B, Hp, Wp2, 2*Cin]: even padded
    column in channels [:Cin], odd in [Cin:]), so the three W-taps of a
    stride-2 conv become lane-aligned channel slices — no strided VMEM
    ops anywhere:

      out col i <- padded cols 2i, 2i+1, 2i+2
                =  block i ch[:Cin], block i ch[Cin:], block i+1 ch[:Cin]

    Logical shapes:
      xt:  [2*th+8, wp2, 2*cin] bf16  paired input rows 2*t*th ..
      xq:  same, s8                   the tile quantized once
      xs1: [2*th+8, wo, cin] s8       block-shifted even channels (dx=2)
      x1:  [wo, 9*cin] s8             im2col for one output row
    """
    b = pl.program_id(0)
    t = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * 2 * th, 2 * th + 8), :, :], xt, sem
    )
    cp.start()
    cp.wait()

    xf = xt[:, :, :].astype(jnp.float32) / sa_ref[0, 0]
    xq[:, :, :] = jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
    xs1[:, :, :] = xq[:, 1 : wo + 1, :cin]

    for j in range(th):
        # out row r = t*th + j uses padded rows 2r..2r+2 -> local 2j+dy
        for dy in range(3):
            row = 2 * j + dy
            base = dy * 3 * cin
            x1[:, base : base + cin] = xq[row, :wo, :cin]
            x1[:, base + cin : base + 2 * cin] = xq[row, :wo, cin:]
            x1[:, base + 2 * cin : base + 3 * cin] = xs1[row, :, :]
        y = jax.lax.dot_general(
            x1[:, :], w_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        y = y * ws_ref[:, :] + b_ref[:, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, j] = y.astype(o_ref.dtype)


def conv3x3s2_int8_supported(
    h: int, w: int, cin: int, cout: int
) -> bool:
    """Stride-2 gate: even W, tileable output rows, aligned channels."""
    if cin % 128 != 0 or cout % 128 != 0 or w % 2 != 0 or h % 2 != 0:
        return False
    ho = h // 2
    if ho % 8 != 0 and ho % 4 != 0:
        return False
    wo = w // 2
    wp2 = -(-(wo + 1) // 8) * 8
    th = 8 if ho % 8 == 0 else 4
    rows = 2 * th + 8
    vmem = (
        rows * wp2 * 2 * cin * 2  # xt bf16 (paired channels)
        + rows * wp2 * 2 * cin  # xq s8
        + rows * wo * cin  # xs1 s8
        + wo * 9 * cin  # x1 s8
        + 9 * cin * cout  # weights s8
        + th * wo * cout * 2  # out tile
        + wo * cout * 4  # accumulator
    )
    return vmem <= _VMEM_BUDGET


def conv3x3s2_int8(
    x: jax.Array,
    wq: jax.Array,
    in_scale,
    w_scale: jax.Array,
    bias: jax.Array,
    *,
    relu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Stride-2 twin of :func:`conv3x3_int8` (padding 1, out H/2 x W/2).

    The caller-visible contract matches models/sfd2_int8.py:_qlayer with
    strides (2, 2); the column-pairing relayout happens in XLA outside
    the kernel (one fused pad+reshape pass).
    """
    interpret = interpret or _INTERPRET
    bsz, h, w, cin = x.shape
    cout = wq.shape[-1]
    assert wq.shape[:3] == (3, 3, cin)
    assert conv3x3s2_int8_supported(h, w, cin, cout), (h, w, cin, cout)
    dtype = x.dtype
    ho, wo = h // 2, w // 2
    th = 8 if ho % 8 == 0 else 4

    # weight reorder to the paired-channel im2col layout: tap (dy, dx)
    # lives at block dy*3 + dx (dx: even, odd, even-shifted)
    w2d = wq.reshape(9 * cin, cout)
    sin = jnp.asarray(in_scale, jnp.float32)
    ws = (sin * w_scale.astype(jnp.float32))[None, :]
    bm = bias.astype(jnp.float32)[None, :]
    sa2d = sin.reshape(1, 1)

    # pad: 1 halo row on top + bottom fetch slack; 1 col halo each side,
    # right-padded so the PAIRED width is an 8-mult of blocks
    wp2 = -(-(wo + 1) // 8) * 8
    rows_fetch = 2 * th + 8
    pad_bot = (h // (2 * th) - 1) * 2 * th + rows_fetch - h - 1
    xp = jnp.pad(
        x, ((0, 0), (1, pad_bot), (1, 2 * wp2 - w - 1), (0, 0))
    )
    # pair columns: [B, Hp, 2*wp2, C] -> [B, Hp, wp2, 2C]
    xp = xp.reshape(bsz, xp.shape[1], wp2, 2 * cin)

    grid = (bsz, ho // th)
    return pl.pallas_call(
        partial(_conv_s2_kernel, th=th, wo=wo, cin=cin, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wo, cout), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, ho, wo, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_fetch, wp2, 2 * cin), xp.dtype),  # xt
            pltpu.VMEM((rows_fetch, wp2, 2 * cin), jnp.int8),  # xq
            pltpu.VMEM((rows_fetch, wo, cin), jnp.int8),  # xs1
            pltpu.VMEM((wo, 9 * cin), jnp.int8),  # x1
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, sa2d, w2d, ws, bm)


def conv3x3_int8(
    x: jax.Array,
    wq: jax.Array,
    in_scale,
    w_scale: jax.Array,
    bias: jax.Array,
    *,
    relu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """relu?(s8conv3x3(quant(x)) * (in_scale * w_scale) + bias), stride 1.

    Args:
      x: ``[B, H, W, Cin]`` float (bf16/f32) NHWC, H % 8 == 0,
        Cin % 128 == 0.
      wq: ``[3, 3, Cin, Cout]`` int8 weights (per-out-channel symmetric).
      in_scale: static scalar activation scale (x is quantized as
        ``clip(round(x / in_scale), -127, 127)``, matching
        models/sfd2_int8.py:_qlayer).
      w_scale: ``[Cout]`` f32 per-channel weight scales.
      bias: ``[Cout]`` folded-BN bias (applied in f32 after dequant).
      relu: apply ReLU before the cast back to x.dtype.

    Returns:
      ``[B, H, W, Cout]`` in x.dtype.
    """
    interpret = interpret or _INTERPRET
    bsz, h, w, cin = x.shape
    cout = wq.shape[-1]
    assert wq.shape[:3] == (3, 3, cin)
    assert conv3x3_int8_supported(h, w, cin, cout), (h, w, cin, cout)
    dtype = x.dtype
    th = 8

    w2d = wq.reshape(9 * cin, cout)
    sin = jnp.asarray(in_scale, jnp.float32)
    ws = (sin * w_scale.astype(jnp.float32))[None, :]
    bm = bias.astype(jnp.float32)[None, :]
    sa2d = sin.reshape(1, 1)  # the scale itself; the kernel divides

    # 1 halo row on top, enough bottom rows that the last tile's th+8 fetch
    # stays in bounds; 1 halo col each side, right-padded to 8-mult sublanes
    pad_bot = (th + 8) - th - 1
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, pad_bot), (1, wp - w - 1), (0, 0)))

    grid = (bsz, h // th)
    return pl.pallas_call(
        partial(_conv_kernel, th=th, w=w, cin=cin, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, cout), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 8, wp, cin), xp.dtype),  # xt
            pltpu.VMEM((th + 8, wp, cin), jnp.int8),  # xq
            pltpu.VMEM((th + 8, w, cin), jnp.int8),  # xs1
            pltpu.VMEM((th + 8, w, cin), jnp.int8),  # xs2
            pltpu.VMEM((w, 9 * cin), jnp.int8),  # x1
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, sa2d, w2d, ws, bm)
