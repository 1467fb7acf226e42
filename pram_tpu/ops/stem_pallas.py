"""Pallas fused SFD2 stem: conv1a+BN+ReLU+conv1b(s2)+BN+ReLU in one kernel.

Reference semantics: nets/sfd2.py:141-145 (conv1a 3->64 stride 1, conv1b
64->64 stride 2, each 3x3 SAME + BatchNorm(eval) + ReLU). XLA runs this pair
at ~13 TF/s effective (the 3-channel contraction can't tile the MXU and the
full-resolution 64-channel intermediate makes an HBM round trip); this kernel
keeps the intermediate in VMEM and restructures both convs as MXU matmuls.

Design notes (TPU-first, not a translation):
- The image is fed channel-planar and split by column parity
  (``[B, 3, Hp, Wp/2]`` even/odd), so every im2col gather inside the kernel
  is a contiguous sublane-block copy -- no strided lane access anywhere.
- conv1a is one matmul per 4-row block: a block-diagonal weight matrix
  ``[4*64, 128]`` contracts all 27 taps (K = 27 taps x 4 rows = 108, padded
  to the 128-lane MXU width) against an im2col stack built from shifted
  input planes. Output rows arrive transposed ([64, W] per row), already
  split into the two column parities conv1b's stride-2 taps need.
- conv1b is one matmul per output row: ``[64, 576] @ [576, W/2]`` with
  K = 9 taps x 64 channels = 576 (4.5 full MXU tiles, no zero padding).
- BatchNorm (inference, stored stats) is folded into the conv weights and
  biases outside the kernel; ReLU is fused on the matmul outputs.

Output is channel-planar ``[B, H/2, 64, W/2]``; the caller transposes back
to NHWC with one XLA transpose (cheaper than per-row in-kernel transposes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(kernel, bias, scale, bn_bias, mean, var, eps=1e-5):
    """Fold an inference-mode BatchNorm into conv kernel+bias.

    y = (conv(x) + bias - mean) * scale/sqrt(var+eps) + bn_bias
      = conv(x) * g + (bias - mean) * g + bn_bias,   g = scale/rsqrt.
    Computed in f32 regardless of input dtype.
    """
    g = (scale / jnp.sqrt(var.astype(jnp.float32) + eps)).astype(jnp.float32)
    kf = kernel.astype(jnp.float32) * g
    bf = (bias.astype(jnp.float32) - mean.astype(jnp.float32)) * g + bn_bias
    return kf, bf


def _build_w1_blockdiag(k1f, rows=4):
    """[3,3,3,64] folded conv1a kernel -> [rows*64, 128] block-diagonal matmul.

    Column layout: col = (c*9 + dy*3 + dx) * rows + j ; row = j*64 + f.
    Row j of the output block only contracts its own K-slice, so 4
    consecutive conv1a output rows come out of one MXU pass.
    """
    f = k1f.shape[-1]
    w = jnp.zeros((rows * f, 27 * rows), jnp.float32)
    # [dy, dx, c, f] -> tap index t = c*9 + dy*3 + dx
    kt = jnp.transpose(k1f, (2, 0, 1, 3)).reshape(27, f)  # [t, f]
    eye = jnp.eye(rows, dtype=jnp.float32)
    # w[j*64+f, t*rows+j'] = kt[t, f] * eye[j, j']
    blk = jnp.einsum("tf,jk->jftk", kt, eye).reshape(rows * f, 27 * rows)
    w = blk
    kpad = -(-27 * rows // 128) * 128
    pad = kpad - 27 * rows
    if pad > 0:
        w = jnp.pad(w, ((0, 0), (0, pad)))
    return w


def _build_w2(k2f):
    """[3,3,64,64] folded conv1b kernel -> [64, 576] matmul LHS.

    Column layout: col = (dy*3 + dx)*64 + c, matching the kernel's X2 stack.
    """
    # [dy, dx, c, f] -> [f, dy, dx, c]
    return jnp.transpose(k2f, (3, 0, 1, 2)).reshape(k2f.shape[-1], -1)


def _stem_kernel(
    iev_hbm, iod_hbm, w1a_ref, b1a_ref, w1b_ref, b1b_ref, w2_ref, b2_ref,
    out_ref,
    iev, iod, iev1, iod1, x1, a_od, a_ev, a_od1, x2, sems,
    *, th, w2out, acc_dtype, schedule,
):
    """One (batch, row-tile) program: th output rows x w2out output cols.

    Shapes (logical):
      iev/iod:   [3, 2*th+6, w2out+2]  input planes (col parity split)
      x1:        [128, w2out+1]        conv1a im2col (27 taps x 4 rows)
      a_od/a_ev: [2*th+4, 64, w2out+1] conv1a output, row-transposed
      x2:        [576, w2out]          conv1b im2col (9 taps x 64 ch)
      out block: [1, th, 64, w2out]
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    # DMA slice sizes on the sublane dim must be 8-aligned; extra rows are
    # junk never read by the gathers (input is padded to cover them)
    n_in_rows = -(-(2 * th + 6) // 8) * 8
    wq = w2out + 1  # conv1a output phase width (A cols -1..W-1 odd / 0..W even)
    dtype = out_ref.dtype

    # ---- fetch input rows [2*th*t, 2*th*t + 2*th+6) of both parity planes
    cp_e = pltpu.make_async_copy(
        iev_hbm.at[b, :, pl.ds(2 * th * t, n_in_rows), :], iev, sems.at[0]
    )
    cp_o = pltpu.make_async_copy(
        iod_hbm.at[b, :, pl.ds(2 * th * t, n_in_rows), :], iod, sems.at[1]
    )
    cp_e.start()
    cp_o.start()
    cp_e.wait()
    cp_o.wait()

    # lane-shifted copies (ip -> ip+2 in original cols = +1 per parity plane)
    iev1[:, :, :wq] = iev[:, :, 1 : wq + 1]
    iod1[:, :, :wq] = iod[:, :, 1 : wq + 1]

    # zero the full K-padding once (junk would NaN the f32 accumulator);
    # block sizes < max also leave junk K rows, re-zeroed per small block
    kpad = x1.shape[0]
    max_rows = max(r for _, r in schedule)
    x1[27 * max_rows : kpad, :] = jnp.zeros(
        (kpad - 27 * max_rows, wq), dtype
    )

    # ---- conv1a over the block schedule; A row a holds A[y = 2*r0 -1 + a].
    # 8-row blocks keep every im2col copy sublane-aligned and halve the copy
    # count vs uniform 4-row blocks; the 4-row remainder handles
    # (2*th+4) % 8 == 4 (th=16 -> 4x8 + 1x4).
    for a0, rows in schedule:
        w1_ref = w1a_ref if rows == max_rows else w1b_ref
        b1_ref = b1a_ref if rows == max_rows else b1b_ref
        if rows != max_rows:
            # junk between this block's K extent and the big block's
            x1[27 * rows : 27 * max_rows, :] = jnp.zeros(
                (27 * (max_rows - rows), wq), dtype
            )
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 64, wq), 2)
        # X1 for the ODD output phase (A col x = 2m-1): input col ip = 2m+dx
        for c in range(3):
            for dy in range(3):
                for dx in range(3):
                    blk = (c * 9 + dy * 3 + dx) * rows
                    src = (iev, iod, iev1)[dx]
                    x1[blk : blk + rows, :] = src[
                        c, a0 + dy : a0 + dy + rows, :wq
                    ]
        a4 = jnp.dot(
            w1_ref[:], x1[: w1_ref.shape[1], :],
            preferred_element_type=acc_dtype,
        )
        a4 = jnp.maximum(a4 + b1_ref[:], 0.0).astype(dtype)
        a4 = a4.reshape(rows, 64, wq)
        # A[x=-1] is conv1b's zero SAME-padding, not a conv1a value
        a4 = jnp.where(lane == 0, jnp.zeros_like(a4), a4)
        a_od[a0 : a0 + rows] = a4
        a_od1[a0 : a0 + rows, :, : wq - 1] = a4[:, :, 1:wq]

        # X1 for the EVEN phase (A col x = 2m): input col ip = 2m+1+dx
        for c in range(3):
            for dy in range(3):
                for dx in range(3):
                    blk = (c * 9 + dy * 3 + dx) * rows
                    src = (iod, iev1, iod1)[dx]
                    x1[blk : blk + rows, :] = src[
                        c, a0 + dy : a0 + dy + rows, :wq
                    ]
        a4 = jnp.dot(
            w1_ref[:], x1[: w1_ref.shape[1], :],
            preferred_element_type=acc_dtype,
        )
        a4 = jnp.maximum(a4 + b1_ref[:], 0.0).astype(dtype)
        a_ev[a0 : a0 + rows] = a4.reshape(rows, 64, wq)

    # first tile: A row y = -1 is zero SAME-padding for conv1b
    @pl.when(t == 0)
    def _():
        zero = jnp.zeros((1, 64, wq), dtype)
        a_od[0:1] = zero
        a_ev[0:1] = zero
        a_od1[0:1, :, : wq - 1] = zero[:, :, : wq - 1]

    # ---- conv1b: one [64, 576] @ [576, w2out] matmul per output row
    for jj in range(th):
        for dy in range(3):
            a = 2 * jj + dy
            base = dy * 3 * 64
            x2[base : base + 64, :] = a_od[a, :, :w2out]
            x2[base + 64 : base + 128, :] = a_ev[a, :, :w2out]
            x2[base + 128 : base + 192, :] = a_od1[a, :, :w2out]
        o = jnp.dot(w2_ref[:], x2[:], preferred_element_type=acc_dtype)
        o = jnp.maximum(o + b2_ref[:], 0.0).astype(dtype)
        out_ref[0, jj] = o


def fused_stem(
    image: jax.Array,
    k1: jax.Array, b1: jax.Array, bn1: tuple,
    k2: jax.Array, b2: jax.Array, bn2: tuple,
    *,
    interpret: bool = False,
) -> jax.Array:
    """conv1b(s2) . relu . bn . conv1a . relu . bn fused on TPU.

    Args:
      image: ``[B, H, W, 3]`` normalized input (H % 16 == 0, W even).
      k1/b1/bn1: conv1a kernel ``[3,3,3,64]``, bias, (scale, bias, mean, var).
      k2/b2/bn2: conv1b kernel ``[3,3,64,64]``, bias, BN tuple.

    Returns:
      ``[B, H//2, W//2, 64]`` in image.dtype, matching the unfused XLA path.
    """
    bsz, h, w, cin = image.shape
    assert cin == 3 and w % 2 == 0
    h2, w2out = h // 2, w // 2
    dtype = image.dtype
    # f32 traces (flax init) double every scratch; halve the tile to stay
    # inside the 16MB scoped-vmem limit
    th = 16 if (h2 % 16 == 0 and dtype == jnp.bfloat16) else 8
    assert h2 % th == 0, f"H/2={h2} must be a multiple of {th}"
    # conv1a block schedule: as many 8-row blocks as fit (sublane-aligned
    # im2col copies, half the copy count of 4-row blocks — the kernel is
    # copy-issue-bound) + a 4-row remainder. DMA alignment pins th to a
    # multiple of 4, so (2*th+4) % 8 == 4 always leaves one 4-row block.
    a_rows = 2 * th + 4
    schedule = []
    a0 = 0
    while a_rows - a0 >= 8:
        schedule.append((a0, 8))
        a0 += 8
    while a_rows - a0 >= 4:
        schedule.append((a0, 4))
        a0 += 4
    assert a0 == a_rows, (th, schedule)
    max_rows = max(r for _, r in schedule)
    kpad = -(-27 * max_rows // 128) * 128
    acc = jnp.float32

    k1f, b1f = fold_bn(k1, b1, *bn1)
    k2f, b2f = fold_bn(k2, b2, *bn2)
    w1a = _build_w1_blockdiag(k1f, rows=max_rows).astype(dtype)
    b1a = jnp.tile(b1f, max_rows)[:, None].astype(acc)
    w1b = _build_w1_blockdiag(k1f, rows=4).astype(dtype)
    b1b = jnp.tile(b1f, 4)[:, None].astype(acc)
    w2m = _build_w2(k2f).astype(dtype)  # [64, 576]
    b2m = b2f[:, None].astype(acc)  # [64, 1]

    # DMA slice sizes on the sublane dim must be 8-aligned
    n_in_rows = -(-(2 * th + 6) // 8) * 8

    # pad 2 cols each side; rows: 2 on top, enough at the bottom that the
    # last tile's (aligned) fetch stays in bounds. Channel-planar + column
    # parity split so in-kernel gathers are contiguous.
    pad_bot = n_in_rows - 2 * th - 2  # Hp = h + 2 + pad_bot
    ipad = jnp.pad(image, ((0, 0), (2, pad_bot), (2, 2), (0, 0)))
    planar = jnp.transpose(ipad, (0, 3, 1, 2))  # [B, 3, Hp, W+4]
    iev = planar[..., 0::2]  # [B, 3, Hp, (W+4)/2]
    iod = planar[..., 1::2]

    # sliced DMA sources must have 128-aligned lane extents
    wq = w2out + 1
    wpad = -(-(wq + 1) // 128) * 128
    lane_pad = wpad - iev.shape[-1]
    iev = jnp.pad(iev, ((0, 0), (0, 0), (0, 0), (0, lane_pad)))
    iod = jnp.pad(iod, ((0, 0), (0, 0), (0, 0), (0, lane_pad)))
    grid = (bsz, h2 // th)

    out = pl.pallas_call(
        partial(_stem_kernel, th=th, w2out=w2out, acc_dtype=acc,
                schedule=tuple(schedule)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((max_rows * 64, kpad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max_rows * 64, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 576), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, 64, w2out), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h2, 64, w2out), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, n_in_rows, wpad), dtype),  # iev
            pltpu.VMEM((3, n_in_rows, wpad), dtype),  # iod
            pltpu.VMEM((3, n_in_rows, wpad), dtype),  # iev1
            pltpu.VMEM((3, n_in_rows, wpad), dtype),  # iod1
            pltpu.VMEM((kpad, wq), dtype),  # x1
            pltpu.VMEM((2 * th + 4, 64, wq), dtype),  # a_od
            pltpu.VMEM((2 * th + 4, 64, wq), dtype),  # a_ev
            pltpu.VMEM((2 * th + 4, 64, wq), dtype),  # a_od1
            pltpu.VMEM((576, w2out), dtype),  # x2
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(iev, iod, w1a, b1a, w1b, b1b, w2m, b2m)

    # planar [B, H/2, 64, W/2] -> NHWC
    return jnp.transpose(out, (0, 1, 3, 2))
