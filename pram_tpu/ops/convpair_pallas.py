"""Pallas fused 3x3 conv pair (stride 1/1, thick channels, NHWC).

Fuses conv3a+BN+ReLU+conv3b+BN+ReLU (reference nets/sfd2.py:146-147: 128->256
and 256->256 at stride 1) into one kernel: the 256-channel intermediate stays
in VMEM instead of round-tripping HBM, and both convs run as channels-last
im2col matmuls with zero layout waste — for C >= 128 every im2col gather is a
lane-aligned [W, C] slab copy and the matmuls are [W, 9*C] @ [9*C, C_out]
(K and N exact multiples of 128), so the MXU sees only useful FLOPs.

This complements ops/stem_pallas.py, which handles the thin-input +
stride-2 stem where channels-last does not tile (C=3 gathers are
lane-misaligned); here NHWC is already the right layout and no transposes
appear anywhere.

MEASURED RESULT (v5e, b32 bf16 120x160): 11.3 ms vs XLA's 9.4 ms — these
thick stride-1 convs are FLOP-bound and XLA already runs them at the MXU
roofline, so the saved HBM intermediate cannot pay for the kernel's
per-tile overhead. The model therefore keeps the XLA path
(models/sfd2.py); the kernel stays as an evaluated option and as the
template for future conv fusions where the intermediate is larger relative
to the FLOPs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pram_tpu.ops.stem_pallas import fold_bn


def _pair_kernel(
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *refs, th, w, cin, cmid, acc_dtype, shifted,
):
    """One (batch, row-tile) program: th output rows x w cols.

    Shapes (logical):
      xt:        [th+8, w+2, cin]   input rows r0-2 .. r0+th+5
      xs1/xs2:   [th+8, w, cin]     xt shifted by 1/2 along W — built ONCE so
                                    the per-row im2col gathers are all
                                    sublane-ALIGNED block copies (an
                                    unaligned [w, C] slice per tap per row
                                    was measured 9x slower than the matmuls)
      a_t:       [th+2, w+2, cmid]  conv-a output (zero SAME borders)
      as1/as2:   [th+2, w, cmid]    a_t shifted by 1/2 along W
      x1:        [w, 9*cin]         conv-a im2col for one row
      x2:        [w, 9*cmid]        conv-b im2col for one row
    """
    if shifted:
        xt, xs1, xs2, a_t, as1, as2, x1, x2, sem = refs
    else:
        xt, a_t, x1, x2, sem = refs
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    dtype = o_ref.dtype

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * th, th + 8), :, :], xt, sem
    )
    cp.start()
    cp.wait()

    if shifted:
        xs1[:, :, :] = xt[:, 1 : w + 1, :]
        xs2[:, :, :] = xt[:, 2 : w + 2, :]

    def xga(dx, row):
        if shifted:
            return (xt, xs1, xs2)[dx][row, :w, :]
        return xt[row, dx : dx + w, :]

    # ---- conv a: rows a = 0 .. th+1 hold out-a row (r0 - 1 + a)
    for a in range(th + 2):
        for dy in range(3):
            for dx in range(3):
                blk = (dy * 3 + dx) * cin
                # out-a row r = r0-1+a needs input rows r-1..r+1; the fetch
                # starts at r0-2 -> local a+dy
                x1[:, blk : blk + cin] = xga(dx, a + dy)
        y = jnp.dot(x1[:, :], w1_ref[:, :], preferred_element_type=acc_dtype)
        y = jnp.maximum(y + b1_ref[:], 0.0).astype(dtype)
        a_t[a, 1 : w + 1, :] = y

    # zero SAME-padding borders for conv b
    zero_col = jnp.zeros((th + 2, 1, cmid), dtype)
    a_t[:, 0:1, :] = zero_col
    a_t[:, w + 1 : w + 2, :] = zero_col

    @pl.when(t == 0)
    def _():
        a_t[0:1] = jnp.zeros((1, w + 2, cmid), dtype)

    @pl.when(t == n_t - 1)
    def _():
        a_t[th + 1 : th + 2] = jnp.zeros((1, w + 2, cmid), dtype)

    if shifted:
        as1[:, :, :] = a_t[:, 1 : w + 1, :]
        as2[:, :, :] = a_t[:, 2 : w + 2, :]

    def aga(dx, row):
        if shifted:
            return (a_t, as1, as2)[dx][row, :w, :]
        return a_t[row, dx : dx + w, :]

    # ---- conv b: output row j uses a rows j-1..j+1 = local j..j+2
    for j in range(th):
        for dy in range(3):
            for dx in range(3):
                blk = (dy * 3 + dx) * cmid
                x2[:, blk : blk + cmid] = aga(dx, j + dy)
        y = jnp.dot(x2[:, :], w2_ref[:, :], preferred_element_type=acc_dtype)
        y = jnp.maximum(y + b2_ref[:], 0.0).astype(dtype)
        o_ref[0, j] = y


def fused_conv_pair(
    x: jax.Array,
    k1: jax.Array, b1: jax.Array, bn1: tuple,
    k2: jax.Array, b2: jax.Array, bn2: tuple,
    *,
    interpret: bool = False,
) -> jax.Array:
    """relu(bn(conv3x3(relu(bn(conv3x3(x)))))) fused, both stride 1.

    Args:
      x: ``[B, H, W, Cin]`` NHWC (Cin a multiple of 128 for aligned
        gathers; H a multiple of 8).
      k1/b1/bn1: first conv ``[3,3,Cin,Cmid]`` + bias + BN tuple.
      k2/b2/bn2: second conv ``[3,3,Cmid,Cout]`` + bias + BN tuple.

    Returns:
      ``[B, H, W, Cout]`` in x.dtype.
    """
    bsz, h, w, cin = x.shape
    cmid = k1.shape[-1]
    cout = k2.shape[-1]
    dtype = x.dtype
    # bf16 gets pre-shifted gather buffers (sublane-aligned im2col copies,
    # ~9x faster); f32 traces (flax init) skip them and use a smaller tile
    # to stay inside the 16MB scoped-vmem limit
    shifted = dtype == jnp.bfloat16
    th = 8
    assert h % th == 0, f"H={h} must be a multiple of {th}"
    acc = jnp.float32

    k1f, b1f = fold_bn(k1, b1, *bn1)
    k2f, b2f = fold_bn(k2, b2, *bn2)
    w1 = k1f.reshape(9 * cin, cmid).astype(dtype)
    w2 = k2f.reshape(9 * cmid, cout).astype(dtype)
    b1m = b1f[None, :].astype(acc)  # [1, Cmid]
    b2m = b2f[None, :].astype(acc)

    # rows: 2 top halo + enough bottom that the last tile's aligned fetch of
    # th+8 rows stays in bounds; cols: 1 halo each side, right-padded so the
    # sublane extent is 8-aligned
    pad_bot = (th + 8) - th - 2
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (2, pad_bot), (1, wp - w - 1), (0, 0)))

    grid = (bsz, h // th)
    scratch = [pltpu.VMEM((th + 8, wp, cin), dtype)]  # xt
    if shifted:
        scratch += [
            pltpu.VMEM((th + 8, w, cin), dtype),  # xs1
            pltpu.VMEM((th + 8, w, cin), dtype),  # xs2
        ]
    scratch += [pltpu.VMEM((th + 2, w + 2, cmid), dtype)]  # a_t
    if shifted:
        scratch += [
            pltpu.VMEM((th + 2, w, cmid), dtype),  # as1
            pltpu.VMEM((th + 2, w, cmid), dtype),  # as2
        ]
    scratch += [
        pltpu.VMEM((w, 9 * cin), dtype),  # x1
        pltpu.VMEM((w, 9 * cmid), dtype),  # x2
        pltpu.SemaphoreType.DMA(()),
    ]
    return pl.pallas_call(
        partial(_pair_kernel, th=th, w=w, cin=cin, cmid=cmid,
                acc_dtype=acc, shifted=shifted),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((9 * cin, cmid), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cmid, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, cout), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, w1, b1m, w2, b2m)
