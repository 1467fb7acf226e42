"""Pallas backward kernel for the fused self-attention (training path).

ops/train_vjp.py's default backward recomputes the XLA attention and
autodiffs it: correct, but every [B, H, N, N] intermediate (logits,
probabilities, their cotangents) round-trips HBM — at train shapes that
is the dominant backward traffic. This kernel runs the whole
softmax/rotary backward per frame with the [N, N] tensors living in
VMEM:

  forward (recomputed in-kernel from qkv):
      logits = rot(q) rot(k)^T * scale + bias;  p = softmax(logits)
  backward (standard flash-bwd algebra, exact — no [N, N] leaves VMEM):
      dp     = g v^T
      dlogit = p * (dp - rowsum(dp * p))
      dq_rot = dlogit k_rot * scale      dk_rot = dlogit^T q_rot * scale
      dv     = p^T g
      rotary transpose-rotation:  dq = dqr*cos - rot_half(dqr*sin)
      dcos   = sum_h dqr*q + dkr*k       dsin = sum_h dqr*rot(q)+dkr*rot(k)
      dbias  = sum_{h,i} dlogit

The qkv projection itself stays in XLA on both sides of the kernel
(one recompute matmul forward, two roofline matmuls for dx/dW): those
are MXU-bound and XLA already runs them at the roofline — the win here
is exactly the HBM traffic of the attention interior.

Split-blocked (GML's two-sided token concatenation) and rotary-free
variants mirror ops/attention_pallas._blocked_self_attention.

Default ON since the r5 chip validation (train step 11.375 -> 16.276
steps/s, on-chip grad parity 0.9% with trained weights); PRAM_ATTN_BWD=0
restores the autodiff backward, parity pinned in tests/test_train_vjp.py.
Reference being beaten: torch autograd attention training,
nets/segnetvit.py:44-107.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pram_tpu.ops.attention_pallas import _rotate_half_lanes

_VMEM_BUDGET = 14 << 20

# test escape, same pattern as ops/conv_int8_pallas.py
_INTERPRET = False


def attention_bwd_supported(
    n: int, d: int, itemsize: int, max_block: int | None = None
) -> bool:
    """VMEM gate: qkv/dqkv/g blocks over all n tokens + two live
    [M, M] f32 temporaries at the largest attention block size."""
    if n % 8 != 0 or d % 128 != 0:
        return False
    mb = max_block or n
    io = 2 * n * 3 * d * itemsize + n * d * itemsize  # qkv, dqkv, g
    live = 2 * mb * mb * 4  # e/p and dp/dlogit
    return io + live <= _VMEM_BUDGET


def _bwd_kernel(
    qkv_ref, cos_ref, sin_ref, bias_ref, g_ref,
    dqkv_ref, dcos_ref, dsin_ref, dbias_ref,
    *, scale, heads, hd, rotary, splits,
):
    d = heads * hd
    n_total = bias_ref.shape[-1]
    bias = bias_ref[0]  # [1, N] f32
    dtype = qkv_ref.dtype
    edges = [0]
    for s in splits:
        edges.append(edges[-1] + s)
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = hi - lo
        if rotary:
            cos = cos_ref[0, lo:hi, :]  # [M, hd] f32
            sin = sin_ref[0, lo:hi, :]
        if lo == 0:
            bias_b = bias[:, :hi]
        else:
            bias_b = pltpu.roll(bias, n_total - lo, 1)[:, : hi - lo]
        dbias_acc = jnp.zeros((1, m), jnp.float32)
        if rotary:
            dcos_acc = jnp.zeros((m, hd), jnp.float32)
            dsin_acc = jnp.zeros((m, hd), jnp.float32)
        for h in range(heads):
            q0 = qkv_ref[0, lo:hi, h * hd : (h + 1) * hd]
            k0 = qkv_ref[0, lo:hi, d + h * hd : d + (h + 1) * hd]
            v = qkv_ref[0, lo:hi, 2 * d + h * hd : 2 * d + (h + 1) * hd]
            g = g_ref[0, lo:hi, h * hd : (h + 1) * hd]
            if rotary:
                qf = q0.astype(jnp.float32)
                kf = k0.astype(jnp.float32)
                q = (qf * cos + _rotate_half_lanes(q0) * sin).astype(dtype)
                k = (kf * cos + _rotate_half_lanes(k0) * sin).astype(dtype)
            else:
                q, k = q0, k0

            logits = (
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + bias_b
            )
            logits -= jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            p = e * r  # [M, M] f32

            dp = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t = jnp.sum(dp * p, axis=-1, keepdims=True)
            dlog = p * (dp - t)  # [M, M] f32
            dbias_acc += jnp.sum(dlog, axis=0, keepdims=True)

            dlog_c = dlog.astype(dtype)
            p_c = p.astype(dtype)
            dqr = (
                jax.lax.dot_general(
                    dlog_c, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            dkr = (
                jax.lax.dot_general(
                    dlog_c, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            dv = jax.lax.dot_general(
                p_c, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if rotary:
                dcos_acc += dqr * qf + dkr * kf
                dsin_acc += dqr * _rotate_half_lanes(
                    qf
                ) + dkr * _rotate_half_lanes(kf)
                # transpose rotation: dq = dqr*cos - rot_half(dqr*sin)
                dq = dqr * cos - _rotate_half_lanes(dqr * sin)
                dk = dkr * cos - _rotate_half_lanes(dkr * sin)
            else:
                dq, dk = dqr, dkr
            dqkv_ref[0, lo:hi, h * hd : (h + 1) * hd] = dq.astype(dtype)
            dqkv_ref[0, lo:hi, d + h * hd : d + (h + 1) * hd] = dk.astype(
                dtype
            )
            dqkv_ref[0, lo:hi, 2 * d + h * hd : 2 * d + (h + 1) * hd] = (
                dv.astype(dtype)
            )
        dbias_ref[0, 0, lo:hi] = dbias_acc[0]
        if rotary:
            dcos_ref[0, lo:hi, :] = dcos_acc
            dsin_ref[0, lo:hi, :] = dsin_acc
        else:
            dcos_ref[0, lo:hi, :] = jnp.zeros((m, hd), jnp.float32)
            dsin_ref[0, lo:hi, :] = jnp.zeros((m, hd), jnp.float32)


def cross_attention_bwd_supported(
    n0: int, n1: int, d: int, itemsize: int
) -> bool:
    """VMEM gate for the cross backward: qk/v/g/dqk/dv blocks over both
    sides + ~four live [N0, N1] f32 temporaries."""
    if (n0 + n1) % 8 != 0 or d % 128 != 0:
        return False
    n = n0 + n1
    io = 5 * n * d * itemsize  # qk, v, g, dqk, dv
    live = 4 * n0 * n1 * 4  # a01/a10/dp/dsim generation live set
    return io + live <= _VMEM_BUDGET


def _cross_bwd_kernel(
    qk_ref, v_ref, b0_ref, b1_ref, g_ref,
    dqk_ref, dv_ref, db0_ref, db1_ref,
    *, scale, heads, hd, n0,
):
    """Backward of the symmetric shared-QK cross attention
    (ops/attention_pallas._cross_proj_kernel math): the shared qk means
    each side's projection gradient combines its query role in one
    direction with its key role in the other."""
    n_total = g_ref.shape[1]
    n1 = n_total - n0
    dtype = qk_ref.dtype
    db0_acc = jnp.zeros((1, n0), jnp.float32)
    db1_acc = jnp.zeros((1, n1), jnp.float32)
    bias0 = b0_ref[0]  # [1, N0] f32
    bias1 = b1_ref[0]  # [1, N1] f32
    for h in range(heads):
        s = slice(h * hd, (h + 1) * hd)
        qk0 = qk_ref[0, :n0, s]
        qk1 = qk_ref[0, n0:, s]
        v0 = v_ref[0, :n0, s]
        v1 = v_ref[0, n0:, s]
        g0 = g_ref[0, :n0, s]
        g1 = g_ref[0, n0:, s]

        sim = (
            jax.lax.dot_general(
                qk0, qk1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [N0, N1]

        # direction 0 -> 1 (row softmax over side-1 keys)
        l01 = sim + bias1
        l01 -= jnp.max(l01, axis=-1, keepdims=True)
        e01 = jnp.exp(l01)
        a01 = e01 / jnp.sum(e01, axis=-1, keepdims=True)
        dp01 = jax.lax.dot_general(
            g0, v1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t01 = jnp.sum(dp01 * a01, axis=-1, keepdims=True)
        dsim01 = a01 * (dp01 - t01)
        db1_acc += jnp.sum(dsim01, axis=0, keepdims=True)
        dv1 = jax.lax.dot_general(
            a01.astype(dtype), g0, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # direction 1 -> 0 (column softmax over side-0 keys)
        l10 = sim + jnp.transpose(bias0)  # [N0, 1] broadcast over cols
        l10 -= jnp.max(l10, axis=0, keepdims=True)
        e10 = jnp.exp(l10)
        a10 = e10 / jnp.sum(e10, axis=0, keepdims=True)
        dp10 = jax.lax.dot_general(
            v0, g1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # dp10[i, j] = v0[i] . g1[j]
        t10 = jnp.sum(dp10 * a10, axis=0, keepdims=True)
        dsim10 = a10 * (dp10 - t10)
        db0_acc += jnp.transpose(jnp.sum(dsim10, axis=1, keepdims=True))
        dv0 = jax.lax.dot_general(
            a10.astype(dtype), g1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        dsim = (dsim01 + dsim10).astype(dtype)
        dqk0 = (
            jax.lax.dot_general(
                dsim, qk1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        dqk1 = (
            jax.lax.dot_general(
                dsim, qk0, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        dqk_ref[0, :n0, s] = dqk0.astype(dtype)
        dqk_ref[0, n0:, s] = dqk1.astype(dtype)
        dv_ref[0, :n0, s] = dv0.astype(dtype)
        dv_ref[0, n0:, s] = dv1.astype(dtype)
    db0_ref[0, 0, :] = db0_acc[0]
    db1_ref[0, 0, :] = db1_acc[0]


def fused_cross_attention_bwd(
    qk, v, bias0, bias1, g, scale, heads, n0, *, interpret=False
):
    """Backward of symmetric cross attention w.r.t. (qk, v, bias0, bias1).

    ``qk``/``v``: ``[B, N0+N1, D]`` shared projections (recomputed by the
    caller); ``g``: cotangent of the message concatenation. Returns
    (dqk, dv ``[B, N0+N1, D]``, dbias0 ``[B, N0]``, dbias1 ``[B, N1]``
    f32).
    """
    interpret = interpret or _INTERPRET
    b, n, d = qk.shape
    hd = d // heads
    n1 = n - n0
    b0 = bias0[:, None, :].astype(jnp.float32)
    b1 = bias1[:, None, :].astype(jnp.float32)

    kern = partial(
        _cross_bwd_kernel, scale=scale, heads=heads, hd=hd, n0=n0
    )
    dqk, dv, db0, db1 = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), qk.dtype),
            jax.ShapeDtypeStruct((b, n, d), qk.dtype),
            jax.ShapeDtypeStruct((b, 1, n0), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n1), jnp.float32),
        ],
        interpret=interpret,
    )(qk, v, b0, b1, g)
    return dqk, dv, db0[:, 0, :], db1[:, 0, :]


def fused_self_attention_bwd(
    qkv, cos, sin, key_bias, g, scale, heads, splits=None,
    *, rotary=True, interpret=False,
):
    """Backward of blocked masked self-attention w.r.t. (qkv, cos, sin,
    key_bias).

    Args:
      qkv: ``[B, N, 3D]`` projected (permuted-layout) qkv, recomputed by
        the caller.
      cos/sin: ``[B, N, hd]`` rotary tables (ignored when not rotary).
      key_bias: ``[B, N]`` additive f32 key mask.
      g: ``[B, N, D]`` cotangent of the attention output.

    Returns:
      (dqkv ``[B, N, 3D]``, dcos, dsin ``[B, N, hd]`` f32,
      dbias ``[B, N]`` f32).
    """
    interpret = interpret or _INTERPRET
    b, n, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    if splits is None:
        splits = (n,)
    if cos is None:
        cos = jnp.zeros((b, n, hd), jnp.float32)
        sin = cos
    bias = key_bias[:, None, :].astype(jnp.float32)

    kern = partial(
        _bwd_kernel, scale=scale, heads=heads, hd=hd, rotary=rotary,
        splits=tuple(splits),
    )
    dqkv, dcos, dsin, dbias = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, d3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d3), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, n, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(
        qkv,
        cos.astype(jnp.float32),
        sin.astype(jnp.float32),
        bias,
        g,
    )
    return dqkv, dcos, dsin, dbias[:, 0, :]
