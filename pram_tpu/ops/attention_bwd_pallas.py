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

Enabled with PRAM_ATTN_BWD=1 (off until chip-validated); gradient parity
vs the autodiff backward is pinned in tests/test_train_vjp.py.
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
