"""Fused masked attention kernels (Pallas, TPU).

The matcher/recognition transformers (models/common.py) attend over 512-4096
keypoint tokens. XLA materializes the [B, H, N, M] f32 logits in HBM between
the two attention matmuls — at GML scale (9 layers x (self+self+cross) at
512/1024 tokens, batch 32) that is gigabytes of round trips per call and the
measured stage runs ~7x off the MXU floor. These kernels keep the logits tile
in VMEM for one (batch) program: N,M <= ~2048 means the full [N, M] f32 tile
fits comfortably, so no streaming flash machinery is needed.

Masking is additive: callers pass per-token f32 biases (0 valid / -1e9
masked), matching models/common.py:masked_softmax semantics (fully-masked
rows produce a uniform distribution; such rows are masked downstream).

Layout strategy: the kernels take PACKED activations ([B, N, heads*hd] with
heads as contiguous lane blocks, straight out of the projection matmuls — the
caller permutes projection weight columns instead of transposing activations)
and do head split/merge, rotary, softmax and both attention matmuls entirely
in VMEM. Rotary runs in bf16 (|cos|,|sin| <= 1), keeping the QK matmul on the
bf16 MXU path; the symmetric cross kernel recomputes sim^T with a second MXU
pass instead of transposing the f32 tile (MXU FLOPs are far cheaper than a
VMEM relayout of the same tile).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rotate_half_lanes(x):
    """Interleaved-pair rotation on the lane axis (models/common.py:23-30).

    out[2i] = -x[2i+1], out[2i+1] = x[2i] — expressed with lane rolls and an
    even-lane select so Mosaic never sees a minor-dim-2 reshape.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    even = (lane % 2) == 0
    # Mosaic's rotate only handles 32-bit data; bf16 inputs go through f32
    xf = x.astype(jnp.float32)
    # pltpu.roll requires non-negative shifts; roll by n-1 == roll by -1
    left = pltpu.roll(xf, x.shape[-1] - 1, x.ndim - 1)  # x[j+1]
    right = pltpu.roll(xf, 1, x.ndim - 1)  # x[j-1]
    return jnp.where(even, -left, right)


def _qkv_kernel(qkv_ref, cos_ref, sin_ref, bias_ref, o_ref,
                *, scale, heads, hd, rotary):
    """Packed-qkv masked self-attention with in-kernel rotary.

    qkv layout: lanes [q_heads | k_heads | v_heads], each ``heads*hd`` wide
    (the caller permutes the projection's output columns, so no XLA-side
    head split/transpose ever materializes).
    """
    d = heads * hd
    bias = bias_ref[0]  # [1, N] f32
    if rotary:
        cos = cos_ref[0]  # [N, hd]
        sin = sin_ref[0]
    for h in range(heads):
        q = qkv_ref[0, :, h * hd : (h + 1) * hd]
        k = qkv_ref[0, :, d + h * hd : d + (h + 1) * hd]
        v = qkv_ref[0, :, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        if rotary:
            # rotary in f32 on the VPU, result cast back so the QK matmul
            # stays on the bf16 MXU path — the XLA path keeps f32 through
            # the matmul and pays ~4x there
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            q = (qf * cos + _rotate_half_lanes(q) * sin).astype(q.dtype)
            k = (kf * cos + _rotate_half_lanes(k) * sin).astype(k.dtype)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias
        logits -= jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        o_ref[0, :, h * hd : (h + 1) * hd] = jnp.dot(
            attn, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def fused_self_attention_qkv(
    qkv, cos, sin, key_bias, scale, heads, *, interpret=False
):
    """Self-attention from a packed qkv tensor, heads split in VMEM.

    Args:
      qkv: ``[B, N, 3*D]`` with lane layout [q_heads | k_heads | v_heads]
        (permute the projection weights with :func:`permute_qkv_kernel`).
      cos/sin: ``[B, N, hd]`` rotary tables (pass None to skip rotary).
      key_bias: ``[B, N]`` f32 additive mask.

    Returns:
      ``[B, N, D]`` merged-head messages, same lane order as the input
      heads — feeds the output projection directly.
    """
    b, n, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    rotary = cos is not None
    if not rotary:
        cos = jnp.zeros((b, n, hd), qkv.dtype)
        sin = cos
    bias = key_bias[:, None, :].astype(jnp.float32)
    return pl.pallas_call(
        partial(_qkv_kernel, scale=scale, heads=heads, hd=hd, rotary=rotary),
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
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        interpret=interpret,
    )(qkv, cos.astype(jnp.float32), sin.astype(jnp.float32), bias)


def permute_qkv_kernel(kernel, bias, heads, hd):
    """Reorder a torch-layout qkv projection ([in, (h, hd, 3)]) to the packed
    [q_heads | k_heads | v_heads] lane layout the kernel slices."""
    d = heads * hd
    w = kernel.reshape(kernel.shape[0], heads, hd, 3)
    w = jnp.transpose(w, (0, 3, 1, 2)).reshape(kernel.shape[0], 3 * d)
    bp = jnp.transpose(bias.reshape(heads, hd, 3), (2, 0, 1)).reshape(3 * d)
    return w, bp


def _cross_packed_kernel(
    qk0_ref, qk1_ref, v0_ref, v1_ref, b0_ref, b1_ref, m0_ref, m1_ref,
    *, scale, heads, hd,
):
    bias0 = b0_ref[0]  # [1, N]
    bias1 = b1_ref[0]  # [1, M]
    for h in range(heads):
        s = slice(h * hd, (h + 1) * hd)
        q0 = qk0_ref[0, :, s]  # [N, hd]
        q1 = qk1_ref[0, :, s]  # [M, hd]
        v0 = v0_ref[0, :, s]
        v1 = v1_ref[0, :, s]

        sim = jax.lax.dot_general(
            q0, q1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias1
        sim -= jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim)
        attn01 = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v1.dtype)
        m0_ref[0, :, s] = jnp.dot(
            attn01, v1, preferred_element_type=jnp.float32
        ).astype(m0_ref.dtype)

        simt = jax.lax.dot_general(
            q1, q0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias0
        simt -= jnp.max(simt, axis=-1, keepdims=True)
        e = jnp.exp(simt)
        attn10 = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v0.dtype)
        m1_ref[0, :, s] = jnp.dot(
            attn10, v0, preferred_element_type=jnp.float32
        ).astype(m1_ref.dtype)


def fused_cross_attention_packed(
    qk0, qk1, v0, v1, bias0, bias1, scale, heads, *, interpret=False
):
    """Symmetric shared-QK cross attention on packed [B, N, D] tensors.

    Head split/merge happens on VMEM lane blocks; the full attention scale
    is applied to the similarity inside the kernel (callers pass the raw
    to_qk outputs).
    """
    b, n, d = qk0.shape
    m = qk1.shape[1]
    hd = d // heads
    b0 = bias0[:, None, :].astype(jnp.float32)
    b1 = bias1[:, None, :].astype(jnp.float32)

    def spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda i, nd=nd: (i,) + (0,) * nd,
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        partial(_cross_packed_kernel, scale=scale, heads=heads, hd=hd),
        grid=(b,),
        in_specs=[
            spec(n, d), spec(m, d), spec(n, d), spec(m, d),
            spec(1, n), spec(1, m),
        ],
        out_specs=(spec(n, d), spec(m, d)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), qk0.dtype),
            jax.ShapeDtypeStruct((b, m, d), qk1.dtype),
        ),
        interpret=interpret,
    )(qk0, qk1, v0, v1, b0, b1)
