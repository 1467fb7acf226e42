"""Fused masked attention kernels (Pallas, TPU).

The matcher/recognition transformers (models/common.py) attend over 512-4096
keypoint tokens. XLA materializes the [B, H, N, M] f32 logits in HBM between
the two attention matmuls — at GML scale (9 layers x (self+self+cross) at
512/1024 tokens, batch 32) that is gigabytes of round trips per call and the
measured stage runs ~7x off the MXU floor. These kernels keep the logits tile
in VMEM.

Two regimes, dispatched by token count (Aachen eval runs 4096 keypoints,
configs/config_train_aachen_sfd2.yaml:74):

- N,M small (<= ~1024): one (batch) program holds the full [N, M] f32
  logits tile — no streaming machinery.
- larger N: query rows are tiled over a second grid axis while K/V stay
  fully VMEM-resident ([4096, 256] bf16 = 2 MB), so each step's logits
  block is [q_block, M] and softmax needs no running-max rescaling (every
  row still sees all keys in one block).

Attention statistics (AdaGML's PoolingLayer input, nets/adagml.py:148,229):
the kernels can additionally emit, per key token, the attention mass it
received summed over heads and over VALID query rows (query validity is
recovered from the bias: 0 = valid, -1e9 = masked). Callers divide by
heads * n_valid_queries to get the mean the reference computes.

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


def _attn_weights(sim_raw, scale, bias):
    """Max-subtracted attention weights with the normalization FOLDED OUT.

    Returns (e [N, M] f32 in [0, 1], inv_sum [N, 1] f32) so callers fold
    the 1/sum normalization into the small [N, hd] message output rather
    than paying a full [N, M] divide + cast pass. The max-subtraction stays:
    a clamp-only variant (exp without the row max, clamped at 80) measured
    recall-breaking on hardware with trained weights while passing every
    interpret-mode test — don't retry it. Semantics match the old in-kernel
    softmax exactly: an all-masked row (bias all -1e9) gives e == 1,
    inv_sum == 1/M -> message mean(v), as the XLA path does
    (models/common.py:153-156).
    """
    logits = sim_raw * scale + bias
    e = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    return e, 1.0 / jnp.sum(e, axis=-1, keepdims=True)


def _qkv_kernel(qkv_ref, cos_ref, sin_ref, bias_ref, o_ref, *rest,
                scale, heads, hd, rotary, with_stats=False):
    """Packed-qkv masked self-attention with in-kernel rotary.

    qkv layout: lanes [q_heads | k_heads | v_heads], each ``heads*hd`` wide
    (the caller permutes the projection's output columns, so no XLA-side
    head split/transpose ever materializes). With ``with_stats`` an extra
    ``[1, 1, N]`` f32 output receives the per-key attention mass summed over
    heads and valid query rows.
    """
    d = heads * hd
    bias = bias_ref[0]  # [1, N] f32
    if rotary:
        cos = cos_ref[0]  # [N, hd]
        sin = sin_ref[0]
    stat_total = None
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
        e, r = _attn_weights(
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            scale, bias,
        )
        o_ref[0, :, h * hd : (h + 1) * hd] = (
            jnp.dot(
                e.astype(v.dtype), v, preferred_element_type=jnp.float32
            ) * r
        ).astype(o_ref.dtype)
        if with_stats:
            # per-key mass from VALID query rows: a rank-1 MXU contraction
            # with the query-validity row vector (0/-1e9 bias -> 0/1) —
            # cheaper than relayouting the bias to a column. The stats need
            # the NORMALIZED attention, so this path pays the e*r pass the
            # message output avoids.
            qv = (bias > -0.5).astype(jnp.float32)  # [1, N]
            s = jax.lax.dot_general(
                qv, e * r, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, N]
            stat_total = s if stat_total is None else stat_total + s
    if with_stats:
        rest[0][0] = stat_total


def _qkv_blocked_kernel(qkv_ref, cos_ref, sin_ref, bias_ref, o_ref,
                        *, scale, heads, hd, rotary, splits):
    """Block-diagonal self-attention over a token concatenation.

    GML runs self-attention on each side of the (512, 1024) token stream
    with shared weights; doing both sides in ONE program halves the
    per-program overheads (pipeline fills, rotary/softmax VPU setup) that
    dominate these small-tile kernels.
    """
    d = heads * hd
    n_total = bias_ref.shape[-1]
    bias = bias_ref[0]  # [1, N]
    edges = [0]
    for s in splits:
        edges.append(edges[-1] + s)
    for lo, hi in zip(edges[:-1], edges[1:]):
        if rotary:
            cos = cos_ref[0, lo:hi, :]
            sin = sin_ref[0, lo:hi, :]
        if lo == 0:
            bias_b = bias[:, :hi]
        else:
            # Mosaic can't broadcast a lane-offset slice against the logits
            # tile; rotate the block to lane 0 first
            bias_b = pltpu.roll(bias, n_total - lo, 1)[:, : hi - lo]
        for h in range(heads):
            q = qkv_ref[0, lo:hi, h * hd : (h + 1) * hd]
            k = qkv_ref[0, lo:hi, d + h * hd : d + (h + 1) * hd]
            v = qkv_ref[0, lo:hi, 2 * d + h * hd : 2 * d + (h + 1) * hd]
            if rotary:
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                q = (qf * cos + _rotate_half_lanes(q) * sin).astype(q.dtype)
                k = (kf * cos + _rotate_half_lanes(k) * sin).astype(k.dtype)
            e, r = _attn_weights(
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ),
                scale, bias_b,
            )
            o_ref[0, lo:hi, h * hd : (h + 1) * hd] = (
                jnp.dot(
                    e.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                ) * r
            ).astype(o_ref.dtype)


def fused_self_attention_qkv_blocked(
    qkv, cos, sin, key_bias, scale, heads, splits, *, interpret=False
):
    """Blocked-sides variant of :func:`fused_self_attention_qkv`.

    ``splits``: sizes of the independent attention blocks along the token
    axis (their sum = N). Each block must fit a single logits tile.
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
        partial(_qkv_blocked_kernel, scale=scale, heads=heads, hd=hd,
                rotary=rotary, splits=tuple(splits)),
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


def _qkv_tiled_kernel(qkv_ref, cos_ref, sin_ref, bias_ref, bcol_ref,
                      o_ref, *rest,
                      scale, heads, hd, rotary, qblk, with_stats=False):
    """Query-row-tiled variant: grid (batch, N // qblk). K/V stay fully
    VMEM-resident with K PRE-ROTATED by the dispatcher (an XLA elementwise
    pass), so only the current block's rotary tables live in VMEM; each
    step computes a [qblk, N] logits block — no streaming-softmax rescaling
    needed. Stats accumulate across the sequential query-block grid axis."""
    j = pl.program_id(1)
    d = heads * hd
    bias = bias_ref[0]  # [1, N] f32
    stat_total = None
    for h in range(heads):
        q = qkv_ref[0, pl.dslice(j * qblk, qblk), h * hd : (h + 1) * hd]
        k = qkv_ref[0, :, d + h * hd : d + (h + 1) * hd]  # pre-rotated
        v = qkv_ref[0, :, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        if rotary:
            cos_q = cos_ref[0]  # [qblk, hd] (block-sliced by spec)
            sin_q = sin_ref[0]
            qf = q.astype(jnp.float32)
            q = (qf * cos_q + _rotate_half_lanes(q) * sin_q).astype(q.dtype)
        e, r = _attn_weights(
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            scale, bias,
        )  # e [qblk, N]
        o_ref[0, :, h * hd : (h + 1) * hd] = (
            jnp.dot(
                e.astype(v.dtype), v, preferred_element_type=jnp.float32
            ) * r
        ).astype(o_ref.dtype)
        if with_stats:
            # row validity of THIS block via the block-sliced bias column —
            # a [qblk, 1] column like r, so normalization and validity fold
            # into ONE weight column and the stats sum runs on raw e
            qv = (bcol_ref[0] > -0.5).astype(jnp.float32)  # [qblk, 1]
            s = jnp.sum(e * (qv * r), axis=0, keepdims=True)  # [1, N]
            stat_total = s if stat_total is None else stat_total + s
    if with_stats:
        stat_ref = rest[0]

        @pl.when(j == 0)
        def _init():
            stat_ref[0] = stat_total

        @pl.when(j != 0)
        def _acc():
            stat_ref[0] += stat_total


# one-program logits tile above this many tokens would crowd VMEM
# ([1536, 1536] f32 = 9 MB); larger N switches to the query-tiled kernel
_SINGLE_TILE_MAX = 1024
# hard cap for the fused path: above this, K/V no longer fit VMEM and the
# caller should fall back to XLA (models/common.py:use_fused_attention)
MAX_FUSED_TOKENS = 4096


def _pick_qblock(n: int, m: int):
    """Largest query block dividing n whose [qblk, m] f32 logits tile stays
    <= 2 MB (leaving VMEM headroom for the resident K/V and softmax temps at
    4096 tokens); None when n has no 8-aligned divisor (caller falls back)."""
    limit = (1 << 20) if m > 2048 else (2 << 20)
    for qb in (512, 256, 128, 64, 32, 16, 8):
        if n % qb == 0 and qb * m * 4 <= limit:
            return qb
    return None


def attention_vmem_ok(
    n: int, m: int, d: int, itemsize: int, budget: int = 15 << 20
) -> bool:
    """Estimate whether the fused kernels' VMEM residents fit.

    Accounts for the packed qkv (or qk+v) block in the ACTIVATION dtype —
    f32 activations double the resident K/V and made the 4096-token
    SegNetViT tile OOM scoped VMEM on hardware; callers fall back to XLA
    (or cast to bf16) when this returns False.
    """
    nm = max(n, m)
    if nm <= _SINGLE_TILE_MAX:
        logits = n * m * 4 * 3  # logits + exp + attn temps
        resident = 3 * nm * d * itemsize + 2 * nm * 4 * (d // 4)
        return resident + logits <= budget
    qb = _pick_qblock(nm, nm)
    if qb is None:
        return False
    resident = 3 * nm * d * itemsize + 2 * nm * 4 * 64
    logits = qb * nm * 4 * 3
    return resident + logits <= budget


def fused_attention_supported(*token_counts) -> bool:
    """Whether the fused kernels can handle these token counts (ADVICE r2:
    size-gate the Pallas path instead of compiling an over-VMEM tile)."""
    return all(
        t <= MAX_FUSED_TOKENS and (t <= _SINGLE_TILE_MAX or
                                   _pick_qblock(t, t) is not None)
        for t in token_counts
    )


def fused_cross_attention_supported(n0: int, n1: int) -> bool:
    """Whether the cross-attention kernels can tile this (possibly
    asymmetric) token pair.

    ADVICE r3: the symmetric per-count gate (``_pick_qblock(t, t)``) let
    pairs through that ``_cross_attention_dir`` — which needs
    ``_pick_qblock(nq, m)`` for BOTH directions — then rejected at trace
    time. Gate on the actual pair so such shapes take the XLA path.
    """
    if max(n0, n1) > MAX_FUSED_TOKENS:
        return False
    if max(n0, n1) <= _SINGLE_TILE_MAX:
        return True
    return (
        _pick_qblock(n0, n1) is not None
        and _pick_qblock(n1, n0) is not None
    )


def fused_self_attention_qkv(
    qkv, cos, sin, key_bias, scale, heads, *, interpret=False,
    return_stats=False,
):
    """Self-attention from a packed qkv tensor, heads split in VMEM.

    Args:
      qkv: ``[B, N, 3*D]`` with lane layout [q_heads | k_heads | v_heads]
        (permute the projection weights with :func:`permute_qkv_kernel`).
      cos/sin: ``[B, N, hd]`` rotary tables (pass None to skip rotary).
      key_bias: ``[B, N]`` f32 additive mask.
      return_stats: also return ``[B, N]`` f32 per-key attention mass summed
        over heads and valid query rows (divide by heads * n_valid for the
        reference's mean, nets/adagml.py:148).

    Returns:
      ``[B, N, D]`` merged-head messages, same lane order as the input
      heads — feeds the output projection directly. With ``return_stats``,
      a ``(messages, stat_sums)`` tuple.
    """
    b, n, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    rotary = cos is not None
    if not rotary:
        cos = jnp.zeros((b, n, hd), qkv.dtype)
        sin = cos
    bias = key_bias[:, None, :].astype(jnp.float32)

    out_shape = [jax.ShapeDtypeStruct((b, n, d), qkv.dtype)]
    if return_stats:
        out_shape.append(jax.ShapeDtypeStruct((b, 1, n), jnp.float32))

    if n <= _SINGLE_TILE_MAX:
        out_specs = [
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ]
        if return_stats:
            out_specs.append(
                pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        out = pl.pallas_call(
            partial(_qkv_kernel, scale=scale, heads=heads, hd=hd,
                    rotary=rotary, with_stats=return_stats),
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
            out_specs=out_specs if return_stats else out_specs[0],
            out_shape=out_shape if return_stats else out_shape[0],
            interpret=interpret,
        )(qkv, cos.astype(jnp.float32), sin.astype(jnp.float32), bias)
    else:
        qblk = _pick_qblock(n, n)
        if qblk is None:
            raise ValueError(
                f"fused self-attention unsupported for N={n}; gate with "
                "fused_attention_supported()"
            )
        if rotary:
            # pre-rotate K with one XLA elementwise pass so the kernel only
            # keeps the current block's rotary tables in VMEM (full-table
            # residents pushed the 4096-token tile over scoped VMEM)
            d_ = d
            hd_ = hd
            kcols = qkv[:, :, d_ : 2 * d_].astype(jnp.float32)
            kh = kcols.reshape(b, n, heads, hd_)
            kp = kh.reshape(b, n, heads, hd_ // 2, 2)
            krot = jnp.stack([-kp[..., 1], kp[..., 0]], axis=-1).reshape(
                b, n, heads, hd_
            )
            kr = kh * cos.astype(jnp.float32)[:, :, None, :] + krot * (
                sin.astype(jnp.float32)[:, :, None, :]
            )
            qkv = jnp.concatenate(
                [
                    qkv[:, :, :d_],
                    kr.reshape(b, n, d_).astype(qkv.dtype),
                    qkv[:, :, 2 * d_ :],
                ],
                axis=-1,
            )
        out_specs = [
            pl.BlockSpec((1, qblk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
        ]
        if return_stats:
            out_specs.append(
                pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        out = pl.pallas_call(
            partial(_qkv_tiled_kernel, scale=scale, heads=heads, hd=hd,
                    rotary=rotary, qblk=qblk, with_stats=return_stats),
            grid=(b, n // qblk),
            in_specs=[
                pl.BlockSpec((1, n, d3), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qblk, hd), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qblk, hd), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qblk, 1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs if return_stats else out_specs[0],
            out_shape=out_shape if return_stats else out_shape[0],
            interpret=interpret,
        )(qkv, cos.astype(jnp.float32), sin.astype(jnp.float32), bias,
          bias[:, 0, :, None])

    if return_stats:
        msg, stat = out
        return msg, stat[:, 0, :]
    return out


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
    *rest, scale, heads, hd, with_stats=False,
):
    bias0 = b0_ref[0]  # [1, N]
    bias1 = b1_ref[0]  # [1, M]
    stat0_total = None  # mass received by side-0 keys (queries = side 1)
    stat1_total = None  # mass received by side-1 keys (queries = side 0)
    for h in range(heads):
        s = slice(h * hd, (h + 1) * hd)
        q0 = qk0_ref[0, :, s]  # [N, hd]
        q1 = qk1_ref[0, :, s]  # [M, hd]
        v0 = v0_ref[0, :, s]
        v1 = v1_ref[0, :, s]

        e01, r01 = _attn_weights(
            jax.lax.dot_general(
                q0, q1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            scale, bias1,
        )  # [N, M]
        m0_ref[0, :, s] = (
            jnp.dot(
                e01.astype(v1.dtype), v1, preferred_element_type=jnp.float32
            ) * r01
        ).astype(m0_ref.dtype)

        e10, r10 = _attn_weights(
            jax.lax.dot_general(
                q1, q0, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            scale, bias0,
        )  # [M, N]
        m1_ref[0, :, s] = (
            jnp.dot(
                e10.astype(v0.dtype), v0, preferred_element_type=jnp.float32
            ) * r10
        ).astype(m1_ref.dtype)

        if with_stats:
            # stats need normalized attention (row weights are ROW vectors
            # here, so 1/sum can't fold into them) — pay the e*r pass
            qv0 = (bias0 > -0.5).astype(jnp.float32)  # [1, N]
            qv1 = (bias1 > -0.5).astype(jnp.float32)  # [1, M]
            s0 = jax.lax.dot_general(
                qv1, e10 * r10, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, N]
            s1 = jax.lax.dot_general(
                qv0, e01 * r01, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, M]
            stat0_total = s0 if stat0_total is None else stat0_total + s0
            stat1_total = s1 if stat1_total is None else stat1_total + s1
    if with_stats:
        rest[0][0] = stat0_total
        rest[1][0] = stat1_total


def _cross_dir_kernel(
    qkq_ref, qkk_ref, v_ref, bq_ref, bqcol_ref, bk_ref, msg_ref,
    stat_ref,
    *, scale, heads, hd, qblk,
):
    """One direction of cross attention, tiled over query rows.

    grid (batch, Nq // qblk); keys/values stay fully VMEM-resident. Emits
    the query-side messages and the key-side received-attention stat sums
    (accumulated across the sequential query-block axis)."""
    j = pl.program_id(1)
    bias_k = bk_ref[0]  # [1, M]
    qstart = j * qblk
    stat_total = None
    for h in range(heads):
        s = slice(h * hd, (h + 1) * hd)
        q = qkq_ref[0, pl.dslice(qstart, qblk), s]  # [qblk, hd]
        k = qkk_ref[0, :, s]  # [M, hd]
        v = v_ref[0, :, s]
        e, r = _attn_weights(
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            scale, bias_k,
        )  # [qblk, M]
        msg_ref[0, :, s] = (
            jnp.dot(
                e.astype(v.dtype), v, preferred_element_type=jnp.float32
            ) * r
        ).astype(msg_ref.dtype)
        qv = (
            bqcol_ref[0, pl.dslice(qstart, qblk), 0:1] > -0.5
        ).astype(jnp.float32)  # [qblk, 1]
        st = jnp.sum(e * (qv * r), axis=0, keepdims=True)  # [1, M]
        stat_total = st if stat_total is None else stat_total + st

    @pl.when(j == 0)
    def _init():
        stat_ref[0] = stat_total

    @pl.when(j != 0)
    def _acc():
        stat_ref[0] += stat_total


def _cross_attention_dir(
    qk_q, qk_k, v_k, bias_q, bias_k, scale, heads, *, interpret=False
):
    """Tiled one-directional cross attention; returns (msg_q, stat_k_sum)."""
    b, nq, d = qk_q.shape
    m = qk_k.shape[1]
    hd = d // heads
    qblk = _pick_qblock(nq, m)
    if qblk is None:
        raise ValueError(
            f"fused cross-attention unsupported for Nq={nq}, M={m}"
        )
    bq = bias_q[:, None, :].astype(jnp.float32)
    bk = bias_k[:, None, :].astype(jnp.float32)

    def const_spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda i, j, nd=nd: (i,) + (0,) * nd,
            memory_space=pltpu.VMEM,
        )

    msg, stat = pl.pallas_call(
        partial(_cross_dir_kernel, scale=scale, heads=heads, hd=hd,
                qblk=qblk),
        grid=(b, nq // qblk),
        in_specs=[
            const_spec(nq, d), const_spec(m, d), const_spec(m, d),
            const_spec(1, nq), const_spec(nq, 1), const_spec(1, m),
        ],
        out_specs=(
            pl.BlockSpec((1, qblk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            const_spec(1, m),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq, d), qk_q.dtype),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
        ),
        # Same scoped-vmem headroom as the projection kernel below: at the
        # AdaGML Aachen shape (Nq=4096, M=2048, d=256, bf16) Mosaic's stack
        # peaks at 17.41 MiB over the default 16 MiB cap when the grid is
        # deep enough for double-buffered prefetch (observed on a
        # standalone jit of the matcher; the composed bench pipeline
        # happened to schedule under the cap). v5e has 128 MiB VMEM/core.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qk_q, qk_k, v_k, bq, bq[:, 0, :, None], bk)
    return msg, stat[:, 0, :]


def fused_cross_attention_packed(
    qk0, qk1, v0, v1, bias0, bias1, scale, heads, *, interpret=False,
    return_stats=False,
):
    """Symmetric shared-QK cross attention on packed [B, N, D] tensors.

    Head split/merge happens on VMEM lane blocks; the full attention scale
    is applied to the similarity inside the kernel (callers pass the raw
    to_qk outputs). Above the single-tile size the two directions run as
    separate query-tiled kernels (same FLOPs: the symmetric kernel already
    recomputes sim^T).

    With ``return_stats``: also returns (stat0_sum ``[B, N]``, stat1_sum
    ``[B, M]``) — attention mass received by each side's tokens from the
    other side's valid queries, summed over heads (nets/adagml.py:229).
    """
    b, n, d = qk0.shape
    m = qk1.shape[1]
    hd = d // heads
    if max(n, m) <= _SINGLE_TILE_MAX:
        b0 = bias0[:, None, :].astype(jnp.float32)
        b1 = bias1[:, None, :].astype(jnp.float32)

        def spec(*shape):
            nd = len(shape)
            return pl.BlockSpec(
                (1,) + shape, lambda i, nd=nd: (i,) + (0,) * nd,
                memory_space=pltpu.VMEM,
            )

        out_specs = [spec(n, d), spec(m, d)]
        out_shape = [
            jax.ShapeDtypeStruct((b, n, d), qk0.dtype),
            jax.ShapeDtypeStruct((b, m, d), qk1.dtype),
        ]
        if return_stats:
            out_specs += [spec(1, n), spec(1, m)]
            out_shape += [
                jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            ]
        out = pl.pallas_call(
            partial(_cross_packed_kernel, scale=scale, heads=heads, hd=hd,
                    with_stats=return_stats),
            grid=(b,),
            in_specs=[
                spec(n, d), spec(m, d), spec(n, d), spec(m, d),
                spec(1, n), spec(1, m),
            ],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(qk0, qk1, v0, v1, b0, b1)
        if return_stats:
            m0, m1, s0, s1 = out
            return m0, m1, s0[:, 0, :], s1[:, 0, :]
        return out

    m0, stat1 = _cross_attention_dir(
        qk0, qk1, v1, bias0, bias1, scale, heads, interpret=interpret
    )
    m1, stat0 = _cross_attention_dir(
        qk1, qk0, v0, bias1, bias0, scale, heads, interpret=interpret
    )
    if return_stats:
        return m0, m1, stat0, stat1
    return m0, m1


# ---------------------------------------------------------------------------
# projection-fused variants: the qkv / to_qk / to_v matmuls run in-kernel
# (weights VMEM-resident), removing the XLA matmul boundaries inside a
# transformer layer — per layer only the attention and MLP kernels remain.
# ---------------------------------------------------------------------------


def _blocked_self_attention(qkv_scratch, cos_ref, sin_ref, bias_ref,
                            o_ref, *, scale, heads, hd, rotary, splits):
    """Blocked (per-side) masked self-attention over a projected
    qkv_scratch — shared tail of the bf16 and int8 projection kernels."""
    d = heads * hd
    n_total = bias_ref.shape[-1]
    bias = bias_ref[0]  # [1, N]
    edges = [0]
    for s in splits:
        edges.append(edges[-1] + s)
    for lo, hi in zip(edges[:-1], edges[1:]):
        if rotary:
            cos = cos_ref[0, lo:hi, :]
            sin = sin_ref[0, lo:hi, :]
        if lo == 0:
            bias_b = bias[:, :hi]
        else:
            bias_b = pltpu.roll(bias, n_total - lo, 1)[:, : hi - lo]
        for h in range(heads):
            q = qkv_scratch[lo:hi, h * hd : (h + 1) * hd]
            k = qkv_scratch[lo:hi, d + h * hd : d + (h + 1) * hd]
            v = qkv_scratch[lo:hi, 2 * d + h * hd : 2 * d + (h + 1) * hd]
            if rotary:
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                q = (qf * cos + _rotate_half_lanes(q) * sin).astype(q.dtype)
                k = (kf * cos + _rotate_half_lanes(k) * sin).astype(k.dtype)
            e, r = _attn_weights(
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ),
                scale, bias_b,
            )
            o_ref[0, lo:hi, h * hd : (h + 1) * hd] = (
                jnp.dot(
                    e.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                ) * r
            ).astype(o_ref.dtype)


def _self_proj_kernel(x_ref, w_ref, b_ref, cos_ref, sin_ref, bias_ref,
                      o_ref, qkv_scratch, *, scale, heads, hd, rotary,
                      splits):
    """x [1, N, Din] -> (in-kernel qkv projection) -> blocked attention."""
    x = x_ref[0]
    qkv_scratch[...] = (
        jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    ).astype(qkv_scratch.dtype)
    _blocked_self_attention(
        qkv_scratch, cos_ref, sin_ref, bias_ref, o_ref,
        scale=scale, heads=heads, hd=hd, rotary=rotary, splits=splits,
    )


def _self_proj_kernel_i8(x_ref, w_ref, ws_ref, b_ref, cos_ref, sin_ref,
                         bias_ref, o_ref, qkv_scratch, *, scale, heads,
                         hd, rotary, splits):
    """Int8 qkv projection: per-row dynamic activation scales, per-column
    weight scales (ws_ref), s8xs8->s32 MXU matmul, f32 dequantize; the
    attention tail is identical to the bf16 variant."""
    from pram_tpu.ops.mlp_pallas import _quant_rows

    xq, xrs = _quant_rows(x_ref[0])
    qkv_scratch[...] = (
        jax.lax.dot_general(
            xq, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xrs * ws_ref[...]
        + b_ref[...]
    ).astype(qkv_scratch.dtype)
    _blocked_self_attention(
        qkv_scratch, cos_ref, sin_ref, bias_ref, o_ref,
        scale=scale, heads=heads, hd=hd, rotary=rotary, splits=splits,
    )


def fused_self_attention_proj(
    x, w_qkv, b_qkv, cos, sin, key_bias, scale, heads, splits=None,
    *, int8=False, interpret=False,
):
    """Self-attention with the (permuted) qkv projection fused in-kernel.

    ``w_qkv``/``b_qkv``: output of :func:`permute_qkv_kernel`. ``splits``
    (optional) runs block-diagonal attention over the token concatenation.
    ``int8`` runs the projection matmul s8xs8->s32 (weights quantized per
    column here, activations per row in-kernel) — inference only.
    """
    b, n, din = x.shape
    d3 = w_qkv.shape[-1]
    d = d3 // 3
    hd = d // heads
    rotary = cos is not None
    if not rotary:
        cos = jnp.zeros((b, n, hd), x.dtype)
        sin = cos
    if splits is None:
        splits = (n,)
    bias = key_bias[:, None, :].astype(jnp.float32)

    def wspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if int8:
        from pram_tpu.ops.mlp_pallas import _quant_cols

        wq, ws = _quant_cols(w_qkv)
        kern = partial(_self_proj_kernel_i8, scale=scale, heads=heads,
                       hd=hd, rotary=rotary, splits=tuple(splits))
        w_args = (wq, ws)
        w_specs = [wspec(din, d3), wspec(1, d3)]
    else:
        kern = partial(_self_proj_kernel, scale=scale, heads=heads, hd=hd,
                       rotary=rotary, splits=tuple(splits))
        w_args = (w_qkv.astype(x.dtype),)
        w_specs = [wspec(din, d3)]

    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, din), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
            wspec(1, d3),
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, d3), x.dtype)],
        interpret=interpret,
    )(
        x, *w_args, b_qkv[None].astype(jnp.float32),
        cos.astype(jnp.float32), sin.astype(jnp.float32), bias,
    )


def _symmetric_cross_attention(qk_scratch, v_scratch, b0_ref, b1_ref,
                               m_ref, *, scale, heads, hd, n0):
    """Symmetric shared-QK cross attention over projected scratches —
    shared tail of the bf16 and int8 projection kernels."""
    bias0 = b0_ref[0]  # [1, N0]
    bias1 = b1_ref[0]  # [1, N1]
    for h in range(heads):
        s = slice(h * hd, (h + 1) * hd)
        q0 = qk_scratch[:n0, s]
        q1 = qk_scratch[n0:, s]
        v0 = v_scratch[:n0, s]
        v1 = v_scratch[n0:, s]

        e, r = _attn_weights(
            jax.lax.dot_general(
                q0, q1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            scale, bias1,
        )
        m_ref[0, :n0, s] = (
            jnp.dot(
                e.astype(v1.dtype), v1, preferred_element_type=jnp.float32
            ) * r
        ).astype(m_ref.dtype)

        e, r = _attn_weights(
            jax.lax.dot_general(
                q1, q0, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            scale, bias0,
        )
        m_ref[0, n0:, s] = (
            jnp.dot(
                e.astype(v0.dtype), v0, preferred_element_type=jnp.float32
            ) * r
        ).astype(m_ref.dtype)


def _cross_proj_kernel(x_ref, wqk_ref, bqk_ref, wv_ref, bv_ref,
                       b0_ref, b1_ref, m_ref, qk_scratch, v_scratch,
                       *, scale, heads, hd, n0):
    """x(cat) [1, N, D] -> in-kernel to_qk/to_v -> symmetric cross attn."""
    x = x_ref[0]
    qk_scratch[...] = (
        jnp.dot(x, wqk_ref[...], preferred_element_type=jnp.float32)
        + bqk_ref[...]
    ).astype(qk_scratch.dtype)
    v_scratch[...] = (
        jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
        + bv_ref[...]
    ).astype(v_scratch.dtype)
    _symmetric_cross_attention(
        qk_scratch, v_scratch, b0_ref, b1_ref, m_ref,
        scale=scale, heads=heads, hd=hd, n0=n0,
    )


def _cross_proj_kernel_i8(x_ref, wqk_ref, wqks_ref, bqk_ref, wv_ref,
                          wvs_ref, bv_ref, b0_ref, b1_ref, m_ref,
                          qk_scratch, v_scratch, *, scale, heads, hd, n0):
    """Int8 to_qk/to_v projections (one shared per-row activation quant),
    bf16 attention tail identical to the float variant."""
    from pram_tpu.ops.mlp_pallas import _quant_rows

    xq, xrs = _quant_rows(x_ref[0])
    qk_scratch[...] = (
        jax.lax.dot_general(
            xq, wqk_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xrs * wqks_ref[...]
        + bqk_ref[...]
    ).astype(qk_scratch.dtype)
    v_scratch[...] = (
        jax.lax.dot_general(
            xq, wv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xrs * wvs_ref[...]
        + bv_ref[...]
    ).astype(v_scratch.dtype)
    _symmetric_cross_attention(
        qk_scratch, v_scratch, b0_ref, b1_ref, m_ref,
        scale=scale, heads=heads, hd=hd, n0=n0,
    )


def fused_cross_attention_proj(
    x_cat, w_qk, b_qk, w_v, b_v, bias0, bias1, scale, heads, n0,
    *, int8=False, interpret=False,
):
    """Symmetric shared-QK cross attention with in-kernel projections.

    ``x_cat`` ``[B, N0+N1, D]``; returns messages for the concatenation
    (``[B, N0+N1, D]``, same layout).
    """
    b, n, din = x_cat.shape
    d = w_qk.shape[-1]
    hd = d // heads
    b0 = bias0[:, None, :].astype(jnp.float32)
    b1 = bias1[:, None, :].astype(jnp.float32)

    def wspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if int8:
        from pram_tpu.ops.mlp_pallas import _quant_cols

        wqk_q, wqk_s = _quant_cols(w_qk)
        wv_q, wv_s = _quant_cols(w_v)
        kern = partial(_cross_proj_kernel_i8, scale=scale, heads=heads,
                       hd=hd, n0=n0)
        w_args = (
            wqk_q, wqk_s, b_qk[None].astype(jnp.float32),
            wv_q, wv_s, b_v[None].astype(jnp.float32),
        )
        w_specs = [wspec(din, d), wspec(1, d), wspec(1, d),
                   wspec(din, d), wspec(1, d), wspec(1, d)]
    else:
        kern = partial(_cross_proj_kernel, scale=scale, heads=heads,
                       hd=hd, n0=n0)
        w_args = (
            w_qk.astype(x_cat.dtype), b_qk[None].astype(jnp.float32),
            w_v.astype(x_cat.dtype), b_v[None].astype(jnp.float32),
        )
        w_specs = [wspec(din, d), wspec(1, d), wspec(din, d), wspec(1, d)]

    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, din), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
            pl.BlockSpec((1, 1, n0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n - n0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x_cat.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, d), x_cat.dtype),
            pltpu.VMEM((n, d), x_cat.dtype),
        ],
        # the default 16 MiB scoped-vmem cap rejects this kernel at the
        # full-sweep GML shape (n0=512, n1=1024, d=256, bf16: Mosaic's
        # stack peaks at 16.42 MiB once the vmapped seg_k axis deepens the
        # grid and re-enables double-buffered prefetch — the seg_k=1 grid
        # compiles fine). v5e has 128 MiB VMEM/core; granting 24 MiB keeps
        # the fused path on the k10 worst-case sweep instead of falling
        # back to HBM-materialized XLA attention.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_cat, *w_args, b0, b1)
