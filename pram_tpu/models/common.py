"""Shared transformer building blocks (flax.linen).

Covers the blocks the reference repeats across SegNetViT / GML / AdaGML
(nets/segnetvit.py:15-107, nets/gml.py:49-187): interleaved-pair rotary
embedding driven by a learnable Fourier projection of keypoint coordinates,
and the self-/cross-attention blocks with concat-MLP residual updates.

All attention here is dense O(N²) over <=4096 keypoint tokens — small enough
that a single fused XLA attention (one MXU matmul per side) beats any clever
sparsity; masking handles padding. Parameter layouts mirror the torch modules
one-to-one so checkpoints convert losslessly (see models/convert.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def rotate_half(x: jax.Array) -> jax.Array:
    """Interleaved-pair rotation: (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...).

    Matches nets/segnetvit.py:15-18 (unflatten into pairs, swap & negate).
    """
    xp = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = xp[..., 0], xp[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(freqs: Tuple[jax.Array, jax.Array], t: jax.Array) -> jax.Array:
    """Apply cached rotary embedding: t*cos + rotate_half(t)*sin.

    ``freqs`` = (cos, sin), each ``[B, 1, N, head_dim]`` broadcasting over the
    head axis of ``t`` ``[B, H, N, head_dim]`` (nets/segnetvit.py:21-23).
    """
    cos, sin = freqs
    return t * cos + rotate_half(t) * sin


class LearnableFourierPE(nn.Module):
    """Learnable Fourier positional encoding producing rotary (cos, sin).

    Reference: nets/segnetvit.py:26-40. A bias-free linear projects the
    M-dim position to F_dim/2 frequencies; cos/sin are duplicated per rotary
    pair (repeat_interleave(2) on the last axis).
    """

    f_dim: int  # full head dim (output is duplicated pairs of f_dim // 2)
    gamma: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # x: [B, N, M] normalized keypoint coords
        proj = nn.Dense(
            self.f_dim // 2,
            use_bias=False,
            kernel_init=nn.initializers.normal(self.gamma**-2),
            name="Wr",
        )(x)
        cos = jnp.cos(proj)
        sin = jnp.sin(proj)
        # duplicate each frequency for the interleaved rotary pairs
        cos = jnp.repeat(cos, 2, axis=-1)[:, None]  # [B, 1, N, f_dim]
        sin = jnp.repeat(sin, 2, axis=-1)[:, None]
        return cos, sin


_FUSED_OVERRIDE: Optional[bool] = None


class fused_attention_disabled:
    """Context manager forcing the XLA attention path while TRACING.

    The Pallas kernels are forward-only (no VJP): any code that
    differentiates through the transformers (GML synthetic fitting,
    recognition training) must trace the einsum path. The flag is read at
    trace time, so wrapping the ``model.apply`` / ``value_and_grad`` call
    inside a jitted function is sufficient — other call sites in the same
    step (e.g. the frozen SFD2 augmentation forward) keep the fused kernels.
    """

    def __enter__(self):
        global _FUSED_OVERRIDE
        self._prev = _FUSED_OVERRIDE
        _FUSED_OVERRIDE = False
        return self

    def __exit__(self, *exc):
        global _FUSED_OVERRIDE
        _FUSED_OVERRIDE = self._prev
        return False


def _attn_vmem_ok(n: int, m: int, d: int, itemsize: int) -> bool:
    from pram_tpu.ops.attention_pallas import attention_vmem_ok

    return attention_vmem_ok(n, m, d, itemsize)


def use_fused_attention(*token_counts: int) -> bool:
    """Fused Pallas attention is the default on TPU backends.

    The XLA einsum path materializes [B, H, N, M] f32 logits between the two
    attention matmuls; the fused kernels (ops/attention_pallas.py) keep them
    in VMEM. Both paths are element-wise equivalent (tests/test_attention_
    pallas.py).

    ``token_counts`` are the attention side lengths at the call site: the
    fused path is gated off for counts the kernels can't tile into VMEM
    (> ops/attention_pallas.py:MAX_FUSED_TOKENS or with no 8-aligned query
    block), falling back to the XLA einsum path.
    """
    if _FUSED_OVERRIDE is False:
        return False
    from pram_tpu.utils.pallas_gate import tpu_pallas_ok

    if not tpu_pallas_ok():
        return False
    if token_counts:
        from pram_tpu.ops.attention_pallas import fused_attention_supported

        return fused_attention_supported(*token_counts)
    return True


def use_fused_cross_attention(n0: int, n1: int) -> bool:
    """Cross-attention gate on the actual (query, key) token pair.

    The self-attention gate checks each count against itself; the cross
    kernels tile ``[n0, n1]`` and ``[n1, n0]`` logits blocks, so an
    asymmetric pair must be gated as a pair (ADVICE r3 #2).
    """
    if not use_fused_attention():
        return False
    from pram_tpu.ops.attention_pallas import (
        fused_cross_attention_supported,
    )

    return fused_cross_attention_supported(n0, n1)


def int8_proj_enabled() -> bool:
    """Trace-time flag for int8 in-kernel attention projections
    (PRAM_INT8_PROJ=1). Inference-only, like int8_mlp_enabled; accuracy
    gated by the image-level recall guard."""
    import os

    from pram_tpu.utils.pallas_gate import pallas_ok

    return pallas_ok() and os.environ.get("PRAM_INT8_PROJ", "0") == "1"


def int8_mlp_enabled() -> bool:
    """Trace-time flag for the int8 residual-MLP kernel (PRAM_INT8_MLP=1).

    Inference-only: the int8 kernel is forward-only (no VJP), so
    differentiating a trace with the flag on fails loudly at grad time.
    Activation quantization is per-row dynamic; accuracy is gated by the
    image-level recall guard, which runs whatever configuration the bench
    runs (engine/rendered_guard.py).
    """
    import os

    from pram_tpu.utils.pallas_gate import pallas_ok

    return pallas_ok() and os.environ.get("PRAM_INT8_MLP", "0") == "1"


def mask_to_bias(mask: Optional[jax.Array], b: int, n: int) -> jax.Array:
    """Bool validity mask -> f32 additive attention bias (0 / -1e9)."""
    if mask is None:
        return jnp.zeros((b, n), jnp.float32)
    return jnp.where(mask, 0.0, -1e9).astype(jnp.float32)


def masked_softmax(
    logits: jax.Array, mask: Optional[jax.Array], axis: int = -1
) -> jax.Array:
    """Softmax with a key-validity mask (True = valid).

    Masked positions get -1e9 before the softmax; if a whole row is masked the
    result is uniform (harmless: such rows are themselves masked downstream).
    """
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-1e9, logits.dtype))
    return jax.nn.softmax(logits, axis=axis)


class _LNParams(nn.Module):
    """Bare LayerNorm parameters with nn.LayerNorm's naming (for the fused
    residual-MLP kernel)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """Bare Dense parameters with nn.Dense's init and naming (the fused
    attention path applies them with permuted columns)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class SelfAttentionBlock(nn.Module):
    """Self-attention block with rotary encoding and concat-MLP residual.

    Reference: nets/segnetvit.py:79-106 / nets/gml.py:110-140. The fused qkv
    projection keeps the torch layout ``[..., heads, head_dim, 3]`` so
    converted weights slice identically.

    On TPU the whole attention op (head split, rotary, masked softmax, head
    merge) runs as one Pallas kernel on a packed qkv tensor
    (ops/attention_pallas.py): the projection's output columns are permuted
    instead of reshaping/transposing the activation, and rotary runs in
    bf16 inside VMEM — the XLA path materializes f32 [B,H,N,M] logits and
    promotes the QK matmul to f32 through the rotary multiply.
    """

    feat_dim: int
    hidden_dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoding: Optional[Tuple[jax.Array, jax.Array]] = None,
        mask: Optional[jax.Array] = None,
        splits: Optional[Tuple[int, ...]] = None,
    ) -> jax.Array:
        """``splits``: when x is a token-concatenation of independent sides
        (GML runs self-attention on both keypoint sets with shared weights),
        the projections and MLP run once on the concatenation while
        attention stays blocked per side — halving the number of (layout-
        bound) XLA matmuls per layer without changing results."""
        b, n, _ = x.shape
        h = self.num_heads
        hd = self.hidden_dim // h
        scale = hd**-0.5
        bounds = None
        if splits is not None:
            assert sum(splits) == n
            edges = [0]
            for s in splits:
                edges.append(edges[-1] + s)
            bounds = list(zip(edges[:-1], edges[1:]))

        attn_sizes = splits if splits is not None else (n,)
        if use_fused_attention(*attn_sizes) and _attn_vmem_ok(
            max(attn_sizes), max(attn_sizes), self.hidden_dim,
            x.dtype.itemsize,
        ):
            from pram_tpu.ops.attention_pallas import (
                fused_self_attention_qkv,
                permute_qkv_kernel,
            )

            kernel, kbias = _DenseParams(
                self.hidden_dim * 3, name="qkv"
            )(x.shape[-1])
            wp, bp = permute_qkv_kernel(kernel, kbias, h, hd)
            if encoding is not None:
                cos, sin = encoding  # [B, 1, N, hd]
                cos, sin = cos[:, 0], sin[:, 0]
            else:
                cos = sin = None

            def attend(qkv_s, cos_s, sin_s, mask_s, n_s):
                return fused_self_attention_qkv(
                    qkv_s, cos_s, sin_s, mask_to_bias(mask_s, b, n_s),
                    scale, h,
                )

            if max(attn_sizes) <= 1024:
                # one kernel program per frame: in-kernel qkv projection +
                # (block-diagonal) attention — no XLA matmul boundary.
                # (Merging the residual MLP into the same kernel was
                # measured SLOWER: 388.6 -> 369.7 fps — the monolithic
                # program starves cross-program DMA overlap; see
                # ROUND_NOTES negative results.)
                # Routed through the custom-VJP wrapper so DIFFERENTIATED
                # traces (training) keep the kernel forward and get a
                # recompute-XLA backward (ops/train_vjp.py).
                from pram_tpu.ops.train_vjp import self_attention_proj

                if int8_proj_enabled():
                    # inference-only int8 projection (no VJP wrapper)
                    from pram_tpu.ops.attention_pallas import (
                        fused_self_attention_proj,
                    )

                    msg = fused_self_attention_proj(
                        x, wp, bp, cos, sin, mask_to_bias(mask, b, n),
                        scale, h, tuple(attn_sizes), int8=True,
                    ).astype(x.dtype)
                else:
                    if cos is None:
                        cos_a = jnp.zeros((b, n, hd), x.dtype)
                        sin_a = cos_a
                    else:
                        cos_a, sin_a = cos, sin
                    msg = self_attention_proj(
                        x, wp, bp, cos_a, sin_a, mask_to_bias(mask, b, n),
                        scale, h, tuple(attn_sizes), cos is not None,
                    ).astype(x.dtype)
            elif bounds is None:
                qkv = (x @ wp.astype(x.dtype)) + bp.astype(x.dtype)
                msg = attend(qkv, cos, sin, mask, n).astype(x.dtype)
            else:
                qkv = (x @ wp.astype(x.dtype)) + bp.astype(x.dtype)
                msg = jnp.concatenate(
                    [
                        attend(
                            qkv[:, lo:hi],
                            None if cos is None else cos[:, lo:hi],
                            None if sin is None else sin[:, lo:hi],
                            None if mask is None else mask[:, lo:hi],
                            hi - lo,
                        )
                        for lo, hi in bounds
                    ],
                    axis=1,
                ).astype(x.dtype)
        else:
            qkv = nn.Dense(self.hidden_dim * 3, name="qkv")(x)
            qkv = qkv.reshape(b, n, h, hd, 3)
            qkv = jnp.moveaxis(qkv, 2, 1)  # [B, H, N, hd, 3]
            q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
            if encoding is not None:
                q = apply_rotary(encoding, q)
                k = apply_rotary(encoding, k)

            def attend(q_s, k_s, v_s, mask_s):
                logits = jnp.einsum(
                    "bhid,bhjd->bhij", q_s, k_s,
                    preferred_element_type=jnp.float32,
                ) * scale
                key_mask = (
                    None if mask_s is None else mask_s[:, None, None, :]
                )
                attn = masked_softmax(logits, key_mask).astype(v_s.dtype)
                return jnp.einsum(
                    "bhij,bhjd->bhid", attn, v_s,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)

            if bounds is None:
                msg = attend(q, k, v, mask)
            else:
                msg = jnp.concatenate(
                    [
                        attend(
                            q[:, :, lo:hi], k[:, :, lo:hi], v[:, :, lo:hi],
                            None if mask is None else mask[:, lo:hi],
                        )
                        for lo, hi in bounds
                    ],
                    axis=2,
                )
            msg = jnp.moveaxis(msg, 1, 2).reshape(b, n, self.hidden_dim)

        from pram_tpu.ops.mlp_pallas import fused_mlp_supported
        from pram_tpu.ops.train_vjp import residual_mlp

        if use_fused_attention() and fused_mlp_supported(
            n, self.feat_dim, self.feat_dim * 2, x.dtype.itemsize
        ):
            wp_, bp_ = _DenseParams(self.hidden_dim, name="proj")(
                self.hidden_dim
            )
            w0_, b0_ = _DenseParams(self.feat_dim * 2, name="mlp_0")(
                x.shape[-1] + self.hidden_dim
            )
            g_, be_ = _LNParams(self.feat_dim * 2, name="mlp_ln")()
            w3_, b3_ = _DenseParams(self.feat_dim, name="mlp_3")(
                self.feat_dim * 2
            )
            if int8_mlp_enabled():
                from pram_tpu.ops.mlp_pallas import (
                    fused_mlp_int8_supported,
                    fused_residual_mlp_int8,
                )

                if fused_mlp_int8_supported(
                    n, self.feat_dim, self.feat_dim * 2, x.dtype.itemsize
                ):
                    return fused_residual_mlp_int8(
                        x, msg, wp_, bp_, w0_, b0_, g_, be_, w3_, b3_
                    )
            # custom-VJP wrapper: kernel forward, recompute-XLA backward
            return residual_mlp(
                x, msg, wp_, bp_, w0_, b0_, g_, be_, w3_, b3_
            )

        msg = nn.Dense(self.hidden_dim, name="proj")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(self.feat_dim * 2, name="mlp_0")(y)
        y = nn.LayerNorm(name="mlp_ln")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.feat_dim, name="mlp_3")(y)
        return x + y


class CrossAttentionBlock(nn.Module):
    """Symmetric cross-attention with shared QK projection.

    Reference: nets/gml.py:143-186. Both sides share ``to_qk``; the similarity
    is computed once and softmaxed along each axis for the two directions.
    """

    feat_dim: int
    hidden_dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        x0: jax.Array,
        x1: Optional[jax.Array] = None,
        mask0: Optional[jax.Array] = None,
        mask1: Optional[jax.Array] = None,
        splits: Optional[Tuple[int, int]] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Pass (x0, x1) as separate sides, or x0 = their token
        concatenation with ``splits=(n0, n1)`` and x1=None — the cat form
        keeps one token stream flowing through a whole GML layer stack
        (no per-layer split/concat of the activations)."""
        cat_in = x1 is None
        if cat_in:
            n0, n1 = splits
            x0, x1 = x0[:, :n0], x0[:, n0:]
        b, n0, _ = x0.shape
        n1 = x1.shape[1]
        h = self.num_heads
        hd = self.hidden_dim // h
        scale = hd**-0.5

        from pram_tpu.ops.mlp_pallas import fused_mlp_supported

        if (
            use_fused_cross_attention(n0, n1)
            and _attn_vmem_ok(n0, n1, self.hidden_dim, x0.dtype.itemsize)
            and fused_mlp_supported(
                n0 + n1, self.feat_dim, self.feat_dim * 2, x0.dtype.itemsize
            )
        ):
            cat = jnp.concatenate([x0, x1], axis=1)
            if max(n0, n1) <= 1024:
                # in-kernel to_qk/to_v projections + symmetric cross
                # attention in one program per frame
                wqk, bqk = _DenseParams(self.hidden_dim, name="to_qk")(
                    cat.shape[-1]
                )
                wv, bv = _DenseParams(self.hidden_dim, name="to_v")(
                    cat.shape[-1]
                )
                if int8_proj_enabled():
                    # inference-only int8 projections (no VJP wrapper)
                    from pram_tpu.ops.attention_pallas import (
                        fused_cross_attention_proj,
                    )

                    m_cat = fused_cross_attention_proj(
                        cat, wqk, bqk, wv, bv,
                        mask_to_bias(mask0, b, n0),
                        mask_to_bias(mask1, b, n1),
                        scale, h, n0, int8=True,
                    ).astype(x0.dtype)
                else:
                    # custom-VJP wrapper: kernel forward, recompute-XLA
                    # backward, so DIFFERENTIATED traces (GML/AdaGML
                    # training) keep the fused kernel (ops/train_vjp.py)
                    from pram_tpu.ops.train_vjp import cross_attention_proj

                    m_cat = cross_attention_proj(
                        cat, wqk, bqk, wv, bv,
                        mask_to_bias(mask0, b, n0),
                        mask_to_bias(mask1, b, n1),
                        scale, h, n0,
                    ).astype(x0.dtype)
            else:
                from pram_tpu.ops.attention_pallas import (
                    fused_cross_attention_packed,
                )

                # one projection matmul over the token concatenation (both
                # sides share weights), sliced for the attention kernel
                qk = nn.Dense(self.hidden_dim, name="to_qk")(cat)
                v = nn.Dense(self.hidden_dim, name="to_v")(cat)
                m0, m1 = fused_cross_attention_packed(
                    qk[:, :n0], qk[:, n0:], v[:, :n0], v[:, n0:],
                    mask_to_bias(mask0, b, n0), mask_to_bias(mask1, b, n1),
                    scale, h,
                )
                m_cat = jnp.concatenate([m0, m1], axis=1).astype(x0.dtype)
            wp_, bp_ = _DenseParams(self.hidden_dim, name="proj")(
                self.hidden_dim
            )
            w0_, b0_ = _DenseParams(self.feat_dim * 2, name="mlp_0")(
                cat.shape[-1] + self.hidden_dim
            )
            g_, be_ = _LNParams(self.feat_dim * 2, name="mlp_ln")()
            w3_, b3_ = _DenseParams(self.feat_dim, name="mlp_3")(
                self.feat_dim * 2
            )
            use_i8 = int8_mlp_enabled()
            if use_i8:
                from pram_tpu.ops.mlp_pallas import (
                    fused_mlp_int8_supported,
                    fused_residual_mlp_int8,
                )

                use_i8 = fused_mlp_int8_supported(
                    n0 + n1, self.feat_dim, self.feat_dim * 2,
                    x0.dtype.itemsize,
                )
            if use_i8:
                out = fused_residual_mlp_int8(
                    cat, m_cat, wp_, bp_, w0_, b0_, g_, be_, w3_, b3_
                )
            else:
                # custom-VJP wrapper (kernel fwd, recompute-XLA bwd)
                from pram_tpu.ops.train_vjp import residual_mlp

                out = residual_mlp(
                    cat, m_cat, wp_, bp_, w0_, b0_, g_, be_, w3_, b3_
                )
            if cat_in:
                return out, None
            return out[:, :n0], out[:, n0:]
        else:
            to_qk = nn.Dense(self.hidden_dim, name="to_qk")
            to_v = nn.Dense(self.hidden_dim, name="to_v")
            proj = nn.Dense(self.hidden_dim, name="proj")
            mlp_0 = nn.Dense(self.feat_dim * 2, name="mlp_0")
            mlp_ln = nn.LayerNorm(name="mlp_ln")
            mlp_3 = nn.Dense(self.feat_dim, name="mlp_3")

            def split_heads(t, n):
                return jnp.moveaxis(t.reshape(b, n, h, hd), 2, 1)

            qk0 = split_heads(to_qk(x0), n0) * scale**0.5
            qk1 = split_heads(to_qk(x1), n1) * scale**0.5
            v0 = split_heads(to_v(x0), n0)
            v1 = split_heads(to_v(x1), n1)

            sim = jnp.einsum(
                "bhid,bhjd->bhij", qk0, qk1,
                preferred_element_type=jnp.float32,
            )
            attn01 = masked_softmax(
                sim, None if mask1 is None else mask1[:, None, None, :],
                axis=-1,
            ).astype(v1.dtype)
            attn10 = masked_softmax(
                sim, None if mask0 is None else mask0[:, None, :, None],
                axis=-2,
            ).astype(v0.dtype)
            m0 = jnp.einsum(
                "bhij,bhjd->bhid", attn01, v1,
                preferred_element_type=jnp.float32,
            ).astype(x0.dtype)
            m1 = jnp.einsum(
                "bhij,bhid->bhjd", attn10, v0,
                preferred_element_type=jnp.float32,
            ).astype(x1.dtype)

            def merge(t, n):
                return jnp.moveaxis(t, 1, 2).reshape(b, n, self.hidden_dim)

            m0 = merge(m0, n0)
            m1 = merge(m1, n1)

        m0 = proj(m0)
        m1 = proj(m1)

        def mlp(x, m):
            y = jnp.concatenate([x, m], axis=-1)
            y = mlp_0(y)
            y = mlp_ln(y)
            y = nn.gelu(y, approximate=False)
            return mlp_3(y)

        y0 = x0 + mlp(x0, m0)
        y1 = x1 + mlp(x1, m1)
        if cat_in:
            return jnp.concatenate([y0, y1], axis=1), None
        return y0, y1
