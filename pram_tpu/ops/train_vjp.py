"""Differentiable wrappers for the fused forward kernels (VERDICT r3 #4).

The Pallas kernels (ops/attention_pallas.py, ops/mlp_pallas.py) are
forward-only; before this module, any differentiated trace had to fall back
to the XLA einsum path wholesale (``fused_attention_disabled``), leaving the
training forward ~2x off the inference forward and the backward in f32.

Each op here is a ``jax.custom_vjp``:

  primal   = the fused Pallas kernel (on TPU, when the shape gate passes),
             so the TRAINING forward runs the same kernels as inference;
  backward = the VJP of an XLA reference implementation of the identical
             math, recomputed from the saved inputs (flash-style recompute:
             no [B, H, N, N] probability tensor is ever saved, and the
             matmuls run in the activation dtype with f32 accumulation).

Gradient correctness is pinned by tests/test_train_vjp.py: the custom
backward must match autodiff of the XLA path to numerical tolerance.

Reference being modeled: the training path of nets/segnetvit.py:44-107
(torch autograd through einsum attention; the reference has no fused
training kernels at all — this is capability beyond it).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _rotate_half(x: jax.Array) -> jax.Array:
    """Interleaved-pair rotation (models/common.py:23-30)."""
    xp = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = xp[..., 0], xp[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


# ---------------------------------------------------------------------------
# self-attention with in-kernel qkv projection (+ rotary, block-diagonal)
# ---------------------------------------------------------------------------


def self_attention_proj_ref(
    x, wp, bp, cos, sin, bias, *, scale, heads, splits, rotary
):
    """XLA math of ops/attention_pallas._self_proj_kernel.

    ``wp``/``bp`` are the PERMUTED projection ([q_heads | k_heads | v_heads]
    lanes, permute_qkv_kernel); ``cos``/``sin`` ``[B, N, hd]``; ``bias``
    ``[B, N]`` additive f32 key mask; ``splits`` block-diagonal bounds.
    """
    b, n, _ = x.shape
    d3 = wp.shape[-1]
    d = d3 // 3
    hd = d // heads
    qkv = (
        jnp.einsum(
            "bnd,df->bnf", x, wp.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        + bp.astype(jnp.float32)
    ).astype(x.dtype)
    edges = [0]
    for s in splits:
        edges.append(edges[-1] + s)
    outs = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = hi - lo
        q = qkv[:, lo:hi, :d].reshape(b, m, heads, hd)
        k = qkv[:, lo:hi, d : 2 * d].reshape(b, m, heads, hd)
        v = qkv[:, lo:hi, 2 * d :].reshape(b, m, heads, hd)
        if rotary:
            c = cos[:, lo:hi, None, :].astype(jnp.float32)
            s_ = sin[:, lo:hi, None, :].astype(jnp.float32)
            q = (q.astype(jnp.float32) * c + _rotate_half(q) * s_).astype(
                q.dtype
            )
            k = (k.astype(jnp.float32) * c + _rotate_half(k) * s_).astype(
                k.dtype
            )
        logits = (
            jnp.einsum(
                "bnhd,bmhd->bhnm", q, k,
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias[:, None, None, lo:hi].astype(jnp.float32)
        )
        logits -= jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        msg = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        outs.append(msg.reshape(b, m, d))
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def self_attention_proj(
    x, wp, bp, cos, sin, bias,
    scale: float, heads: int, splits: Tuple[int, ...], rotary: bool,
):
    """Kernel forward / recompute-XLA backward self-attention.

    Call-site contract: only invoke when the fused gate passes (same gating
    as the raw kernel); off-TPU primal traces run the XLA reference.
    """
    if jax.default_backend() == "tpu":
        from pram_tpu.ops.attention_pallas import fused_self_attention_proj

        return fused_self_attention_proj(
            x, wp, bp, cos if rotary else None, sin if rotary else None,
            bias, scale, heads, splits=splits,
        ).astype(x.dtype)
    return self_attention_proj_ref(
        x, wp, bp, cos, sin, bias,
        scale=scale, heads=heads, splits=splits, rotary=rotary,
    )


def _self_attn_fwd(x, wp, bp, cos, sin, bias, scale, heads, splits, rotary):
    out = self_attention_proj(
        x, wp, bp, cos, sin, bias, scale, heads, splits, rotary
    )
    return out, (x, wp, bp, cos, sin, bias)


def attn_bwd_kernel_enabled() -> bool:
    """Trace-time flag for the Pallas attention backward (PRAM_ATTN_BWD).

    Default ON since the r5 chip validation: on-chip gradient parity with
    trained weights at 0.9% max relative deviation (bf16 tolerance,
    scripts/exp_bwd_parity_chip.py) and train step 11.375 -> 16.276
    steps/s (+43%, scripts/bench_train.py A/B). PRAM_ATTN_BWD=0 restores
    the autodiff-XLA backward; parity vs it is pinned in
    tests/test_train_vjp.py."""
    import os

    return os.environ.get("PRAM_ATTN_BWD", "1") == "1"


def _self_attn_bwd(scale, heads, splits, rotary, res, g):
    x, wp, bp, cos, sin, bias = res
    use_kernel = False
    if attn_bwd_kernel_enabled():
        from pram_tpu.ops import attention_bwd_pallas as abp

        d = wp.shape[-1] // 3
        use_kernel = (
            jax.default_backend() == "tpu" or abp._INTERPRET
        ) and abp.attention_bwd_supported(
            x.shape[1], d, x.dtype.itemsize, max(splits)
        )
    if use_kernel:
        from pram_tpu.ops.attention_bwd_pallas import (
            fused_self_attention_bwd,
        )

        qkv = (
            jnp.einsum(
                "bnd,df->bnf", x, wp.astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            + bp.astype(jnp.float32)
        ).astype(x.dtype)
        dqkv, dcos, dsin, dbias = fused_self_attention_bwd(
            qkv, cos if rotary else None, sin if rotary else None,
            bias, g.astype(x.dtype), scale, heads, splits, rotary=rotary,
        )
        dx = jnp.einsum(
            "bnf,df->bnd", dqkv, wp.astype(dqkv.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        dwp = jnp.einsum(
            "bnd,bnf->df", x, dqkv, preferred_element_type=jnp.float32
        ).astype(wp.dtype)
        dbp = jnp.sum(
            dqkv.astype(jnp.float32), axis=(0, 1)
        ).astype(bp.dtype)
        if not rotary:
            dcos = jnp.zeros_like(cos)
            dsin = jnp.zeros_like(sin)
        return (
            dx, dwp, dbp,
            dcos.astype(cos.dtype), dsin.astype(sin.dtype),
            dbias.astype(bias.dtype),
        )
    _, vjp_fn = jax.vjp(
        lambda x_, wp_, bp_, cos_, sin_, bias_: self_attention_proj_ref(
            x_, wp_, bp_, cos_, sin_, bias_,
            scale=scale, heads=heads, splits=splits, rotary=rotary,
        ),
        x, wp, bp, cos, sin, bias,
    )
    return vjp_fn(g.astype(x.dtype))


self_attention_proj.defvjp(_self_attn_fwd, _self_attn_bwd)


# ---------------------------------------------------------------------------
# symmetric cross-attention with in-kernel projections (GML/AdaGML layers)
# ---------------------------------------------------------------------------


def cross_attention_proj_ref(
    cat, wqk, bqk, wv, bv, bias0, bias1, *, scale, heads, n0
):
    """XLA math of ops/attention_pallas._cross_proj_kernel.

    ``cat`` ``[B, N0+N1, D]`` token concatenation; shared to_qk/to_v
    projections (columns are head-major, no permutation — single
    matrices reshape directly); symmetric similarity softmaxed along
    each axis for the two directions; ``bias0/bias1`` additive f32 key
    masks. Returns messages for the concatenation ``[B, N0+N1, d]``.
    """
    b, n, _ = cat.shape
    d = wqk.shape[-1]
    hd = d // heads
    n1 = n - n0
    qk = (
        jnp.einsum(
            "bnd,df->bnf", cat, wqk.astype(cat.dtype),
            preferred_element_type=jnp.float32,
        )
        + bqk.astype(jnp.float32)
    ).astype(cat.dtype)
    v = (
        jnp.einsum(
            "bnd,df->bnf", cat, wv.astype(cat.dtype),
            preferred_element_type=jnp.float32,
        )
        + bv.astype(jnp.float32)
    ).astype(cat.dtype)
    qk0 = qk[:, :n0].reshape(b, n0, heads, hd)
    qk1 = qk[:, n0:].reshape(b, n1, heads, hd)
    v0 = v[:, :n0].reshape(b, n0, heads, hd)
    v1 = v[:, n0:].reshape(b, n1, heads, hd)
    sim = (
        jnp.einsum(
            "bnhd,bmhd->bhnm", qk0, qk1,
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    l01 = sim + bias1[:, None, None, :].astype(jnp.float32)
    l01 -= jnp.max(l01, axis=-1, keepdims=True)
    e01 = jnp.exp(l01)
    a01 = (e01 / jnp.sum(e01, axis=-1, keepdims=True)).astype(v1.dtype)
    l10 = sim + bias0[:, None, :, None].astype(jnp.float32)
    l10 -= jnp.max(l10, axis=-2, keepdims=True)
    e10 = jnp.exp(l10)
    a10 = (e10 / jnp.sum(e10, axis=-2, keepdims=True)).astype(v0.dtype)
    m0 = jnp.einsum(
        "bhnm,bmhd->bnhd", a01, v1, preferred_element_type=jnp.float32
    ).astype(cat.dtype).reshape(b, n0, d)
    m1 = jnp.einsum(
        "bhnm,bnhd->bmhd", a10, v0, preferred_element_type=jnp.float32
    ).astype(cat.dtype).reshape(b, n1, d)
    return jnp.concatenate([m0, m1], axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def cross_attention_proj(
    cat, wqk, bqk, wv, bv, bias0, bias1,
    scale: float, heads: int, n0: int,
):
    """Kernel forward / recompute-XLA backward symmetric cross attention.

    Same contract as self_attention_proj: call only when the fused cross
    gate passes; off-TPU primal traces run the XLA reference.
    """
    if jax.default_backend() == "tpu":
        from pram_tpu.ops.attention_pallas import (
            fused_cross_attention_proj,
        )

        return fused_cross_attention_proj(
            cat, wqk, bqk, wv, bv, bias0, bias1, scale, heads, n0
        ).astype(cat.dtype)
    return cross_attention_proj_ref(
        cat, wqk, bqk, wv, bv, bias0, bias1,
        scale=scale, heads=heads, n0=n0,
    )


def _cross_attn_fwd(cat, wqk, bqk, wv, bv, bias0, bias1, scale, heads, n0):
    out = cross_attention_proj(
        cat, wqk, bqk, wv, bv, bias0, bias1, scale, heads, n0
    )
    return out, (cat, wqk, bqk, wv, bv, bias0, bias1)


def _cross_attn_bwd(scale, heads, n0, res, g):
    cat, wqk, bqk, wv, bv, bias0, bias1 = res
    use_kernel = False
    if attn_bwd_kernel_enabled():
        from pram_tpu.ops import attention_bwd_pallas as abp

        d = wqk.shape[-1]
        use_kernel = (
            jax.default_backend() == "tpu" or abp._INTERPRET
        ) and abp.cross_attention_bwd_supported(
            n0, cat.shape[1] - n0, d, cat.dtype.itemsize
        )
    if use_kernel:
        from pram_tpu.ops.attention_bwd_pallas import (
            fused_cross_attention_bwd,
        )

        qk = (
            jnp.einsum(
                "bnd,df->bnf", cat, wqk.astype(cat.dtype),
                preferred_element_type=jnp.float32,
            )
            + bqk.astype(jnp.float32)
        ).astype(cat.dtype)
        v = (
            jnp.einsum(
                "bnd,df->bnf", cat, wv.astype(cat.dtype),
                preferred_element_type=jnp.float32,
            )
            + bv.astype(jnp.float32)
        ).astype(cat.dtype)
        dqk, dv, db0, db1 = fused_cross_attention_bwd(
            qk, v, bias0, bias1, g.astype(cat.dtype), scale, heads, n0
        )
        dcat = (
            jnp.einsum(
                "bnf,df->bnd", dqk, wqk.astype(dqk.dtype),
                preferred_element_type=jnp.float32,
            )
            + jnp.einsum(
                "bnf,df->bnd", dv, wv.astype(dv.dtype),
                preferred_element_type=jnp.float32,
            )
        ).astype(cat.dtype)
        dwqk = jnp.einsum(
            "bnd,bnf->df", cat, dqk, preferred_element_type=jnp.float32
        ).astype(wqk.dtype)
        dbqk = jnp.sum(
            dqk.astype(jnp.float32), axis=(0, 1)
        ).astype(bqk.dtype)
        dwv = jnp.einsum(
            "bnd,bnf->df", cat, dv, preferred_element_type=jnp.float32
        ).astype(wv.dtype)
        dbv = jnp.sum(
            dv.astype(jnp.float32), axis=(0, 1)
        ).astype(bv.dtype)
        return (
            dcat, dwqk, dbqk, dwv, dbv,
            db0.astype(bias0.dtype), db1.astype(bias1.dtype),
        )
    _, vjp_fn = jax.vjp(
        lambda *a: cross_attention_proj_ref(
            *a, scale=scale, heads=heads, n0=n0
        ),
        *res,
    )
    return vjp_fn(g.astype(cat.dtype))


cross_attention_proj.defvjp(_cross_attn_fwd, _cross_attn_bwd)


# ---------------------------------------------------------------------------
# residual concat-MLP tail
# ---------------------------------------------------------------------------


def residual_mlp_ref(x, msg, wp, bp, w0, b0, g, be, w3, b3, *, eps=1e-6):
    """XLA math of ops/mlp_pallas._mlp_kernel (exact erf gelu)."""
    d = x.shape[-1]
    pm = (
        jnp.einsum(
            "bnd,df->bnf", msg, wp.astype(msg.dtype),
            preferred_element_type=jnp.float32,
        )
        + bp.astype(jnp.float32)
    ).astype(x.dtype)
    w0x, w0m = w0[:d], w0[d:]
    h = (
        jnp.einsum(
            "bnd,df->bnf", x, w0x.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        + jnp.einsum(
            "bnd,df->bnf", pm, w0m.astype(pm.dtype),
            preferred_element_type=jnp.float32,
        )
        + b0.astype(jnp.float32)
    )
    mu = jnp.mean(h, axis=-1, keepdims=True)
    hc = h - mu
    var = jnp.mean(hc * hc, axis=-1, keepdims=True)
    hn = hc * jax.lax.rsqrt(var + eps)
    hn = hn * g.astype(jnp.float32) + be.astype(jnp.float32)
    y = (hn * 0.5 * (1.0 + jax.lax.erf(hn / jnp.sqrt(2.0)))).astype(x.dtype)
    out = (
        jnp.einsum(
            "bnf,fd->bnd", y, w3.astype(y.dtype),
            preferred_element_type=jnp.float32,
        )
        + b3.astype(jnp.float32)
    ).astype(x.dtype)
    return x + out


@jax.custom_vjp
def residual_mlp(x, msg, wp, bp, w0, b0, g, be, w3, b3):
    """Kernel forward / recompute-XLA backward residual MLP tail."""
    if jax.default_backend() == "tpu":
        from pram_tpu.ops.mlp_pallas import fused_residual_mlp

        return fused_residual_mlp(x, msg, wp, bp, w0, b0, g, be, w3, b3)
    return residual_mlp_ref(x, msg, wp, bp, w0, b0, g, be, w3, b3)


def _mlp_fwd(x, msg, wp, bp, w0, b0, g, be, w3, b3):
    out = residual_mlp(x, msg, wp, bp, w0, b0, g, be, w3, b3)
    return out, (x, msg, wp, bp, w0, b0, g, be, w3, b3)


def mlp_bwd_kernel_enabled() -> bool:
    """Trace-time flag for the Pallas residual-MLP backward (PRAM_MLP_BWD).

    Default ON since the r5 chip validation: on-chip gradient parity with
    trained weights at 0.9% max relative deviation and train step +5.8%
    alone / 17.263 steps/s (+51.8%) combined with the attention backward
    (scripts/bench_train.py A/B). PRAM_MLP_BWD=0 restores the
    autodiff-XLA backward; parity vs it is pinned in
    tests/test_train_vjp.py."""
    import os

    return os.environ.get("PRAM_MLP_BWD", "1") == "1"


def _mlp_bwd(res, ct):
    x, msg, wp, bp, w0, b0, g, be, w3, b3 = res
    use_kernel = False
    if mlp_bwd_kernel_enabled():
        from pram_tpu.ops import mlp_bwd_pallas as mbp

        use_kernel = (
            jax.default_backend() == "tpu" or mbp._INTERPRET
        ) and mbp.mlp_bwd_supported(
            x.shape[1], x.shape[-1], w0.shape[-1], x.dtype.itemsize
        )
    if use_kernel:
        from pram_tpu.ops.mlp_bwd_pallas import fused_residual_mlp_bwd

        d = x.shape[-1]
        ctc = ct.astype(x.dtype)
        # msg projection recomputed in XLA (roofline matmul), exactly like
        # the qkv projection around the attention backward kernel
        pm = (
            jnp.einsum(
                "bnd,df->bnf", msg, wp.astype(msg.dtype),
                preferred_element_type=jnp.float32,
            )
            + bp.astype(jnp.float32)
        ).astype(x.dtype)
        dx, dpm, dw0x, dw0m, db0, dg, dbe, dw3, db3 = (
            fused_residual_mlp_bwd(x, pm, w0, b0, g, be, w3, ctc)
        )
        dmsg = jnp.einsum(
            "bnf,df->bnd", dpm, wp.astype(dpm.dtype),
            preferred_element_type=jnp.float32,
        ).astype(msg.dtype)
        dwp = jnp.einsum(
            "bnd,bnf->df", msg, dpm, preferred_element_type=jnp.float32
        ).astype(wp.dtype)
        dbp = jnp.sum(dpm.astype(jnp.float32), axis=(0, 1)).astype(bp.dtype)
        dw0 = jnp.concatenate([dw0x, dw0m], axis=0).astype(w0.dtype)
        return (
            dx, dmsg, dwp, dbp, dw0, db0.astype(b0.dtype),
            dg.astype(g.dtype), dbe.astype(be.dtype),
            dw3.astype(w3.dtype), db3.astype(b3.dtype),
        )
    _, vjp_fn = jax.vjp(residual_mlp_ref, *res)
    return vjp_fn(ct.astype(x.dtype))


residual_mlp.defvjp(_mlp_fwd, _mlp_bwd)
