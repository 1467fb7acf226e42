"""Custom-VJP fused-op wrappers: gradient parity vs XLA autodiff.

The wrappers (ops/train_vjp.py) use a hand-wired recompute backward (vjp of
the XLA reference at saved inputs). These tests pin that the wrapper's
gradients equal plain autodiff of the same math — any arg-order or
residual-saving bug in the wiring shows up as a mismatch. The kernel-vs-ref
FORWARD parity is covered by tests/test_attention_pallas.py; on-TPU the
wrapper forward is exactly that kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.ops.train_vjp import (
    residual_mlp,
    residual_mlp_ref,
    self_attention_proj,
    self_attention_proj_ref,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize("rotary", [True, False])
@pytest.mark.parametrize("splits", [(16,), (8, 8)])
def test_self_attention_vjp_matches_autodiff(rng, rotary, splits):
    b, n, heads, hd = 2, 16, 4, 8
    d = heads * hd
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    wp = jnp.asarray(rng.randn(d, 3 * d).astype(np.float32) * 0.1)
    bp = jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.1)
    cos = jnp.asarray(rng.rand(b, n, hd).astype(np.float32))
    sin = jnp.asarray(rng.rand(b, n, hd).astype(np.float32))
    bias = jnp.asarray(
        np.where(rng.rand(b, n) < 0.2, -1e9, 0.0).astype(np.float32)
    )
    scale = hd**-0.5
    ct = jnp.asarray(rng.randn(b, n, d).astype(np.float32))

    def via_wrapper(x, wp, bp, cos, sin, bias):
        out = self_attention_proj(
            x, wp, bp, cos, sin, bias, scale, heads, splits, rotary
        )
        return jnp.sum(out * ct)

    def via_ref(x, wp, bp, cos, sin, bias):
        out = self_attention_proj_ref(
            x, wp, bp, cos, sin, bias,
            scale=scale, heads=heads, splits=splits, rotary=rotary,
        )
        return jnp.sum(out * ct)

    gw = jax.grad(via_wrapper, argnums=(0, 1, 2, 3, 4))(
        x, wp, bp, cos, sin, bias
    )
    gr = jax.grad(via_ref, argnums=(0, 1, 2, 3, 4))(
        x, wp, bp, cos, sin, bias
    )
    for a, b_ in zip(gw, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5
        )
    if not rotary:
        # unused rotary tables must carry exactly zero gradient
        assert float(jnp.abs(gw[3]).max()) == 0.0
        assert float(jnp.abs(gw[4]).max()) == 0.0


def test_residual_mlp_vjp_matches_autodiff(rng):
    b, n, d = 2, 16, 32
    dh = 2 * d
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    msg = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    wp = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bp = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    w0 = jnp.asarray(rng.randn(2 * d, dh).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rng.randn(dh).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.rand(dh).astype(np.float32) + 0.5)
    be = jnp.asarray(rng.randn(dh).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.randn(dh, d).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    args = (x, msg, wp, bp, w0, b0, g, be, w3, b3)

    gw = jax.grad(
        lambda *a: jnp.sum(residual_mlp(*a) * ct), argnums=tuple(range(10))
    )(*args)
    gr = jax.grad(
        lambda *a: jnp.sum(residual_mlp_ref(*a) * ct),
        argnums=tuple(range(10)),
    )(*args)
    for a, b_ in zip(gw, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5
        )


def test_self_attention_ref_matches_block_xla(rng):
    """The VJP reference math must equal the SelfAttentionBlock XLA path
    (same permuted-projection semantics) — otherwise the recompute backward
    would silently differentiate different math than the kernel computes."""
    from flax.core import freeze

    from pram_tpu.models.common import SelfAttentionBlock, mask_to_bias
    from pram_tpu.ops.attention_pallas import permute_qkv_kernel

    b, n, heads, hd = 2, 12, 4, 8
    d = heads * hd
    blk = SelfAttentionBlock(feat_dim=d, hidden_dim=d, num_heads=heads)
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    cos = jnp.asarray(rng.rand(b, 1, n, hd).astype(np.float32))
    sin = jnp.asarray(rng.rand(b, 1, n, hd).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.2)
    variables = blk.init(jax.random.PRNGKey(0), x, (cos, sin), mask)
    out_xla = blk.apply(variables, x, (cos, sin), mask)

    p = variables["params"]
    wp, bp = permute_qkv_kernel(
        p["qkv"]["kernel"], p["qkv"]["bias"], heads, hd
    )
    msg = self_attention_proj_ref(
        x, wp, bp, cos[:, 0], sin[:, 0], mask_to_bias(mask, b, n),
        scale=hd**-0.5, heads=heads, splits=(n,), rotary=True,
    )
    from pram_tpu.ops.train_vjp import residual_mlp_ref

    out_ref = residual_mlp_ref(
        x, msg,
        p["proj"]["kernel"], p["proj"]["bias"],
        p["mlp_0"]["kernel"], p["mlp_0"]["bias"],
        p["mlp_ln"]["scale"], p["mlp_ln"]["bias"],
        p["mlp_3"]["kernel"], p["mlp_3"]["bias"],
    )
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_xla), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("rotary", [True, False])
@pytest.mark.parametrize("splits", [(64,), (32, 32)])
def test_attention_bwd_kernel_matches_autodiff(
    rng, rotary, splits, monkeypatch
):
    """PRAM_ATTN_BWD=1 routes the backward through the Pallas kernel
    (interpret-forced on CPU); every cotangent — x, weights, bias of the
    projection, rotary tables, key bias — must match autodiff of the XLA
    reference."""
    from pram_tpu.ops import attention_bwd_pallas as abp

    monkeypatch.setenv("PRAM_ATTN_BWD", "1")
    monkeypatch.setattr(abp, "_INTERPRET", True)

    b, n, heads, hd = 2, 64, 4, 32
    d = heads * hd
    assert abp.attention_bwd_supported(n, d, 4, max(splits))
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    wp = jnp.asarray(rng.randn(d, 3 * d).astype(np.float32) * 0.1)
    bp = jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.1)
    cos = jnp.asarray(rng.rand(b, n, hd).astype(np.float32))
    sin = jnp.asarray(rng.rand(b, n, hd).astype(np.float32))
    bias = jnp.asarray(
        np.where(rng.rand(b, n) < 0.2, -1e9, 0.0).astype(np.float32)
    )
    scale = hd**-0.5
    ct = jnp.asarray(rng.randn(b, n, d).astype(np.float32))

    def via_wrapper(*args):
        out = self_attention_proj(*args, scale, heads, splits, rotary)
        return jnp.sum(out * ct)

    def via_ref(*args):
        out = self_attention_proj_ref(
            *args, scale=scale, heads=heads, splits=splits, rotary=rotary
        )
        return jnp.sum(out * ct)

    gw = jax.grad(via_wrapper, argnums=tuple(range(6)))(
        x, wp, bp, cos, sin, bias
    )
    gr = jax.grad(via_ref, argnums=tuple(range(6)))(
        x, wp, bp, cos, sin, bias
    )
    names = ["x", "wp", "bp", "cos", "sin", "bias"]
    for name, a, bgrad in zip(names, gw, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bgrad), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_cross_attention_ref_matches_kernel_interpret(rng):
    """cross_attention_proj_ref mirrors the fused kernel's math exactly
    (interpret mode)."""
    from pram_tpu.ops.attention_pallas import fused_cross_attention_proj
    from pram_tpu.ops.train_vjp import cross_attention_proj_ref

    b, n0, n1, heads, hd = 2, 24, 16, 4, 32
    d = heads * hd
    cat = jnp.asarray(rng.randn(b, n0 + n1, d).astype(np.float32))
    wqk = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bqk = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    wv = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bv = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    bias0 = jnp.asarray(
        np.where(rng.rand(b, n0) < 0.2, -1e9, 0.0).astype(np.float32)
    )
    bias1 = jnp.asarray(
        np.where(rng.rand(b, n1) < 0.2, -1e9, 0.0).astype(np.float32)
    )
    scale = hd**-0.5

    ref = cross_attention_proj_ref(
        cat, wqk, bqk, wv, bv, bias0, bias1,
        scale=scale, heads=heads, n0=n0,
    )
    got = fused_cross_attention_proj(
        cat, wqk, bqk, wv, bv, bias0, bias1, scale, heads, n0,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_cross_attention_vjp_matches_autodiff(rng):
    """The custom-VJP wrapper's gradients equal plain autodiff of the
    reference for every differentiable input."""
    from pram_tpu.ops.train_vjp import (
        cross_attention_proj,
        cross_attention_proj_ref,
    )

    b, n0, n1, heads, hd = 2, 16, 12, 2, 16
    d = heads * hd
    cat = jnp.asarray(rng.randn(b, n0 + n1, d).astype(np.float32))
    wqk = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bqk = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    wv = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bv = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    bias0 = jnp.zeros((b, n0), jnp.float32)
    bias1 = jnp.asarray(
        np.where(rng.rand(b, n1) < 0.2, -1e9, 0.0).astype(np.float32)
    )
    scale = hd**-0.5
    ct = jnp.asarray(rng.randn(b, n0 + n1, d).astype(np.float32))

    def via_wrapper(*args):
        return jnp.sum(
            cross_attention_proj(*args, scale, heads, n0) * ct
        )

    def via_ref(*args):
        return jnp.sum(
            cross_attention_proj_ref(
                *args, scale=scale, heads=heads, n0=n0
            )
            * ct
        )

    gw = jax.grad(via_wrapper, argnums=tuple(range(7)))(
        cat, wqk, bqk, wv, bv, bias0, bias1
    )
    gr = jax.grad(via_ref, argnums=tuple(range(7)))(
        cat, wqk, bqk, wv, bv, bias0, bias1
    )
    for name, a, bg in zip(
        ["cat", "wqk", "bqk", "wv", "bv", "bias0", "bias1"], gw, gr
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bg), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_cross_attention_bwd_kernel_matches_autodiff(rng, monkeypatch):
    """PRAM_ATTN_BWD=1 routes the cross backward through the Pallas
    kernel (interpret-forced on CPU); all 7 cotangents must match
    autodiff of the XLA reference — including the combined query+key
    gradient of the SHARED qk projection."""
    from pram_tpu.ops import attention_bwd_pallas as abp
    from pram_tpu.ops.train_vjp import (
        cross_attention_proj,
        cross_attention_proj_ref,
    )

    monkeypatch.setenv("PRAM_ATTN_BWD", "1")
    monkeypatch.setattr(abp, "_INTERPRET", True)

    b, n0, n1, heads, hd = 2, 40, 24, 4, 32
    d = heads * hd
    assert abp.cross_attention_bwd_supported(n0, n1, d, 4)
    cat = jnp.asarray(rng.randn(b, n0 + n1, d).astype(np.float32))
    wqk = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bqk = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    wv = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bv = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    bias0 = jnp.asarray(
        np.where(rng.rand(b, n0) < 0.2, -1e9, 0.0).astype(np.float32)
    )
    bias1 = jnp.asarray(
        np.where(rng.rand(b, n1) < 0.2, -1e9, 0.0).astype(np.float32)
    )
    scale = hd**-0.5
    ct = jnp.asarray(rng.randn(b, n0 + n1, d).astype(np.float32))

    def via_wrapper(*args):
        return jnp.sum(
            cross_attention_proj(*args, scale, heads, n0) * ct
        )

    def via_ref(*args):
        return jnp.sum(
            cross_attention_proj_ref(
                *args, scale=scale, heads=heads, n0=n0
            )
            * ct
        )

    gw = jax.grad(via_wrapper, argnums=tuple(range(7)))(
        cat, wqk, bqk, wv, bv, bias0, bias1
    )
    gr = jax.grad(via_ref, argnums=tuple(range(7)))(
        cat, wqk, bqk, wv, bv, bias0, bias1
    )
    for name, a, bg in zip(
        ["cat", "wqk", "bqk", "wv", "bv", "bias0", "bias1"], gw, gr
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bg), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_attention_bwd_kernel_bf16(rng, monkeypatch):
    """The backward kernel in bf16 (the on-chip training dtype) stays
    within mixed-precision tolerance of f32 autodiff."""
    from pram_tpu.ops import attention_bwd_pallas as abp

    monkeypatch.setenv("PRAM_ATTN_BWD", "1")
    monkeypatch.setattr(abp, "_INTERPRET", True)

    b, n, heads, hd = 2, 64, 4, 32
    d = heads * hd
    splits = (n,)
    x32 = rng.randn(b, n, d).astype(np.float32)
    wp32 = rng.randn(d, 3 * d).astype(np.float32) * 0.1
    bp32 = rng.randn(3 * d).astype(np.float32) * 0.1
    cos32 = rng.rand(b, n, hd).astype(np.float32)
    sin32 = rng.rand(b, n, hd).astype(np.float32)
    bias = jnp.zeros((b, n), jnp.float32)
    scale = hd**-0.5
    ct32 = rng.randn(b, n, d).astype(np.float32)

    def loss(xx, ww, dtype):
        out = self_attention_proj(
            jnp.asarray(xx, dtype), jnp.asarray(ww, dtype),
            jnp.asarray(bp32, dtype), jnp.asarray(cos32, dtype),
            jnp.asarray(sin32, dtype), bias, scale, heads, splits, True,
        )
        return jnp.sum(out.astype(jnp.float32) * ct32)

    gx_bf, gw_bf = jax.grad(
        lambda xx, ww: loss(xx, ww, jnp.bfloat16), argnums=(0, 1)
    )(x32, wp32)
    monkeypatch.setenv("PRAM_ATTN_BWD", "0")
    gx_f, gw_f = jax.grad(
        lambda xx, ww: loss(xx, ww, jnp.float32), argnums=(0, 1)
    )(x32, wp32)
    # bf16 operands: expect ~1e-2 relative agreement, not exactness
    denom = np.abs(np.asarray(gx_f)).max() + 1e-6
    assert np.abs(np.asarray(gx_bf) - np.asarray(gx_f)).max() / denom < 3e-2
    denom = np.abs(np.asarray(gw_f)).max() + 1e-6
    assert np.abs(np.asarray(gw_bf) - np.asarray(gw_f)).max() / denom < 3e-2


def test_mlp_bwd_kernel_matches_autodiff(rng, monkeypatch):
    """PRAM_MLP_BWD=1 routes the residual-MLP backward through the Pallas
    kernel (interpret-forced on CPU); all 10 cotangents — x, msg, both
    projection weight/bias pairs, LN scale/bias, mlp_3 weight/bias — must
    match autodiff of the XLA reference."""
    from pram_tpu.ops import mlp_bwd_pallas as mbp

    monkeypatch.setenv("PRAM_MLP_BWD", "1")
    monkeypatch.setattr(mbp, "_INTERPRET", True)

    b, n, d = 2, 64, 128
    dh = 2 * d
    assert mbp.mlp_bwd_supported(n, d, dh, 4)
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    msg = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    wp = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bp = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    w0 = jnp.asarray(rng.randn(2 * d, dh).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rng.randn(dh).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.rand(dh).astype(np.float32) + 0.5)
    be = jnp.asarray(rng.randn(dh).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.randn(dh, d).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    args = (x, msg, wp, bp, w0, b0, g, be, w3, b3)

    gw = jax.grad(
        lambda *a: jnp.sum(residual_mlp(*a) * ct), argnums=tuple(range(10))
    )(*args)
    monkeypatch.setenv("PRAM_MLP_BWD", "0")
    gr = jax.grad(
        lambda *a: jnp.sum(residual_mlp_ref(*a) * ct),
        argnums=tuple(range(10)),
    )(*args)
    names = ["x", "msg", "wp", "bp", "w0", "b0", "g", "be", "w3", "b3"]
    for name, a, bg in zip(names, gw, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bg), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_mlp_bwd_kernel_tiled_matches_autodiff(rng, monkeypatch):
    """Multi-tile grid (n > nt): the cross-tile weight-grad accumulation
    must still sum every (batch, tile) contribution exactly once."""
    from pram_tpu.ops import mlp_bwd_pallas as mbp

    monkeypatch.setenv("PRAM_MLP_BWD", "1")
    monkeypatch.setattr(mbp, "_INTERPRET", True)
    # force a 2-tile grid at a small n by shrinking the tile picker
    monkeypatch.setattr(
        mbp, "_pick_nt", lambda n, d, dh, itemsize: n // 2
    )

    b, n, d = 2, 64, 128
    dh = 2 * d
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    msg = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    wp = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.1)
    bp = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    w0 = jnp.asarray(rng.randn(2 * d, dh).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rng.randn(dh).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.rand(dh).astype(np.float32) + 0.5)
    be = jnp.asarray(rng.randn(dh).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.randn(dh, d).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    args = (x, msg, wp, bp, w0, b0, g, be, w3, b3)

    gw = jax.grad(
        lambda *a: jnp.sum(residual_mlp(*a) * ct), argnums=tuple(range(10))
    )(*args)
    monkeypatch.setenv("PRAM_MLP_BWD", "0")
    gr = jax.grad(
        lambda *a: jnp.sum(residual_mlp_ref(*a) * ct),
        argnums=tuple(range(10)),
    )(*args)
    for name, a, bg in zip(
        ["x", "msg", "wp", "bp", "w0", "b0", "g", "be", "w3", "b3"], gw, gr
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bg), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_mlp_bwd_kernel_bf16(rng, monkeypatch):
    """The MLP backward kernel in bf16 (the on-chip training dtype) stays
    within mixed-precision tolerance of f32 autodiff."""
    from pram_tpu.ops import mlp_bwd_pallas as mbp

    monkeypatch.setenv("PRAM_MLP_BWD", "1")
    monkeypatch.setattr(mbp, "_INTERPRET", True)

    b, n, d = 2, 64, 128
    dh = 2 * d
    x32 = rng.randn(b, n, d).astype(np.float32)
    msg32 = rng.randn(b, n, d).astype(np.float32)
    wp32 = rng.randn(d, d).astype(np.float32) * 0.1
    bp32 = rng.randn(d).astype(np.float32) * 0.1
    w032 = rng.randn(2 * d, dh).astype(np.float32) * 0.1
    b032 = rng.randn(dh).astype(np.float32) * 0.1
    g32 = rng.rand(dh).astype(np.float32) + 0.5
    be32 = rng.randn(dh).astype(np.float32) * 0.1
    w332 = rng.randn(dh, d).astype(np.float32) * 0.1
    b332 = rng.randn(d).astype(np.float32) * 0.1
    ct32 = rng.randn(b, n, d).astype(np.float32)

    def loss(xx, ww, dtype):
        out = residual_mlp(
            jnp.asarray(xx, dtype), jnp.asarray(msg32, dtype),
            jnp.asarray(wp32, dtype), jnp.asarray(bp32, dtype),
            jnp.asarray(ww, dtype), jnp.asarray(b032, dtype),
            jnp.asarray(g32, dtype), jnp.asarray(be32, dtype),
            jnp.asarray(w332, dtype), jnp.asarray(b332, dtype),
        )
        return jnp.sum(out.astype(jnp.float32) * ct32)

    gx_bf, gw_bf = jax.grad(
        lambda xx, ww: loss(xx, ww, jnp.bfloat16), argnums=(0, 1)
    )(x32, w032)
    monkeypatch.setenv("PRAM_MLP_BWD", "0")
    gx_f, gw_f = jax.grad(
        lambda xx, ww: loss(xx, ww, jnp.float32), argnums=(0, 1)
    )(x32, w032)
    denom = np.abs(np.asarray(gx_f)).max() + 1e-6
    assert np.abs(np.asarray(gx_bf) - np.asarray(gx_f)).max() / denom < 3e-2
    denom = np.abs(np.asarray(gw_f)).max() + 1e-6
    assert np.abs(np.asarray(gw_bf) - np.asarray(gw_f)).max() / denom < 3e-2
