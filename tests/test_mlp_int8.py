"""Int8 residual-MLP kernel (ops/mlp_pallas.py:fused_residual_mlp_int8).

Two layers of evidence:
- element-wise parity of the interpret-mode kernel against an XLA
  re-implementation of the SAME quantized math (int8 dots accumulate
  exactly in s32, so the two must agree to f32 rounding);
- closeness of the int8 output to the float fused path on
  realistically-scaled inputs (the on-chip accuracy gate is the
  image-level recall guard; this bounds the quantization error itself).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.ops.mlp_pallas import (
    _quant_cols,
    fused_mlp_int8_supported,
    fused_residual_mlp,
    fused_residual_mlp_int8,
)


def _make(rng, b=2, n=128, d=256, dh=512, scale=1.0):
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32)) * scale
    m = jnp.asarray(rng.randn(b, n, d).astype(np.float32)) * scale
    wp = jnp.asarray(rng.randn(d, d).astype(np.float32)) * d**-0.5
    bp = jnp.asarray(rng.randn(d).astype(np.float32)) * 0.1
    w0 = jnp.asarray(rng.randn(2 * d, dh).astype(np.float32)) * (2 * d) ** -0.5
    b0 = jnp.asarray(rng.randn(dh).astype(np.float32)) * 0.1
    g = jnp.asarray(1.0 + 0.1 * rng.randn(dh).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(dh).astype(np.float32))
    w3 = jnp.asarray(rng.randn(dh, d).astype(np.float32)) * dh**-0.5
    b3 = jnp.asarray(rng.randn(d).astype(np.float32)) * 0.1
    return x, m, wp, bp, w0, b0, g, be, w3, b3


def _xla_int8_reference(x, m, wp, bp, w0, b0, g, be, w3, b3, eps=1e-6):
    """Same quantized math as the kernel, in plain jnp (including the
    kernel's erf approximation and reciprocal-multiply quantization, so
    quantization bins agree bit-for-bit)."""
    from pram_tpu.ops.mlp_pallas import _erf

    def qrows(a):
        af = a.astype(jnp.float32)
        rs = (
            jnp.maximum(jnp.max(jnp.abs(af), -1, keepdims=True), 1e-6)
            / 127.0
        )
        return jnp.round(af * (1.0 / rs)).astype(jnp.int8), rs

    def dq_dot(aq, ars, wq, ws):
        return (
            jax.lax.dot_general(
                aq, wq, (((aq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            * ars
            * ws
        )

    d = x.shape[-1]
    wpq, wps = _quant_cols(wp)
    w0q, w0s = _quant_cols(w0)
    w3q, w3s = _quant_cols(w3)
    mq, mrs = qrows(m)
    pm = (dq_dot(mq, mrs, wpq, wps) + bp).astype(x.dtype)
    xq, xrs = qrows(x)
    pmq, pmrs = qrows(pm)
    h = (
        dq_dot(xq, xrs, w0q[:d], 1.0) + dq_dot(pmq, pmrs, w0q[d:], 1.0)
    ) * w0s + b0
    mu = jnp.mean(h, -1, keepdims=True)
    hc = h - mu
    var = jnp.mean(hc * hc, -1, keepdims=True)
    hn = (hc * jax.lax.rsqrt(var + eps)) * g + be
    y = hn * 0.5 * (1.0 + _erf(hn * (1.0 / jnp.sqrt(2.0)).astype(hn.dtype)))
    yq, yrs = qrows(y)
    return x + (dq_dot(yq, yrs, w3q, w3s) + b3).astype(x.dtype)


def test_int8_kernel_matches_xla_int8_reference(rng):
    args = _make(rng)
    got = fused_residual_mlp_int8(*args, interpret=True)
    want = _xla_int8_reference(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("scale", [0.3, 1.0, 4.0])
def test_int8_close_to_float_path(rng, scale):
    args = _make(rng, scale=scale)
    f = np.asarray(
        fused_residual_mlp(*args, interpret=True), np.float64
    ).ravel()
    q = np.asarray(
        fused_residual_mlp_int8(*args, interpret=True), np.float64
    ).ravel()
    cos = float(np.dot(f, q) / (np.linalg.norm(f) * np.linalg.norm(q)))
    assert cos > 0.9995, cos
    rel = np.linalg.norm(f - q) / np.linalg.norm(f)
    assert rel < 0.02, rel


def test_int8_support_gate():
    assert fused_mlp_int8_supported(1536, 256, 512, 2)
    assert not fused_mlp_int8_supported(1536 + 8, 256, 512, 2)


def test_int8_flag_routes_self_attention_block(rng, monkeypatch):
    """PRAM_INT8_MLP=1 routes SelfAttentionBlock's MLP tail through the
    int8 kernel when the fused path is active; output stays close to the
    float path. (On CPU use_fused_attention() is False, so force the
    decision points directly via the kernels — this test exercises the
    flag plumbing only.)"""
    import pram_tpu.models.common as common

    monkeypatch.setenv("PRAM_INT8_MLP", "1")
    assert common.int8_mlp_enabled()
    monkeypatch.setenv("PRAM_INT8_MLP", "0")
    assert not common.int8_mlp_enabled()


def _interp_int8(monkeypatch):
    import pram_tpu.models.common as common
    import pram_tpu.ops.attention_pallas as ap
    import pram_tpu.ops.mlp_pallas as mp

    monkeypatch.setattr(common, "use_fused_attention", lambda *a: True)
    orig_sp = ap.fused_self_attention_proj
    monkeypatch.setattr(
        ap, "fused_self_attention_proj",
        lambda *a, **kw: orig_sp(*a, interpret=True, **kw),
    )
    orig_cp = ap.fused_cross_attention_proj
    monkeypatch.setattr(
        ap, "fused_cross_attention_proj",
        lambda *a, **kw: orig_cp(*a, interpret=True, **kw),
    )
    orig_mlp = mp.fused_residual_mlp_int8
    monkeypatch.setattr(
        mp, "fused_residual_mlp_int8",
        lambda *a, **kw: orig_mlp(*a, interpret=True, **kw),
    )


def test_int8_blocks_close_to_float(rng, monkeypatch):
    """PRAM_INT8_PROJ + PRAM_INT8_MLP route the Self/Cross blocks through
    the int8 kernels (via the common.py wiring) with bounded error vs the
    float XLA path."""
    import pram_tpu.models.common as common
    from pram_tpu.models.common import (
        CrossAttentionBlock,
        LearnableFourierPE,
        SelfAttentionBlock,
    )

    _interp_int8(monkeypatch)
    monkeypatch.setenv("PRAM_INT8_PROJ", "1")
    monkeypatch.setenv("PRAM_INT8_MLP", "1")

    b, n0, n1, d = 2, 32, 64, 32
    x0 = jnp.asarray(rng.randn(b, n0, d).astype(np.float32))
    x1 = jnp.asarray(rng.randn(b, n1, d).astype(np.float32))
    mask0 = jnp.asarray(rng.rand(b, n0) > 0.3)
    mask1 = jnp.asarray(rng.rand(b, n1) > 0.3)
    kxy0 = jnp.asarray(rng.rand(b, n0, 2).astype(np.float32))

    pe = LearnableFourierPE(f_dim=d // 4)
    enc0 = pe.apply(pe.init(jax.random.PRNGKey(2), kxy0), kxy0)

    def close(a, b_):
        a = np.asarray(a, np.float64).ravel()
        b_ = np.asarray(b_, np.float64).ravel()
        cos = float(np.dot(a, b_) / (np.linalg.norm(a) * np.linalg.norm(b_)))
        assert cos > 0.999, cos

    sa = SelfAttentionBlock(feat_dim=d, hidden_dim=d, num_heads=4)
    variables = sa.init(jax.random.PRNGKey(0), x0, enc0, mask0)
    got = sa.apply(variables, x0, enc0, mask0)
    monkeypatch.setattr(common, "use_fused_attention", lambda *a: False)
    ref = sa.apply(variables, x0, enc0, mask0)
    close(got, ref)

    monkeypatch.setattr(common, "use_fused_attention", lambda *a: True)
    ca = CrossAttentionBlock(feat_dim=d, hidden_dim=d, num_heads=4)
    cvars = ca.init(jax.random.PRNGKey(1), x0, x1, mask0, mask1)
    g0, g1 = ca.apply(cvars, x0, x1, mask0, mask1)
    monkeypatch.setattr(common, "use_fused_attention", lambda *a: False)
    r0, r1 = ca.apply(cvars, x0, x1, mask0, mask1)
    close(g0, r0)
    close(g1, r1)
