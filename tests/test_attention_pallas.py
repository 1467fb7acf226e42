"""Parity of the fused Pallas attention kernels vs the XLA einsum path.

The packed-qkv kernels (ops/attention_pallas.py) must be element-wise equal
to models/common.py's masked einsum attention, including padding masks,
rotary encoding, weight-column permutation, and the symmetric shared-QK
cross direction.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pram_tpu.models.common as common
from pram_tpu.models.common import (
    CrossAttentionBlock,
    LearnableFourierPE,
    SelfAttentionBlock,
    apply_rotary,
    mask_to_bias,
)
from pram_tpu.ops.attention_pallas import (
    fused_cross_attention_packed,
    fused_self_attention_qkv,
    permute_qkv_kernel,
)


def test_fused_self_attention_qkv_matches_einsum(rng):
    b, h, n, hd = 2, 4, 16, 8
    d = h * hd
    x = jnp.asarray(rng.randn(b, n, 24).astype(np.float32))
    kernel = jnp.asarray(rng.randn(24, 3 * d).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.1)
    mask = jnp.asarray(rng.rand(b, n) > 0.3)
    kxy = jnp.asarray(rng.rand(b, n, 2).astype(np.float32))
    scale = hd**-0.5

    pe = LearnableFourierPE(f_dim=hd)
    pvars = pe.init(jax.random.PRNGKey(0), kxy)
    cos, sin = pe.apply(pvars, kxy)  # [B, 1, N, hd]

    # reference: torch-layout slicing + rotary + masked einsum attention
    qkv = (x @ kernel + bias).reshape(b, n, h, hd, 3)
    qkv = jnp.moveaxis(qkv, 2, 1)
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
    q = apply_rotary((cos, sin), q)
    k = apply_rotary((cos, sin), k)
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    ref = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(logits, -1), v)
    ref = jnp.moveaxis(ref, 1, 2).reshape(b, n, d)

    wp, bp = permute_qkv_kernel(kernel, bias, h, hd)
    qkv_packed = x @ wp + bp
    got = fused_self_attention_qkv(
        qkv_packed, cos[:, 0], sin[:, 0], mask_to_bias(mask, b, n), scale, h,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # no-rotary variant
    logits = jnp.einsum("bhid,bhjd->bhij", qkv[..., 0], qkv[..., 1]) * scale
    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    ref2 = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(logits, -1), v)
    ref2 = jnp.moveaxis(ref2, 1, 2).reshape(b, n, d)
    got2 = fused_self_attention_qkv(
        qkv_packed, None, None, mask_to_bias(mask, b, n), scale, h,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)


def test_fused_cross_attention_packed_matches_einsum(rng):
    b, h, n, m, hd = 2, 4, 16, 24, 8
    d = h * hd
    qk0 = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    qk1 = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    v0 = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    mask0 = jnp.asarray(rng.rand(b, n) > 0.3)
    mask1 = jnp.asarray(rng.rand(b, m) > 0.3)
    scale = hd**-0.5

    def split(t, nn_):
        return jnp.moveaxis(t.reshape(b, nn_, h, hd), 2, 1)

    s0 = split(qk0, n) * scale**0.5
    s1 = split(qk1, m) * scale**0.5
    sim = jnp.einsum("bhid,bhjd->bhij", s0, s1)
    a01 = jax.nn.softmax(jnp.where(mask1[:, None, None, :], sim, -1e9), -1)
    a10 = jax.nn.softmax(jnp.where(mask0[:, None, :, None], sim, -1e9), -2)
    ref0 = jnp.einsum("bhij,bhjd->bhid", a01, split(v1, m))
    ref1 = jnp.einsum("bhij,bhid->bhjd", a10, split(v0, n))
    ref0 = jnp.moveaxis(ref0, 1, 2).reshape(b, n, d)
    ref1 = jnp.moveaxis(ref1, 1, 2).reshape(b, m, d)

    m0, m1 = fused_cross_attention_packed(
        qk0, qk1, v0, v1,
        mask_to_bias(mask0, b, n), mask_to_bias(mask1, b, m), scale, h,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(m0), np.asarray(ref0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(ref1),
                               rtol=1e-5, atol=1e-5)


def _interp(monkeypatch):
    import pram_tpu.ops.attention_pallas as ap
    import pram_tpu.ops.mlp_pallas as mp

    monkeypatch.setattr(common, "use_fused_attention", lambda *a: True)
    monkeypatch.setattr(
        ap, "fused_self_attention_qkv",
        lambda *a, **kw: fused_self_attention_qkv(*a, interpret=True, **kw),
    )
    monkeypatch.setattr(
        ap, "fused_cross_attention_packed",
        lambda *a, **kw: fused_cross_attention_packed(
            *a, interpret=True, **kw),
    )
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
    orig_mlp = mp.fused_residual_mlp
    monkeypatch.setattr(
        mp, "fused_residual_mlp",
        lambda *a, **kw: orig_mlp(*a, interpret=True, **kw),
    )


def test_attention_blocks_fused_path_matches(rng, monkeypatch):
    """Full Self/Cross blocks give identical outputs through both paths."""
    _interp(monkeypatch)

    b, n0, n1, d = 2, 16, 24, 32
    x0 = jnp.asarray(rng.randn(b, n0, d).astype(np.float32))
    x1 = jnp.asarray(rng.randn(b, n1, d).astype(np.float32))
    mask0 = jnp.asarray(rng.rand(b, n0) > 0.3)
    mask1 = jnp.asarray(rng.rand(b, n1) > 0.3)
    kxy0 = jnp.asarray(rng.rand(b, n0, 2).astype(np.float32))

    pe = LearnableFourierPE(f_dim=d // 4)
    pvars = pe.init(jax.random.PRNGKey(2), kxy0)
    enc0 = pe.apply(pvars, kxy0)

    sa = SelfAttentionBlock(feat_dim=d, hidden_dim=d, num_heads=4)
    variables = sa.init(jax.random.PRNGKey(0), x0, enc0, mask0)
    fused = sa.apply(variables, x0, enc0, mask0)
    monkeypatch.setattr(common, "use_fused_attention", lambda *a: False)
    ref = sa.apply(variables, x0, enc0, mask0)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    monkeypatch.setattr(common, "use_fused_attention", lambda *a: True)
    ca = CrossAttentionBlock(feat_dim=d, hidden_dim=d, num_heads=4)
    cvars = ca.init(jax.random.PRNGKey(1), x0, x1, mask0, mask1)
    f0, f1 = ca.apply(cvars, x0, x1, mask0, mask1)
    monkeypatch.setattr(common, "use_fused_attention", lambda *a: False)
    r0, r1 = ca.apply(cvars, x0, x1, mask0, mask1)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(r0),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(r1),
                               rtol=2e-5, atol=2e-5)


def _self_ref_with_stats(qkv_t, cos, sin, mask, scale):
    """XLA reference: messages + per-key attention mass from valid queries."""
    b, n = mask.shape
    q, k, v = qkv_t[..., 0], qkv_t[..., 1], qkv_t[..., 2]
    if cos is not None:
        q = apply_rotary((cos, sin), q)
        k = apply_rotary((cos, sin), k)
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, -1)  # [B, H, N, N]
    msg = jnp.einsum("bhij,bhjd->bhid", attn, v)
    d = q.shape[1] * q.shape[-1]
    msg = jnp.moveaxis(msg, 1, 2).reshape(b, n, d)
    qv = mask.astype(jnp.float32)
    stat = jnp.einsum("bhij,bi->bj", attn, qv)  # sum heads + valid queries
    return msg, stat


def test_tiled_self_attention_matches_single_tile(rng, monkeypatch):
    """The query-tiled kernel (N > _SINGLE_TILE_MAX) equals the einsum path,
    including rotary and the stats output accumulated across query blocks."""
    import pram_tpu.ops.attention_pallas as ap

    b, h, n, hd = 2, 2, 32, 8
    d = h * hd
    kernel = jnp.asarray(rng.randn(24, 3 * d).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(b, n, 24).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.3)
    kxy = jnp.asarray(rng.rand(b, n, 2).astype(np.float32))
    scale = hd**-0.5

    pe = LearnableFourierPE(f_dim=hd)
    pvars = pe.init(jax.random.PRNGKey(0), kxy)
    cos, sin = pe.apply(pvars, kxy)

    qkv_t = jnp.moveaxis((x @ kernel + bias).reshape(b, n, h, hd, 3), 2, 1)
    ref_msg, ref_stat = _self_ref_with_stats(qkv_t, cos, sin, mask, scale)

    wp, bp = permute_qkv_kernel(kernel, bias, h, hd)
    qkv_packed = x @ wp + bp
    key_bias = mask_to_bias(mask, b, n)

    # force the tiled kernel on this small problem (8-wide query blocks)
    monkeypatch.setattr(ap, "_SINGLE_TILE_MAX", 8)
    got, got_stat = fused_self_attention_qkv(
        qkv_packed, cos[:, 0], sin[:, 0], key_bias, scale, h,
        interpret=True, return_stats=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_msg),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_stat), np.asarray(ref_stat),
                               rtol=1e-5, atol=1e-5)

    # single-tile kernel with stats must agree too
    monkeypatch.setattr(ap, "_SINGLE_TILE_MAX", 1024)
    got2, got_stat2 = fused_self_attention_qkv(
        qkv_packed, cos[:, 0], sin[:, 0], key_bias, scale, h,
        interpret=True, return_stats=True,
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref_msg),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_stat2), np.asarray(ref_stat),
                               rtol=1e-5, atol=1e-5)


def test_tiled_cross_attention_matches(rng, monkeypatch):
    """Above the single-tile size the two query-tiled directional kernels
    reproduce the symmetric kernel, messages and stats."""
    import pram_tpu.ops.attention_pallas as ap

    b, h, n, m, hd = 2, 2, 32, 16, 8
    d = h * hd
    qk0 = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    qk1 = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    v0 = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    v1 = jnp.asarray(rng.randn(b, m, d).astype(np.float32))
    mask0 = jnp.asarray(rng.rand(b, n) > 0.3)
    mask1 = jnp.asarray(rng.rand(b, m) > 0.3)
    scale = hd**-0.5
    b0 = mask_to_bias(mask0, b, n)
    b1 = mask_to_bias(mask1, b, m)

    ref = fused_cross_attention_packed(
        qk0, qk1, v0, v1, b0, b1, scale, h, interpret=True,
        return_stats=True,
    )
    monkeypatch.setattr(ap, "_SINGLE_TILE_MAX", 8)
    got = fused_cross_attention_packed(
        qk0, qk1, v0, v1, b0, b1, scale, h, interpret=True,
        return_stats=True,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)

    # stats agree with the einsum formulation
    def split(t, nn_):
        return jnp.moveaxis(t.reshape(b, nn_, h, hd), 2, 1)

    sim = jnp.einsum(
        "bhid,bhjd->bhij", split(qk0, n) * scale**0.5,
        split(qk1, m) * scale**0.5,
    )
    a01 = jax.nn.softmax(jnp.where(mask1[:, None, None, :], sim, -1e9), -1)
    a10 = jax.nn.softmax(jnp.where(mask0[:, None, :, None], sim, -1e9), -2)
    stat0 = jnp.einsum("bhij,bj->bi", a10, mask1.astype(jnp.float32))
    stat1 = jnp.einsum("bhij,bi->bj", a01, mask0.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(stat0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[3]), np.asarray(stat1),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_size_gate():
    """ADVICE r2: the fused path must be gated off for over-VMEM token
    counts instead of failing to compile."""
    from pram_tpu.ops.attention_pallas import fused_attention_supported

    assert fused_attention_supported(512, 1024)
    assert fused_attention_supported(4096)
    assert fused_attention_supported(2048, 2048)
    assert not fused_attention_supported(8192)  # beyond MAX_FUSED_TOKENS
    assert not fused_attention_supported(1025 * 3)  # no 8-aligned block


def test_blocked_self_attention_matches(rng, monkeypatch):
    """Block-diagonal (GML splits) kernel == per-side kernels == XLA path."""
    import pram_tpu.ops.attention_pallas as ap

    _interp(monkeypatch)
    orig_blocked = ap.fused_self_attention_qkv_blocked
    monkeypatch.setattr(
        ap, "fused_self_attention_qkv_blocked",
        lambda *a, **kw: orig_blocked(*a, interpret=True, **kw),
    )

    b, n0, n1, d = 2, 16, 24, 32
    x = jnp.asarray(rng.randn(b, n0 + n1, d).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n0 + n1) > 0.3)
    kxy = jnp.asarray(rng.rand(b, n0 + n1, 2).astype(np.float32))

    pe = LearnableFourierPE(f_dim=d // 4)
    pvars = pe.init(jax.random.PRNGKey(2), kxy)
    enc = pe.apply(pvars, kxy)

    sa = SelfAttentionBlock(feat_dim=d, hidden_dim=d, num_heads=4)
    variables = sa.init(jax.random.PRNGKey(0), x, enc, mask)
    fused = sa.apply(variables, x, enc, mask, splits=(n0, n1))
    monkeypatch.setattr(common, "use_fused_attention", lambda *a: False)
    ref = sa.apply(variables, x, enc, mask, splits=(n0, n1))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
