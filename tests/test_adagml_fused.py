"""AdaGML fused Pallas path (attention + stats kernels) vs the XLA path.

VERDICT r2 #2b: AdaGML's pooling layers need per-key mean-attention stats,
which the fused kernels now emit — the whole module must produce identical
plans/masks through both paths (interpret mode stands in for the TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pram_tpu.models.common as common
from pram_tpu.models.adagml import AdaGML, AdaGMLConfig


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _interp(monkeypatch):
    import pram_tpu.ops.attention_pallas as ap
    import pram_tpu.ops.mlp_pallas as mp

    monkeypatch.setattr(common, "use_fused_attention", lambda *a: True)
    orig_self = ap.fused_self_attention_qkv
    orig_cross = ap.fused_cross_attention_packed
    monkeypatch.setattr(
        ap, "fused_self_attention_qkv",
        lambda *a, **kw: orig_self(*a, interpret=True, **kw),
    )
    monkeypatch.setattr(
        ap, "fused_cross_attention_packed",
        lambda *a, **kw: orig_cross(*a, interpret=True, **kw),
    )
    orig_mlp = mp.fused_residual_mlp
    monkeypatch.setattr(
        mp, "fused_residual_mlp",
        lambda *a, **kw: orig_mlp(*a, interpret=True, **kw),
    )


def test_adagml_fused_path_matches_xla(rng, monkeypatch):
    cfg = AdaGMLConfig(
        descriptor_dim=16, hidden_dim=32, num_heads=2, n_layers=3,
        n_min_tokens=8, sinkhorn_iterations=10,
    )
    model = AdaGML(cfg)
    b, n0, n1 = 2, 24, 16
    d0 = jnp.asarray(rng.randn(b, n0, 16).astype(np.float32))
    d1 = jnp.asarray(rng.randn(b, n1, 16).astype(np.float32))
    k0 = jnp.asarray(rng.rand(b, n0, 2).astype(np.float32))
    k1 = jnp.asarray(rng.rand(b, n1, 2).astype(np.float32))
    m0 = jnp.asarray(rng.rand(b, n0) > 0.2)
    m1 = jnp.asarray(rng.rand(b, n1) > 0.2)

    variables = model.init(jax.random.PRNGKey(0), d0, d1, k0, k1, m0, m1)
    ref = model.apply(variables, d0, d1, k0, k1, m0, m1)

    _interp(monkeypatch)
    fused = model.apply(variables, d0, d1, k0, k1, m0, m1)

    np.testing.assert_array_equal(
        np.asarray(fused["mask0"]), np.asarray(ref["mask0"])
    )
    np.testing.assert_array_equal(
        np.asarray(fused["mask1"]), np.asarray(ref["mask1"])
    )
    np.testing.assert_array_equal(
        np.asarray(fused["stop_layer"]), np.asarray(ref["stop_layer"])
    )
    np.testing.assert_allclose(
        np.asarray(fused["plan"]), np.asarray(ref["plan"]),
        rtol=5e-4, atol=5e-5,
    )


def test_adagml_fused_large_tokens_tiled(rng, monkeypatch):
    """The tiled kernels carry AdaGML above the single-tile size (the
    Aachen 4096-keypoint shape, scaled down via _SINGLE_TILE_MAX)."""
    import pram_tpu.ops.attention_pallas as ap

    cfg = AdaGMLConfig(
        descriptor_dim=16, hidden_dim=32, num_heads=2, n_layers=2,
        n_min_tokens=8, sinkhorn_iterations=5,
    )
    model = AdaGML(cfg)
    b, n0, n1 = 1, 32, 16
    d0 = jnp.asarray(rng.randn(b, n0, 16).astype(np.float32))
    d1 = jnp.asarray(rng.randn(b, n1, 16).astype(np.float32))
    k0 = jnp.asarray(rng.rand(b, n0, 2).astype(np.float32))
    k1 = jnp.asarray(rng.rand(b, n1, 2).astype(np.float32))
    m0 = jnp.asarray(rng.rand(b, n0) > 0.2)
    m1 = jnp.asarray(rng.rand(b, n1) > 0.2)

    variables = model.init(jax.random.PRNGKey(0), d0, d1, k0, k1, m0, m1)
    ref = model.apply(variables, d0, d1, k0, k1, m0, m1)

    _interp(monkeypatch)
    monkeypatch.setattr(ap, "_SINGLE_TILE_MAX", 8)  # force tiled kernels
    fused = model.apply(variables, d0, d1, k0, k1, m0, m1)

    np.testing.assert_array_equal(
        np.asarray(fused["mask0"]), np.asarray(ref["mask0"])
    )
    np.testing.assert_allclose(
        np.asarray(fused["plan"]), np.asarray(ref["plan"]),
        rtol=5e-4, atol=5e-5,
    )
