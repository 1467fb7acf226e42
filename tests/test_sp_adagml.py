"""Sequence-parallel AdaGML (parallel/tp.py:make_sp_adagml_fn).

VERDICT r4 #8 asked for SP over AdaGML's full-token *prefix* or an
impossibility argument; the masking formulation makes the FULL adaptive
stack shardable (pruning = mask update, never a shape change), so the
pin here covers the whole model: transport plan, stop_layer, AND the
final pruned masks must equal the replicated ``AdaGML.apply`` — i.e.
the distributed form makes byte-identical pruning decisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.models.adagml import AdaGML, AdaGMLConfig


@pytest.fixture
def rng():
    return np.random.RandomState(11)


def _problem(rng, b=2, n0=64, n1=48, dim=32):
    d0 = jnp.asarray(rng.randn(b, n0, dim).astype(np.float32))
    d1 = jnp.asarray(rng.randn(b, n1, dim).astype(np.float32))
    k0 = jnp.asarray((rng.rand(b, n0, 2) * 2 - 1).astype(np.float32))
    k1 = jnp.asarray((rng.rand(b, n1, 2) * 2 - 1).astype(np.float32))
    m0 = jnp.asarray(rng.rand(b, n0) > 0.1)
    m1 = jnp.asarray(rng.rand(b, n1) > 0.1)
    return d0, d1, k0, k1, m0, m1


@pytest.mark.parametrize("seq", [2, 4])
def test_sp_adagml_matches_replicated(rng, seq):
    from jax.sharding import Mesh

    from pram_tpu.parallel.tp import make_sp_adagml_fn

    devs = np.asarray(jax.devices()[: 2 * seq]).reshape(2, seq)
    mesh = Mesh(devs, axis_names=("data", "seq"))
    # n_min_tokens far below the token counts so pruning actually fires
    cfg = AdaGMLConfig(
        descriptor_dim=32, hidden_dim=64, num_heads=2, n_layers=3,
        sinkhorn_iterations=8, n_min_tokens=8,
    )
    model = AdaGML(cfg)
    d0, d1, k0, k1, m0, m1 = _problem(rng)
    variables = model.init(jax.random.PRNGKey(0), d0, d1, k0, k1, m0, m1)

    ref = jax.jit(lambda v: model.apply(v, d0, d1, k0, k1, m0, m1))(
        variables
    )

    fn = jax.jit(make_sp_adagml_fn(mesh, cfg))
    rows, dust, stop_layer, am0, am1 = fn(variables, d0, d1, k0, k1, m0, m1)
    plan = jnp.concatenate([rows, dust[:, None, :]], axis=1)

    # the adaptive decisions must be IDENTICAL, not merely close: pruned
    # masks and stop layers are thresholded bits, so any disagreement
    # means the distributed statistics diverged
    np.testing.assert_array_equal(
        np.asarray(stop_layer), np.asarray(ref["stop_layer"])
    )
    np.testing.assert_array_equal(np.asarray(am0), np.asarray(ref["mask0"]))
    np.testing.assert_array_equal(np.asarray(am1), np.asarray(ref["mask1"]))
    # the test must actually exercise pruning, not a no-op mask pass
    assert int(np.sum(np.asarray(m0) & ~np.asarray(am0))) > 0

    np.testing.assert_allclose(
        np.asarray(plan), np.asarray(ref["plan"]), rtol=5e-5, atol=5e-5
    )


def test_sp_adagml_collective_schedule(rng):
    """2 KV all-gathers per layer (self, cross) + 1 confidence gather
    per ADAPTIVE layer (layers 1..L-1 — layer 0 never prunes) + 1 for
    mdesc1; 1 fused 4-stat psum per adaptive layer + 1 for the Sinkhorn
    column marginals (inside the scan)."""
    from jax.sharding import Mesh

    from pram_tpu.parallel.tp import make_sp_adagml_fn

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, axis_names=("data", "seq"))
    cfg = AdaGMLConfig(
        descriptor_dim=32, hidden_dim=64, num_heads=2, n_layers=3,
        sinkhorn_iterations=8, n_min_tokens=8,
    )
    model = AdaGML(cfg)
    d0, d1, k0, k1, m0, m1 = _problem(rng)
    variables = model.init(jax.random.PRNGKey(0), d0, d1, k0, k1, m0, m1)

    fn = jax.jit(make_sp_adagml_fn(mesh, cfg))
    hlo = fn.lower(variables, d0, d1, k0, k1, m0, m1).compile().as_text()
    L = cfg.n_layers
    assert hlo.count(" all-gather(") == 2 * L + (L - 1) + 1
    assert hlo.count(" all-reduce(") == (L - 1) + 1
    assert hlo.count(" collective-permute(") == 0


def test_sp_adagml_requires_sinkhorn(rng):
    from jax.sharding import Mesh

    from pram_tpu.parallel.tp import make_sp_adagml_fn

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, axis_names=("data", "seq"))
    with pytest.raises(ValueError, match="sinkhorn"):
        make_sp_adagml_fn(mesh, AdaGMLConfig(with_sinkhorn=False))
