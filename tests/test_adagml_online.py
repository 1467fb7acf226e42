"""AdaGML online early-exit == batched masked formulation (single frame)."""

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.models.adagml import (
    AdaGML,
    AdaGMLConfig,
    adagml_online_apply,
    stack_adagml_layers,
)


def _inputs(rng, n0=24, n1=32, d=128):
    d0 = jnp.asarray(rng.randn(1, n0, d).astype(np.float32))
    d1 = jnp.asarray(rng.randn(1, n1, d).astype(np.float32))
    nk0 = jnp.asarray((rng.rand(1, n0, 2) * 2 - 1).astype(np.float32))
    nk1 = jnp.asarray((rng.rand(1, n1, 2) * 2 - 1).astype(np.float32))
    return d0, d1, nk0, nk1


def test_online_matches_batched_no_pruning(rng):
    cfg = AdaGMLConfig(n_layers=3, n_min_tokens=256, adaptive=True)
    model = AdaGML(cfg)
    d0, d1, nk0, nk1 = _inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), d0, d1, nk0, nk1)
    ref = model.apply(variables, d0, d1, nk0, nk1)
    stacked = stack_adagml_layers(variables, n_layers=cfg.n_layers)
    out = adagml_online_apply(stacked, d0, d1, nk0, nk1, cfg=cfg)
    # token counts are below n_min_tokens -> no pruning; same stop behavior
    assert int(out["stop_layer"]) == int(ref["stop_layer"][0])
    np.testing.assert_array_equal(
        np.asarray(out["mask0"]), np.asarray(ref["mask0"])
    )
    np.testing.assert_allclose(
        np.asarray(out["plan"]), np.asarray(ref["plan"]), atol=2e-5, rtol=1e-4
    )


def test_online_matches_batched_with_pruning(rng):
    """n_min_tokens low enough that pruning + early stop actually trigger."""
    cfg = AdaGMLConfig(n_layers=4, n_min_tokens=4, stop_ratio=0.01,
                       adaptive=True)
    model = AdaGML(cfg)
    d0, d1, nk0, nk1 = _inputs(rng, n0=16, n1=20)
    variables = model.init(jax.random.PRNGKey(1), d0, d1, nk0, nk1)
    ref = model.apply(variables, d0, d1, nk0, nk1)
    stacked = stack_adagml_layers(variables, n_layers=cfg.n_layers)
    out = adagml_online_apply(stacked, d0, d1, nk0, nk1, cfg=cfg)
    assert int(out["stop_layer"]) == int(ref["stop_layer"][0])
    np.testing.assert_array_equal(
        np.asarray(out["mask0"]), np.asarray(ref["mask0"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["mask1"]), np.asarray(ref["mask1"])
    )
    np.testing.assert_allclose(
        np.asarray(out["plan"]), np.asarray(ref["plan"]), atol=2e-5, rtol=1e-4
    )
    # the early exit actually exited before the last layer
    assert int(out["stop_layer"]) < cfg.n_layers - 1
