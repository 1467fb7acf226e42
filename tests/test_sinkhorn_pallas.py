"""Pallas Sinkhorn kernel == XLA reference implementation (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.ops.sinkhorn import sinkhorn_matching
from pram_tpu.ops.sinkhorn_pallas import sinkhorn_matching_pallas


def test_pallas_sinkhorn_matches_xla(rng):
    sim = rng.randn(2, 24, 40).astype(np.float32)
    ref = np.asarray(
        sinkhorn_matching(jnp.asarray(sim), jnp.asarray(0.7), num_iters=20)
    )
    out = np.asarray(
        sinkhorn_matching_pallas(
            jnp.asarray(sim), jnp.asarray(0.7), num_iters=20, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_pallas_sinkhorn_masked(rng):
    sim = rng.randn(1, 16, 24).astype(np.float32)
    m0 = np.zeros((1, 16), bool)
    m0[:, :11] = True
    m1 = np.zeros((1, 24), bool)
    m1[:, :17] = True
    ref = np.asarray(
        sinkhorn_matching(
            jnp.asarray(sim), jnp.asarray(1.0), 20,
            jnp.asarray(m0), jnp.asarray(m1),
        )
    )
    out = np.asarray(
        sinkhorn_matching_pallas(
            jnp.asarray(sim), jnp.asarray(1.0), 20,
            jnp.asarray(m0), jnp.asarray(m1), interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
