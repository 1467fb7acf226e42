"""Parity of the fused Pallas NMS vs the XLA reduce_window formulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.ops.nms import simple_nms
from pram_tpu.ops.nms_pallas import simple_nms_pallas


@pytest.mark.parametrize("h,w,r", [(64, 48, 4), (32, 130, 4), (64, 64, 3)])
def test_nms_pallas_matches_xla(rng, h, w, r):
    scores = jnp.asarray(
        np.abs(rng.randn(2, h, w)).astype(np.float32)
    )
    ref = simple_nms(scores, r)
    got = simple_nms_pallas(scores, r, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_nms_pallas_sparse_peaks(rng):
    """Clear peaks survive, neighbors are zeroed (semantic smoke test)."""
    s = np.zeros((1, 64, 128), np.float32)
    s[0, 10, 20] = 1.0
    s[0, 12, 22] = 0.5  # within radius of the stronger peak
    s[0, 40, 100] = 0.8
    got = np.asarray(simple_nms_pallas(jnp.asarray(s), 4, interpret=True))
    assert got[0, 10, 20] == 1.0
    assert got[0, 12, 22] == 0.0
    assert got[0, 40, 100] == 0.8
