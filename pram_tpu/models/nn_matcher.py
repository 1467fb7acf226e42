"""Mutual nearest-neighbour descriptor matcher.

Rebuild of the reference baseline (localization/matchers/nearest_neighbor.py):
cosine-similarity NN with optional ratio test and distance threshold plus a
mutual check — expressed as fixed-shape masked matrix ops (one MXU matmul).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class NNMatchResult(NamedTuple):
    matches0: jax.Array  # [B, N] int32, -1 invalid
    scores0: jax.Array  # [B, N] similarity of the match


def mutual_nn_match(
    desc0: jax.Array,  # [B, N, D] (L2-normalized)
    desc1: jax.Array,  # [B, M, D]
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
    ratio_threshold: Optional[float] = None,
    distance_threshold: Optional[float] = None,
    do_mutual_check: bool = True,
) -> NNMatchResult:
    """Mutual-NN with SIFT-style ratio test on descriptor distance.

    The ratio test follows the reference formulation on squared L2 distance of
    unit descriptors: d^2 = 2 - 2*sim.
    """
    sim = jnp.einsum(
        "bnd,bmd->bnm", desc0, desc1, preferred_element_type=jnp.float32
    )
    neg = jnp.asarray(-1e9, sim.dtype)
    if mask1 is not None:
        sim = jnp.where(mask1[:, None, :], sim, neg)
    if mask0 is not None:
        sim = jnp.where(mask0[:, :, None], sim, neg)

    nn0 = jnp.argmax(sim, axis=2).astype(jnp.int32)  # [B, N]
    best0 = jnp.max(sim, axis=2)
    valid = jnp.ones_like(nn0, dtype=bool)
    if mask0 is not None:
        valid &= mask0

    if ratio_threshold is not None:
        m = sim.shape[2]
        # second best: mask out the argmax column per row
        onehot = jax.nn.one_hot(nn0, m, dtype=sim.dtype)
        sim2 = sim - onehot * 2e9
        second0 = jnp.max(sim2, axis=2)
        d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best0, 0.0))
        d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second0, 0.0))
        valid &= d1 <= ratio_threshold * d2
    if distance_threshold is not None:
        d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best0, 0.0))
        valid &= d1 <= distance_threshold
    if do_mutual_check:
        nn1 = jnp.argmax(sim, axis=1).astype(jnp.int32)  # [B, M]
        back = jnp.take_along_axis(nn1, nn0, axis=1)
        valid &= back == jnp.arange(nn0.shape[1], dtype=jnp.int32)[None]

    matches0 = jnp.where(valid, nn0, -1)
    scores0 = jnp.where(valid, best0, 0.0)
    return NNMatchResult(matches0, scores0)
