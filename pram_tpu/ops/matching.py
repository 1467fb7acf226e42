"""Mutual-max match extraction from a transport plan.

Fixed-shape equivalent of the reference's ``compute_matches``
(nets/gml.py:304-319): row/col argmax of the plan (dustbin excluded), mutual
consistency check, score threshold, -1 for unmatched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MatchResult(NamedTuple):
    """Match indices and scores.

    Attributes:
      matches0: ``[B, N]`` int32 index into side-1 (-1 = no match).
      matches1: ``[B, M]`` int32 index into side-0 (-1 = no match).
      scores0: ``[B, N]`` matching confidence for side-0 matches.
      scores1: ``[B, M]`` matching confidence for side-1 matches.
    """

    matches0: jax.Array
    matches1: jax.Array
    scores0: jax.Array
    scores1: jax.Array


def mutual_matches(plan: jax.Array, threshold: float = 0.2) -> MatchResult:
    """Extract mutual-max matches from an augmented transport plan.

    Args:
      plan: ``[B, N+1, M+1]`` transport plan incl. dustbin (last row/col).
      threshold: minimum plan mass for a valid match (reference p=0.2).
    """
    scores = plan[:, :-1, :-1]
    b, n, m = scores.shape

    max0 = jnp.max(scores, axis=2)
    indices0 = jnp.argmax(scores, axis=2).astype(jnp.int32)
    max1 = jnp.max(scores, axis=1)
    indices1 = jnp.argmax(scores, axis=1).astype(jnp.int32)

    ar0 = jnp.arange(n, dtype=jnp.int32)[None, :]
    ar1 = jnp.arange(m, dtype=jnp.int32)[None, :]
    mutual0 = ar0 == jnp.take_along_axis(indices1, indices0, axis=1)
    mutual1 = ar1 == jnp.take_along_axis(indices0, indices1, axis=1)

    zero = jnp.zeros((), scores.dtype)
    mscores0 = jnp.where(mutual0, max0, zero)
    mscores1 = jnp.where(
        mutual1, jnp.take_along_axis(mscores0, indices1, axis=1), zero
    )
    valid0 = mutual0 & (mscores0 > threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, indices1, axis=1)
    neg1 = jnp.full((), -1, jnp.int32)
    matches0 = jnp.where(valid0, indices0, neg1)
    matches1 = jnp.where(valid1, indices1, neg1)
    return MatchResult(matches0, matches1, mscores0, mscores1)
