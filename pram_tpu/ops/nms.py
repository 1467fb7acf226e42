"""Score-map non-maximum suppression.

TPU-native equivalent of the reference's iterated max-pool NMS
(reference: nets/sfd2.py:20-35, nets/superpoint.py analogues). Implemented with
``lax.reduce_window`` so XLA lowers it to fused vector ops on the VPU; the
whole thing is shape-static and differentiable-free (used at inference only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool_2d(x: jax.Array, radius: int) -> jax.Array:
    """Sliding-window max with window (2r+1, 2r+1), stride 1, SAME padding.

    Separable formulation: max over a rectangle = max over rows then columns
    — 2(2r+1) comparisons per pixel instead of (2r+1)^2, which roughly halves
    the NMS stage's time on TPU for r=4.

    Args:
      x: ``[..., H, W]`` score maps (any leading batch dims).
      radius: window radius (window size = 2*radius+1).
    """
    if radius <= 0:
        return x
    k = 2 * radius + 1
    nd = x.ndim
    ones = (1,) * nd
    strides = (1,) * nd
    row_win = (1,) * (nd - 2) + (k, 1)
    col_win = (1,) * (nd - 2) + (1, k)
    x = lax.reduce_window(x, -jnp.inf, lax.max, row_win, strides, "SAME")
    return lax.reduce_window(x, -jnp.inf, lax.max, col_win, strides, "SAME")


def simple_nms(scores: jax.Array, nms_radius: int, num_iters: int = 2) -> jax.Array:
    """Fast NMS: keep local maxima, iteratively recover suppressed maxima.

    Matches the semantics of the reference's ``simple_nms``
    (nets/sfd2.py:20-35): a pixel survives if it is the max in its
    (2r+1)² window; two recovery rounds re-admit maxima of the residual map
    outside already-suppressed regions.

    Args:
      scores: ``[..., H, W]`` non-negative score maps.
      nms_radius: suppression radius in pixels.
      num_iters: recovery iterations (reference uses 2).

    Returns:
      Score map with non-maxima zeroed, same shape/dtype as ``scores``.
    """
    if nms_radius < 0:
        raise ValueError("nms_radius must be >= 0")
    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool_2d(scores, nms_radius)
    for _ in range(num_iters):
        supp_mask = max_pool_2d(max_mask.astype(scores.dtype), nms_radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool_2d(supp_scores, nms_radius)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)
