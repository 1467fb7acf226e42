"""Fixed-shape keypoint selection from NMS'd score maps.

The reference extracts a *variable-length* keypoint list per image
(threshold -> border removal -> top-k, nets/sfd2.py:269-346). On TPU we keep
shapes static: always return exactly ``max_keypoints`` slots with a validity
mask. The selected *set* is identical whenever the number of above-threshold
in-border maxima is <= max_keypoints, and is the top-scoring subset otherwise —
the same semantics as the reference's top-k truncation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class Keypoints(NamedTuple):
    """A fixed-size batch of keypoints with validity mask.

    Attributes:
      xy: ``[..., K, 2]`` float (x, y) pixel coordinates.
      scores: ``[..., K]`` detection scores (0 for invalid slots).
      mask: ``[..., K]`` bool validity.
    """

    xy: jax.Array
    scores: jax.Array
    mask: jax.Array


def _two_stage_top_k(flat: jax.Array, k: int):
    """Exact top-k via group-wise top-k then a small global top-k.

    A global ``lax.top_k`` over H*W (~300k) elements is sort-bound; splitting
    into G groups and taking k per group first is exact (any global top-k
    element is within its group's top-k) and much cheaper when
    G*k << H*W. Returns (values, flat indices), like lax.top_k.
    """
    b, n = flat.shape
    # pick a group count so that each group has >= k elements and the
    # second stage stays small
    g = max(1, min(n // max(k, 1), 64))
    if g <= 1 or n % g != 0:
        return lax.top_k(flat, k)
    m = n // g
    grouped = flat.reshape(b, g, m)
    v1, i1 = lax.top_k(grouped, min(k, m))  # [B, G, k]
    base = (jnp.arange(g, dtype=jnp.int32) * m)[None, :, None]
    idx1 = i1.astype(jnp.int32) + base
    v1 = v1.reshape(b, -1)
    idx1 = idx1.reshape(b, -1)
    v2, i2 = lax.top_k(v1, k)
    return v2, jnp.take_along_axis(idx1, i2, axis=1)


def _border_mask(h: int, w: int, border: int, dtype) -> jax.Array:
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    my = (ys >= border) & (ys < h - border)
    mx = (xs >= border) & (xs < w - border)
    return (my[:, None] & mx[None, :]).astype(dtype)


def _nms_block_reduce(bordered: jax.Array, block: int = 4):
    """Reduce an NMS'd map to per-block (max, flat argmax) candidates.

    After ``simple_nms(radius>=block)`` two surviving maxima are more than
    ``block`` pixels apart (each would otherwise sit inside the other's
    suppression window), so a ``block x block`` cell holds at most one
    survivor — the block max loses nothing. Exact-score ties within a block
    are the only exception (the reference keeps both, we keep one).
    Shrinks the top-k candidate set by block^2 (307k -> 19k at 480x640).
    """
    b, h, w = bordered.shape
    hb, wb = h // block, w // block
    r = bordered.reshape(b, hb, block, wb, block)
    r = jnp.transpose(r, (0, 1, 3, 2, 4)).reshape(b, hb * wb, block * block)
    bmax = jnp.max(r, axis=-1)
    barg = jnp.argmax(r, axis=-1).astype(jnp.int32)
    # flat index into the original [H, W]
    cell = jnp.arange(hb * wb, dtype=jnp.int32)
    by = cell // wb
    bx = cell % wb
    dy = barg // block
    dx = barg % block
    flat_idx = (by[None] * block + dy) * w + (bx[None] * block + dx)
    return bmax, flat_idx


def extract_keypoints(
    nms_scores: jax.Array,
    *,
    max_keypoints: int,
    conf_th: float = 0.005,
    border: int = 4,
    min_keypoints: int = 128,
    nms_radius: int = 4,
) -> Keypoints:
    """Select up to ``max_keypoints`` top maxima above an adaptive threshold.

    Mirrors the reference pipeline (nets/sfd2.py:304-329): threshold at
    ``conf_th``; if that yields <= ``min_keypoints`` points the threshold is
    halved (adaptive fallback); points within ``border`` of the edge are
    removed; the top-``max_keypoints`` by score are kept. Returned coordinates
    are (x, y) floats.

    Args:
      nms_scores: ``[B, H, W]`` NMS'd score map.
      max_keypoints: static output size K.
      conf_th: detection threshold.
      border: border margin in pixels.
      min_keypoints: fallback trigger count.
    """
    b, h, w = nms_scores.shape
    bm = _border_mask(h, w, border, nms_scores.dtype)
    bordered = nms_scores * bm[None]

    block = 4
    if nms_radius >= block and h % block == 0 and w % block == 0:
        cand, cand_idx = _nms_block_reduce(bordered, block)
        pad = max(0, max_keypoints - cand.shape[1])
        if pad:  # tiny images: fewer blocks than requested keypoints
            cand = jnp.pad(cand, ((0, 0), (0, pad)))
            cand_idx = jnp.pad(cand_idx, ((0, 0), (0, pad)))
        vals, sel = _two_stage_top_k(cand, max_keypoints)
        idx = jnp.take_along_axis(cand_idx, sel, axis=1)
    else:
        flat = bordered.reshape(b, h * w)
        vals, idx = _two_stage_top_k(flat, max_keypoints)
    # coordinates always f32: bf16 score maps would quantize pixel positions
    # (8-bit mantissa -> +-2px at x=640)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    xy = jnp.stack([xs, ys], axis=-1)

    # Adaptive threshold: the reference counts above-threshold maxima *before*
    # border removal when deciding to fall back (nets/sfd2.py:311-315).
    n_above = jnp.sum(
        (nms_scores >= conf_th).reshape(b, -1).astype(jnp.int32), axis=-1
    )
    th = jnp.where(n_above <= min_keypoints, conf_th * 0.5, conf_th)
    mask = vals >= th[:, None]
    # Guard against all-zero maps selecting score-0 slots.
    mask = mask & (vals > 0)
    return Keypoints(xy=xy, scores=vals * mask, mask=mask)


def normalize_keypoints(kpts: jax.Array, image_hw) -> jax.Array:
    """Center-and-scale keypoints as the reference does (nets/utils.py:17-24).

    Args:
      kpts: ``[..., N, 2]`` (x, y) pixel coordinates.
      image_hw: (height, width) of the source image; python ints or scalar
        arrays (broadcastable).

    Returns:
      ``[..., N, 2]`` coordinates centered at the image center and divided by
      0.7 * max(W, H).
    """
    height, width = image_hw
    size = jnp.stack(
        [jnp.asarray(width, kpts.dtype), jnp.asarray(height, kpts.dtype)]
    )
    center = size / 2
    scaling = jnp.max(size) * 0.7
    return (kpts - center) / scaling
