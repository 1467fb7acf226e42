"""Bilinear descriptor sampling at keypoint locations.

Reimplements the exact semantics the reference relies on from
``torch.nn.functional.grid_sample(mode='bilinear', align_corners=True,
padding_mode='zeros')`` (nets/sfd2.py:53-64, 348-369) so that converted
pretrained weights produce matching descriptors. The gather is expressed as
one-hot matmuls free of dynamic shapes, which XLA lowers to efficient TPU
gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_nchw(image: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample ``image`` at float pixel ``coords`` (zero padding).

    Equivalent to torch ``grid_sample(align_corners=True)`` *after* the
    caller has converted normalized grid values g in [-1, 1] to pixel units
    via ``p = (g + 1) / 2 * (size - 1)``.

    Args:
      image: ``[C, H, W]`` feature map.
      coords: ``[N, 2]`` float (x, y) pixel coordinates in the feature map.

    Returns:
      ``[C, N]`` sampled features; out-of-bounds neighbours contribute zero.
    """
    c, h, w = image.shape
    x, y = coords[:, 0], coords[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(xi, yi, wgt):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = image[:, yi_c, xi_c]  # [C, N]
        return vals * (wgt * inb.astype(image.dtype))[None, :]

    out = (
        gather(x0, y0, wx0 * wy0)
        + gather(x1, y0, wx1 * wy0)
        + gather(x0, y1, wx0 * wy1)
        + gather(x1, y1, wx1 * wy1)
    )
    return out


def sample_descriptors(
    kpts_xy: jax.Array,
    desc_map: jax.Array,
    stride: int,
    *,
    normalize: bool = True,
    eps: float = 1e-12,
) -> jax.Array:
    """Interpolate descriptors at keypoint locations.

    Matches the reference coordinate convention (nets/sfd2.py:53-64): image
    pixel coordinates are shifted by ``stride/2 - 0.5`` and scaled by
    ``(size * stride - stride/2 - 0.5)`` into the align-corners [-1, 1] grid,
    which in pixel units of the feature map is
    ``f = (k - stride/2 + 0.5) / (size*stride - stride/2 - 0.5) * (size - 1)``.

    Args:
      kpts_xy: ``[N, 2]`` (x, y) keypoint coordinates in *image* pixels.
      desc_map: ``[C, Hc, Wc]`` dense descriptor map at 1/stride resolution.
      stride: feature-map stride (4 for SFD2, 8 for SuperPoint).
      normalize: L2-normalize each descriptor (dim C).

    Returns:
      ``[N, C]`` descriptors.
    """
    c, hc, wc = desc_map.shape
    s = float(stride)
    denom = jnp.asarray(
        [wc * s - s / 2 - 0.5, hc * s - s / 2 - 0.5], dtype=kpts_xy.dtype
    )
    g = (kpts_xy - s / 2 + 0.5) / denom  # in [0, 1]
    g = g * 2.0 - 1.0  # align-corners normalized grid
    fx = (g[:, 0] + 1.0) / 2.0 * (wc - 1)
    fy = (g[:, 1] + 1.0) / 2.0 * (hc - 1)
    desc = grid_sample_nchw(desc_map, jnp.stack([fx, fy], axis=-1))  # [C, N]
    desc = desc.T  # [N, C]
    if normalize:
        # normalize in f32 regardless of the map dtype (bf16 norms lose ~1%)
        d32 = desc.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(d32 * d32, axis=-1, keepdims=True))
        desc = (d32 / jnp.maximum(norm, eps)).astype(desc.dtype)
    # keep the feature map's dtype: the bilinear weights are f32 (pixel
    # coords) and would otherwise silently promote a bf16 activation path
    # to f32 — at 4096 tokens that doubled the fused-attention VMEM
    # footprint downstream and OOM'd on hardware
    return desc.astype(desc_map.dtype)
