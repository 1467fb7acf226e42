"""Camera models: COLMAP-compatible intrinsics, projection, undistortion.

Supports the models the reference handles (localization/frame.py:154-175):
SIMPLE_PINHOLE, PINHOLE, SIMPLE_RADIAL, RADIAL, OPENCV. Cameras are packed
into a fixed-width parameter vector so a batch of heterogeneous cameras stays
one array under jit; unused distortion coefficients are zero, making the
distortion math a no-op for pinhole models (no branching needed).

Packed layout: ``[fx, fy, cx, cy, k1, k2, p1, p2]``.

Shape convention: camera batch dims ``[...]`` must match the leading dims of
the point arrays ``[..., N, 2|3]``; a single camera (params ``[8]``) works
with points ``[N, 2|3]``.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class CameraModel(enum.IntEnum):
    SIMPLE_PINHOLE = 0
    PINHOLE = 1
    SIMPLE_RADIAL = 2
    RADIAL = 3
    OPENCV = 4


class Camera(NamedTuple):
    """Packed camera: params ``[..., 8]`` = (fx, fy, cx, cy, k1, k2, p1, p2)
    plus image size ``[..., 2]`` = (width, height)."""

    params: jax.Array
    size: jax.Array


def make_camera(
    model: Union[str, CameraModel],
    params: Sequence[float],
    width: int,
    height: int,
) -> Camera:
    """Build a packed Camera from COLMAP (model, params).

    COLMAP parameter orders: SIMPLE_PINHOLE (f, cx, cy); PINHOLE (fx, fy, cx,
    cy); SIMPLE_RADIAL (f, cx, cy, k); RADIAL (f, cx, cy, k1, k2); OPENCV
    (fx, fy, cx, cy, k1, k2, p1, p2).
    """
    if isinstance(model, str):
        model = CameraModel[model]
    p = np.zeros(8, np.float32)
    params = np.asarray(params, np.float32)
    if model == CameraModel.SIMPLE_PINHOLE:
        p[0] = p[1] = params[0]
        p[2:4] = params[1:3]
    elif model == CameraModel.PINHOLE:
        p[0:4] = params[0:4]
    elif model == CameraModel.SIMPLE_RADIAL:
        p[0] = p[1] = params[0]
        p[2:4] = params[1:3]
        p[4] = params[3]
    elif model == CameraModel.RADIAL:
        p[0] = p[1] = params[0]
        p[2:4] = params[1:3]
        p[4:6] = params[3:5]
    elif model == CameraModel.OPENCV:
        p[0:8] = params[0:8]
    else:
        raise ValueError(f"unsupported camera model {model}")
    return Camera(
        params=jnp.asarray(p), size=jnp.asarray([width, height], jnp.float32)
    )


def _coef(camera: Camera, i: int) -> jax.Array:
    """Camera coefficient i, shaped ``[..., 1, 1]`` to broadcast over points."""
    return camera.params[..., i][..., None, None]


def intrinsic_matrix(camera: Camera) -> jax.Array:
    """3x3 K (distortion excluded) — localization/frame.py:154-175."""
    fx, fy, cx, cy = (camera.params[..., i] for i in range(4))
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    K = jnp.stack(
        [fx, zeros, cx, zeros, fy, cy, zeros, zeros, ones], axis=-1
    )
    return K.reshape(*fx.shape, 3, 3)


def distort(camera: Camera, xy: jax.Array) -> jax.Array:
    """Apply radial(+tangential) distortion to normalized coords ``[..., N, 2]``."""
    k1, k2, p1, p2 = (_coef(camera, i) for i in (4, 5, 6, 7))
    x, y = xy[..., 0:1], xy[..., 1:2]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.concatenate([x * radial + dx, y * radial + dy], axis=-1)


def undistort(camera: Camera, xy: jax.Array, num_iters: int = 5) -> jax.Array:
    """Invert :func:`distort` by fixed-point iteration (COLMAP-style)."""

    def body(u, _):
        d = distort(camera, u) - u  # distortion offset at current estimate
        return xy - d, None

    u, _ = jax.lax.scan(body, xy, None, length=num_iters)
    return u


def pixel_to_normalized(camera: Camera, uv: jax.Array) -> jax.Array:
    """Pixels ``[..., N, 2]`` -> undistorted normalized image coords."""
    fx, fy, cx, cy = (_coef(camera, i) for i in (0, 1, 2, 3))
    x = (uv[..., 0:1] - cx) / fx
    y = (uv[..., 1:2] - cy) / fy
    return undistort(camera, jnp.concatenate([x, y], axis=-1))


def pixel_to_bearing(camera: Camera, uv: jax.Array) -> jax.Array:
    """Pixels -> unit bearing vectors ``[..., N, 3]`` in the camera frame."""
    xy = pixel_to_normalized(camera, uv)
    f = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def project(
    camera: Camera, R: jax.Array, t: jax.Array, xyz_world: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Project world points through pose (R, t) into pixels.

    Args:
      R: ``[..., 3, 3]`` world-to-camera rotation.
      t: ``[..., 3]`` translation.
      xyz_world: ``[..., N, 3]``.

    Returns:
      (uv ``[..., N, 2]``, depth ``[..., N]``).
    """
    xc = jnp.einsum("...ij,...nj->...ni", R, xyz_world) + t[..., None, :]
    z = xc[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    xy = xc[..., :2] / zsafe[..., None]
    xy = distort(camera, xy)
    fx, fy, cx, cy = (_coef(camera, i) for i in (0, 1, 2, 3))
    uv = jnp.concatenate(
        [xy[..., 0:1] * fx + cx, xy[..., 1:2] * fy + cy], axis=-1
    )
    return uv, z
