"""Quaternion / rotation-matrix / SO(3) utilities (JAX, batched).

Conventions follow COLMAP (and hence the reference): quaternions are
``(w, x, y, z)`` and poses are world-to-camera ``x_cam = R x_world + t``
(colmap_utils/read_write_model.py:556-581; localization/utils.py:39-53).
All functions are jit/vmap-friendly and work on arbitrary leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qvec2rotmat(qvec: jax.Array) -> jax.Array:
    """Quaternion (w,x,y,z) -> rotation matrix ``[..., 3, 3]``."""
    w, x, y, z = qvec[..., 0], qvec[..., 1], qvec[..., 2], qvec[..., 3]
    r = jnp.stack(
        [
            1 - 2 * y**2 - 2 * z**2,
            2 * x * y - 2 * w * z,
            2 * z * x + 2 * w * y,
            2 * x * y + 2 * w * z,
            1 - 2 * x**2 - 2 * z**2,
            2 * y * z - 2 * w * x,
            2 * z * x - 2 * w * y,
            2 * y * z + 2 * w * x,
            1 - 2 * x**2 - 2 * y**2,
        ],
        axis=-1,
    )
    return r.reshape(*qvec.shape[:-1], 3, 3)


def rotmat2qvec(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (w,x,y,z), w >= 0.

    Uses the symmetric-eigenvector method (numerically robust for all
    rotations; eigh is TPU-supported). Matches
    colmap_utils/read_write_model.py:569-581.
    """
    # the Shepperd K-matrix formula below is written for flat-order names
    # (Rxx, Ryx, Rzx = first ROW of R), matching COLMAP's unpacking
    Rxx, Ryx, Rzx = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    Rxy, Ryy, Rzy = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    Rxz, Ryz, Rzz = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    K = jnp.stack(
        [
            Rxx - Ryy - Rzz, Ryx + Rxy, Rzx + Rxz, Ryz - Rzy,
            Ryx + Rxy, Ryy - Rxx - Rzz, Rzy + Ryz, Rzx - Rxz,
            Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, Rxy - Ryx,
            Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz,
        ],
        axis=-1,
    ).reshape(*Rxx.shape, 4, 4) / 3.0
    _, eigvecs = jnp.linalg.eigh(K)
    v = eigvecs[..., :, -1]  # largest eigenvalue's vector: (x, y, z, w)
    q = jnp.stack([v[..., 3], v[..., 0], v[..., 1], v[..., 2]], axis=-1)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: ``[..., 3]`` -> skew matrix ``[..., 3, 3]``."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            zeros, -w[..., 2], w[..., 1],
            w[..., 2], zeros, -w[..., 0],
            -w[..., 1], w[..., 0], zeros,
        ],
        axis=-1,
    ).reshape(*w.shape[:-1], 3, 3)


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues' formula with a Taylor branch near zero."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / theta2)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def quaternion_angular_error(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angular distance between quaternions in degrees (localization/utils.py:24-36).

    Same quantity as the reference's ``2*arccos(|q1.q2|)`` but computed via
    chord length + arcsin, which stays accurate in float32 near zero error
    (arccos loses ~half the mantissa there).
    """
    s = jnp.where(jnp.sum(q1 * q2, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    chord = jnp.linalg.norm(q1 - s * q2, axis=-1)
    return 4.0 * jnp.arcsin(jnp.clip(chord / 2.0, 0.0, 1.0)) * (180.0 / jnp.pi)


def compute_pose_error(pred_qvec, pred_tvec, gt_qvec, gt_tvec):
    """(rotation deg, translation) error of world-to-camera poses.

    Translation error is between camera centers ``-R^T t``
    (localization/utils.py:39-53).
    """
    pred_R = qvec2rotmat(pred_qvec)
    gt_R = qvec2rotmat(gt_qvec)
    pred_c = -jnp.einsum("...ji,...j->...i", pred_R, pred_tvec)
    gt_c = -jnp.einsum("...ji,...j->...i", gt_R, gt_tvec)
    t_err = jnp.linalg.norm(pred_c - gt_c, axis=-1)
    q_err = quaternion_angular_error(pred_qvec, gt_qvec)
    return q_err, t_err
