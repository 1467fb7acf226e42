"""Geometry: rotations, camera models, projection, batched PnP/RANSAC."""

from pram_tpu.geometry.rotations import (
    qvec2rotmat,
    rotmat2qvec,
    so3_exp,
    quaternion_angular_error,
    compute_pose_error,
)
from pram_tpu.geometry.camera import Camera, CameraModel, make_camera
from pram_tpu.geometry.pnp import ransac_pnp, PnPResult

__all__ = [
    "qvec2rotmat",
    "rotmat2qvec",
    "so3_exp",
    "quaternion_angular_error",
    "compute_pose_error",
    "Camera",
    "CameraModel",
    "make_camera",
    "ransac_pnp",
    "PnPResult",
]
