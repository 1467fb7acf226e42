"""Synthetic scene generator for end-to-end tests and benchmarks.

Creates a random 3D scene with landmark clusters, reference frames observing
them (COLMAP-style structures), per-point descriptors, and query views with
exact ground-truth poses — so the full localization engine can be validated
without any dataset: with noise-free descriptors, recall must be ~100%
(the synthetic-end-to-end strategy SURVEY.md §4 calls for).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from pram_tpu.maps.colmap_io import ColmapCamera, ColmapImage, ColmapPoint3D
from pram_tpu.maps.packed import PackedMap, build_scene_map, _qvec2rotmat_np


def _rotmat2qvec_np(R):
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    q = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    return q * (1 if q[0] >= 0 else -1)


def _look_at(eye, target, up=(0, -1, 0)):
    """World-to-camera pose looking from eye to target (z forward)."""
    fwd = np.asarray(target, float) - np.asarray(eye, float)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, float))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])  # rows = camera axes in world
    t = -R @ np.asarray(eye, float)
    return R, t


@dataclass
class SyntheticScene:
    map: PackedMap
    desc_dim: int
    n_cluster: int
    point_descs: Dict[int, np.ndarray]
    cameras: Dict[int, ColmapCamera]
    images: Dict[int, ColmapImage]
    points3D: Dict[int, ColmapPoint3D]
    width: int
    height: int

    def render_query(
        self, rng: np.random.RandomState, noise_px: float = 0.0,
        desc_noise: float = 0.0, max_kpts: int = 512,
    ) -> Dict:
        """Render a query view from a random pose near the cluster centers.

        Returns keypoints/descriptors/gt labels padded to ``max_kpts`` plus
        the ground-truth pose (qvec, tvec).
        """
        centers = self.map.point_xyz.mean(0)
        eye = centers + rng.randn(3) * 1.0 + np.array([0, 0, -6.0])
        R, t = _look_at(eye, centers + rng.randn(3) * 0.3)

        cam = self.cameras[1]
        fx, fy, cx, cy = cam.params[0], cam.params[0], cam.params[1], cam.params[2]
        xyz = self.map.point_xyz
        xc = xyz @ R.T + t
        z = xc[:, 2]
        uv = np.stack(
            [xc[:, 0] / z * fx + cx, xc[:, 1] / z * fy + cy], -1
        )
        vis = (
            (z > 0.2)
            & (uv[:, 0] >= 8)
            & (uv[:, 0] < self.width - 8)
            & (uv[:, 1] >= 8)
            & (uv[:, 1] < self.height - 8)
        )
        idx = np.nonzero(vis)[0]
        rng.shuffle(idx)
        idx = idx[:max_kpts]
        n = len(idx)

        kpts = np.zeros((max_kpts, 2), np.float32)
        descs = np.zeros((max_kpts, self.desc_dim), np.float32)
        segs = np.full((max_kpts,), -1, np.int32)
        mask = np.zeros((max_kpts,), bool)
        kpts[:n] = uv[idx] + rng.randn(n, 2) * noise_px
        d = self.map.point_desc[idx] + rng.randn(n, self.desc_dim) * desc_noise
        descs[:n] = d / np.linalg.norm(d, axis=-1, keepdims=True)
        segs[:n] = self.map.point_seg[idx]
        mask[:n] = True
        scores = mask.astype(np.float32)

        return {
            "keypoints": kpts,
            "descriptors": descs,
            "scores": scores,
            "mask": mask,
            "gt_seg": segs,
            "point_idx": np.where(mask, np.concatenate([idx, -np.ones(max_kpts - n, np.int64)]), -1),
            "qvec": _rotmat2qvec_np(R),
            "tvec": t.astype(np.float32),
            "R": R.astype(np.float32),
        }


def make_synthetic_scene(
    rng: np.random.RandomState,
    *,
    n_cluster: int = 4,
    points_per_cluster: int = 200,
    n_ref_frames: int = 6,
    desc_dim: int = 64,
    width: int = 640,
    height: int = 480,
    start_sid: int = 0,
    scene_name: str = "synth",
    max_kp_per_frame=None,
    max_ref_points=None,
) -> SyntheticScene:
    """Build a synthetic PackedMap with VRFs and distinctive descriptors."""
    f = 500.0
    cameras = {
        1: ColmapCamera(
            1, "SIMPLE_PINHOLE", width, height,
            np.array([f, width / 2, height / 2]),
        )
    }

    # clusters of points on a rough grid
    centers = rng.randn(n_cluster, 3) * 3.0
    pts, segs = [], []
    for c in range(n_cluster):
        pts.append(centers[c] + rng.randn(points_per_cluster, 3) * 0.8)
        segs.extend([c] * points_per_cluster)
    xyz = np.concatenate(pts)
    P = xyz.shape[0]
    descs = rng.randn(P, desc_dim)
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)

    # reference frames look at the scene from a ring
    images: Dict[int, ColmapImage] = {}
    center = xyz.mean(0)
    obs: Dict[int, List[int]] = {}
    for i in range(n_ref_frames):
        ang = 2 * np.pi * i / n_ref_frames
        eye = center + np.array(
            [np.sin(ang) * 2.0, 0.5 * rng.randn(), -7.0 - np.cos(ang)]
        )
        R, t = _look_at(eye, center)
        xc = xyz @ R.T + t
        z = xc[:, 2]
        uv = np.stack(
            [xc[:, 0] / z * f + width / 2, xc[:, 1] / z * f + height / 2], -1
        )
        vis = (
            (z > 0.2)
            & (uv[:, 0] >= 0)
            & (uv[:, 0] < width)
            & (uv[:, 1] >= 0)
            & (uv[:, 1] < height)
        )
        sel = np.nonzero(vis)[0]
        obs[i + 1] = sel.tolist()
        images[i + 1] = ColmapImage(
            i + 1,
            _rotmat2qvec_np(R),
            t,
            1,
            f"ref_{i:03d}.png",
            uv[sel],
            (sel + 1000).astype(np.int64),  # point ids offset by 1000
        )

    points3D: Dict[int, ColmapPoint3D] = {}
    track: Dict[int, List[int]] = {p: [] for p in range(P)}
    for fid, sel in obs.items():
        for p in sel:
            track[p].append(fid)
    for p in range(P):
        points3D[p + 1000] = ColmapPoint3D(
            p + 1000,
            xyz[p],
            np.array([128, 128, 128], np.uint8),
            0.5,
            np.asarray(track[p], np.int32),
            np.zeros(len(track[p]), np.int64),
        )

    p3d_desc = {p + 1000: descs[p] for p in range(P)}
    p3d_seg = {p + 1000: int(segs[p]) for p in range(P)}

    # VRF per segment: the ref frame seeing most of its points
    seg_vrf: Dict[int, Dict] = {}
    for c in range(n_cluster):
        cpts = {p + 1000 for p in range(P) if segs[p] == c}
        best_fid, best_n = 1, -1
        for fid, sel in obs.items():
            n = len(cpts & {s + 1000 for s in sel})
            if n > best_n:
                best_fid, best_n = fid, n
        seg_vrf[c] = {0: {"image_id": best_fid}}

    pmap = build_scene_map(
        cameras,
        images,
        points3D,
        p3d_desc,
        p3d_seg,
        seg_vrf,
        start_sid=start_sid,
        n_cluster=n_cluster,
        covisibility_frame=4,
        scene_name=scene_name,
        max_kp_per_frame=max_kp_per_frame,
        max_ref_points=max_ref_points,
    )
    return SyntheticScene(
        map=pmap,
        desc_dim=desc_dim,
        n_cluster=n_cluster,
        point_descs=p3d_desc,
        cameras=cameras,
        images=images,
        points3D=points3D,
        width=width,
        height=height,
    )
