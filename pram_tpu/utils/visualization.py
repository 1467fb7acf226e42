"""Visualization: seg-colored keypoints, inliers, matches, 3D landmarks.

Rebuild of recognition/vis_seg.py:13-225 and tools/visualize_landmarks.py:
deterministic hash-based color table per landmark id, keypoint/inlier/match
plotting with cv2, and a headless matplotlib 3D landmark rendering (the
reference uses open3d windows; here figures save to disk so it runs in CI).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def generate_color_dic(n_seg: int = 1000, seed: int = 1) -> Dict[int, tuple]:
    """Deterministic seg-id -> BGR color table (vis_seg.py:13-35's
    hash-based palette, reimplemented with a seeded RNG)."""
    rng = np.random.RandomState(seed)
    colors = rng.randint(64, 255, size=(n_seg, 3))
    return {i: tuple(int(c) for c in colors[i]) for i in range(n_seg)}


def vis_seg_point(
    img: np.ndarray,
    kpts: np.ndarray,
    segs: np.ndarray,
    seg_color: Dict[int, tuple],
    radius: int = 5,
    thickness: int = -1,
) -> np.ndarray:
    """Draw keypoints colored by landmark id (vis_seg.py:37-60); seg 0 (bg)
    drawn gray."""
    import cv2

    out = img.copy()
    for (x, y), s in zip(np.asarray(kpts[:, :2], int), np.asarray(segs, int)):
        color = (128, 128, 128) if s <= 0 else seg_color[s % len(seg_color)]
        cv2.circle(out, (int(x), int(y)), radius, color, thickness)
    return out


def vis_inlier(
    img: np.ndarray,
    kpts: np.ndarray,
    inliers,
    radius: int = 5,
    thickness: int = 2,
) -> np.ndarray:
    """Green = inlier, red = outlier (vis_seg.py vis_inlier)."""
    import cv2

    out = img.copy()
    for (x, y), ok in zip(np.asarray(kpts[:, :2], int), inliers):
        color = (0, 255, 0) if ok else (0, 0, 255)
        cv2.circle(out, (int(x), int(y)), radius, color, thickness)
    return out


def plot_matches(
    img1: np.ndarray,
    img2: np.ndarray,
    pts1: np.ndarray,
    pts2: np.ndarray,
    inliers=None,
    radius: int = 5,
    line_thickness: int = 2,
) -> np.ndarray:
    """Side-by-side match plot (vis_seg.py:116-160)."""
    import cv2

    h1, w1 = img1.shape[:2]
    h2, w2 = img2.shape[:2]
    h = max(h1, h2)
    canvas = np.zeros((h, w1 + w2, 3), np.uint8)
    canvas[:h1, :w1] = img1
    canvas[:h2, w1:] = img2
    if inliers is None:
        inliers = np.ones(len(pts1), bool)
    for (x1, y1), (x2, y2), ok in zip(
        np.asarray(pts1[:, :2], int), np.asarray(pts2[:, :2], int), inliers
    ):
        color = (0, 255, 0) if ok else (0, 0, 255)
        cv2.circle(canvas, (int(x1), int(y1)), radius, color, 2)
        cv2.circle(canvas, (int(x2) + w1, int(y2)), radius, color, 2)
        cv2.line(
            canvas, (int(x1), int(y1)), (int(x2) + w1, int(y2)), color,
            line_thickness,
        )
    return canvas


def plot_landmarks_3d(
    xyz: np.ndarray,
    seg_ids: np.ndarray,
    save_fn: Optional[str] = None,
    max_points: int = 20000,
    frame_poses: Optional[List[np.ndarray]] = None,
):
    """Headless 3D landmark scatter (tools/visualize_landmarks.py without
    the open3d window) — each landmark gets its palette color; optional
    camera centers overlaid."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if len(xyz) > max_points:
        sel = np.random.RandomState(0).choice(
            len(xyz), max_points, replace=False
        )
        xyz, seg_ids = xyz[sel], seg_ids[sel]
    palette = generate_color_dic(int(seg_ids.max()) + 2)
    colors = np.array(
        [palette[int(s) % len(palette)] for s in seg_ids], float
    )[:, ::-1] / 255.0

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=colors, s=1)
    if frame_poses:
        centers = np.array(frame_poses)
        ax.scatter(
            centers[:, 0], centers[:, 1], centers[:, 2],
            c="k", marker="^", s=30,
        )
    ax.set_box_aspect((1, 1, 1))
    if save_fn:
        fig.savefig(save_fn, dpi=120)
        plt.close(fig)
        return save_fn
    return fig
