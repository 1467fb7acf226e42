"""Headless visualization smoke tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pram_tpu.utils.common import pad_to_multiple, resize_img
from pram_tpu.utils.visualization import (
    generate_color_dic,
    plot_landmarks_3d,
    plot_matches,
    vis_inlier,
    vis_seg_point,
)


def test_color_table_deterministic():
    a = generate_color_dic(100)
    b = generate_color_dic(100)
    assert a == b
    assert all(0 <= c <= 255 for v in a.values() for c in v)


def test_point_and_match_plots(rng):
    img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    kpts = rng.rand(20, 2) * [160, 120]
    segs = rng.randint(0, 5, 20)
    out = vis_seg_point(img, kpts, segs, generate_color_dic(10))
    assert out.shape == img.shape and out.dtype == np.uint8

    inl = vis_inlier(img, kpts, rng.rand(20) > 0.5)
    assert inl.shape == img.shape

    img2 = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
    canvas = plot_matches(img, img2, kpts, rng.rand(20, 2) * [140, 100])
    assert canvas.shape == (120, 300, 3)


def test_landmarks_3d_saves_png(tmp_path, rng):
    xyz = rng.randn(500, 3)
    segs = rng.randint(0, 8, 500)
    fn = str(tmp_path / "landmarks.png")
    out = plot_landmarks_3d(xyz, segs, save_fn=fn,
                            frame_poses=[rng.randn(3) for _ in range(3)])
    assert out == fn
    import os

    assert os.path.getsize(fn) > 1000


def test_image_helpers(rng):
    img = (rng.rand(100, 150, 3) * 255).astype(np.uint8)
    assert resize_img(img, nh=50).shape[0] == 50
    assert resize_img(img, nw=75).shape[1] == 75
    padded, (h, w) = pad_to_multiple(img, 8)
    assert padded.shape[0] % 8 == 0 and padded.shape[1] % 8 == 0
    assert (h, w) == (100, 150)
