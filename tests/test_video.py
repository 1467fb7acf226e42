"""Round-trip test for the image<->video converters
(reference tools/image_to_video.py + video_to_image.py)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pram_tpu.utils.video import images_to_video, video_to_images


def _write_frames(d, n=6, h=48, w=64):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = np.full((h, w, 3), i * 30, np.uint8)
        img[:8, :8] = rng.randint(0, 255, (8, 8, 3))
        cv2.imwrite(os.path.join(d, f"{i:04d}.png"), img)


def test_roundtrip(tmp_path):
    src = str(tmp_path / "src")
    _write_frames(src, n=6)
    video = str(tmp_path / "out.mp4")
    n = images_to_video(src, video, fps=10)
    assert n == 6
    if os.path.getsize(video) == 0:
        pytest.skip("no mp4 encoder in this OpenCV build")
    dst = str(tmp_path / "dst")
    m = video_to_images(video, dst)
    assert m == 6
    names = sorted(os.listdir(dst))
    assert names[0] == "000000.png"
    # lossy codec: check gross brightness ordering survives, not pixels
    means = [
        cv2.imread(os.path.join(dst, f)).mean() for f in names
    ]
    assert means == sorted(means)


def test_sampling_and_resize(tmp_path):
    src = str(tmp_path / "src")
    _write_frames(src, n=8)
    video = str(tmp_path / "out.mp4")
    images_to_video(src, video, fps=10, height=32)
    if os.path.getsize(video) == 0:
        pytest.skip("no mp4 encoder in this OpenCV build")
    dst = str(tmp_path / "dst")
    m = video_to_images(video, dst, sample_ratio=2)
    assert m == 4
    # numbering counts source frames (skips advance the counter)
    assert sorted(os.listdir(dst))[1] == "000002.png"
    img = cv2.imread(os.path.join(dst, "000000.png"))
    assert img.shape[0] == 32
