"""Triangulation tests: db roundtrip, epipolar verification, synthetic recovery."""

import numpy as np
import pytest

from pram_tpu.maps.colmap_io import ColmapCamera, ColmapImage
from pram_tpu.maps.database import ColmapDatabase, image_ids_to_pair_id
from pram_tpu.mapping.triangulate import (
    _normalized,
    geometric_verification,
    triangulate_tracks,
)
from pram_tpu.maps.packed import _qvec2rotmat_np


def _rotmat2qvec(R):
    from pram_tpu.maps.synthetic import _rotmat2qvec_np

    return _rotmat2qvec_np(R)


def test_database_roundtrip(tmp_path, rng):
    db_path = str(tmp_path / "test.db")
    with ColmapDatabase.connect(db_path) as db:
        cid = db.add_camera("PINHOLE", 640, 480, [500, 500, 320, 240])
        i1 = db.add_image("a.png", cid, image_id=1)
        i2 = db.add_image("b.png", cid, image_id=2)
        kp = rng.rand(100, 2).astype(np.float32) * 640
        db.add_keypoints(1, kp)
        m = rng.randint(0, 100, (40, 2))
        db.add_matches(1, 2, m)
    with ColmapDatabase.connect(db_path) as db:
        np.testing.assert_allclose(db.get_keypoints(1), kp)
        np.testing.assert_array_equal(db.get_matches(1, 2), m)
        # order-reversed query flips columns
        np.testing.assert_array_equal(db.get_matches(2, 1), m[:, ::-1])


def test_pair_id_roundtrip():
    from pram_tpu.maps.database import pair_id_to_image_ids

    pid = image_ids_to_pair_id(17, 3)
    assert pair_id_to_image_ids(pid) == (3, 17)


def _make_views(rng, n_views=4, n_pts=50):
    cam = ColmapCamera(1, "PINHOLE", 640, 480,
                       np.array([500.0, 500.0, 320.0, 240.0]))
    xyz = np.stack(
        [
            (rng.rand(n_pts) - 0.5) * 2,
            (rng.rand(n_pts) - 0.5) * 2,
            rng.rand(n_pts) * 2 + 4,
        ],
        -1,
    )
    images, kpts = {}, {}
    for i in range(n_views):
        # small rotations + sideways offsets around origin
        ang = (i - n_views / 2) * 0.08
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        t = np.array([-0.5 * i, 0.0, 0.0])
        xc = xyz @ R.T + t
        uv = np.stack(
            [
                xc[:, 0] / xc[:, 2] * 500 + 320,
                xc[:, 1] / xc[:, 2] * 500 + 240,
            ],
            -1,
        )
        images[i + 1] = ColmapImage(
            i + 1, _rotmat2qvec(R), t, 1, f"v{i}.png",
            uv, np.full(n_pts, -1, np.int64),
        )
        kpts[i + 1] = uv
    return cam, images, kpts, xyz


def test_triangulate_tracks_recovers_points(rng):
    cam, images, kpts, xyz = _make_views(rng)
    cameras = {1: cam}
    n_pts = xyz.shape[0]
    verified = {}
    for i in range(1, 4):
        verified[(i, i + 1)] = np.stack(
            [np.arange(n_pts), np.arange(n_pts)], -1
        )
    points3D, img_obs = triangulate_tracks(
        cameras, images, kpts, verified, max_reproj_error=2.0
    )
    assert len(points3D) >= n_pts * 0.95
    # each recovered point matches a ground-truth point
    errs = []
    for p in points3D.values():
        k0 = p.point2D_idxs[0]
        errs.append(np.linalg.norm(p.xyz - xyz[k0]))
        assert len(p.image_ids) >= 2
    assert np.median(errs) < 1e-3


def test_triangulate_rejects_bad_matches(rng):
    cam, images, kpts, xyz = _make_views(rng)
    cameras = {1: cam}
    n_pts = xyz.shape[0]
    # wrong correspondences: shifted by 7
    wrong = np.stack(
        [np.arange(n_pts), (np.arange(n_pts) + 7) % n_pts], -1
    )
    points3D, _ = triangulate_tracks(
        cameras, images, kpts, {(1, 2): wrong}, max_reproj_error=2.0
    )
    # mismatched tracks shouldn't survive reprojection filtering
    assert len(points3D) < n_pts * 0.2


def test_geometric_verification_epipolar(tmp_path, rng):
    import h5py

    cam, images, kpts, xyz = _make_views(rng, n_views=2)
    cameras = {1: cam}
    feats_path = str(tmp_path / "feats.h5")
    with h5py.File(feats_path, "w") as f:
        for iid, im in images.items():
            g = f.create_group(im.name)
            g.create_dataset("keypoints", data=kpts[iid] - 0.5)
    match_path = str(tmp_path / "matches.h5")
    n_pts = xyz.shape[0]
    good = np.arange(n_pts)
    m0 = np.concatenate([good[: n_pts // 2], (good[n_pts // 2:] + 11) % n_pts])
    with h5py.File(match_path, "w") as f:
        g = f.create_group("v0.png/v1.png")
        g.create_dataset("matches0", data=m0)
        g.create_dataset("matching_scores0", data=np.ones(n_pts))

    db_path = str(tmp_path / "db.db")
    image_ids = {"v0.png": 1, "v1.png": 2}
    with ColmapDatabase.connect(db_path) as db:
        db.add_camera("PINHOLE", 640, 480, cam.params, camera_id=1)
        db.add_image("v0.png", 1, image_id=1)
        db.add_image("v1.png", 1, image_id=2)
    geometric_verification(
        cameras, images, image_ids, db_path,
        [("v0.png", "v1.png")], feats_path, match_path, max_error=4.0,
    )
    with ColmapDatabase.connect(db_path) as db:
        kept = db.get_two_view_matches(1, 2)
    # correct half kept, shifted half mostly rejected
    kept_first = set(kept[:, 0].tolist())
    assert len(kept_first & set(range(n_pts // 2))) >= n_pts // 2 - 2
    assert len(kept) < n_pts * 0.8
