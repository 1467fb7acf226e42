"""Retrieval-driven (hloc-style) localizer test on a synthetic world."""

import os.path as osp

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax
import jax.numpy as jnp

from pram_tpu.engine.hloc_localizer import run_localizer
from pram_tpu.engine.matching import make_nn_match_fn
from pram_tpu.geometry.rotations import compute_pose_error
from pram_tpu.maps.colmap_io import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
    write_model,
)
from pram_tpu.maps.synthetic import _look_at, _rotmat2qvec_np
from tests.test_full_pipeline import build_world, render


def test_run_localizer_synthetic(tmp_path, rng):
    xyz, desc = build_world(rng, n_pts=300)
    center = xyz.mean(0)
    n_db = 6

    cameras = {1: ColmapCamera(1, "SIMPLE_PINHOLE", 640, 480,
                               np.array([500.0, 320.0, 240.0]))}
    images = {}
    feats_fn = str(tmp_path / "feats.h5")
    points3D = {}
    obs = {}
    with h5py.File(feats_fn, "w") as f:
        for i in range(n_db):
            ang = 2 * np.pi * i / n_db
            eye = center + np.array([np.sin(ang), 0.2, -8 - np.cos(ang)])
            R, t = _look_at(eye, center)
            uv, vis = render(xyz, R, t)
            sel = np.nonzero(vis)[0]
            name = f"db/v{i}.jpg"
            # per-keypoint p3d ids (offset 500)
            images[i + 1] = ColmapImage(
                i + 1, _rotmat2qvec_np(R), t, 1, name, uv[sel],
                (sel + 500).astype(np.int64),
            )
            obs[i + 1] = sel
            g = f.create_group(name)
            g.create_dataset("keypoints", data=uv[sel].astype(np.float32))
            g.create_dataset("scores", data=np.ones(len(sel), np.float32))
            g.create_dataset("descriptors", data=desc[sel].T)
            g.create_dataset("image_size", data=np.array([640, 480]))

        # query view
        Rq, tq = _look_at(center + [0.2, -0.1, -7.5], center)
        uv, vis = render(xyz, Rq, tq)
        sel = np.nonzero(vis)[0]
        g = f.create_group("q/q0.jpg")
        g.create_dataset(
            "keypoints",
            data=(uv[sel] + rng.randn(len(sel), 2) * 0.3).astype(np.float32),
        )
        g.create_dataset("scores", data=np.ones(len(sel), np.float32))
        g.create_dataset("descriptors", data=desc[sel].T)
        g.create_dataset("image_size", data=np.array([640, 480]))

    # tracks
    track = {p: [] for p in range(len(xyz))}
    for iid, sel in obs.items():
        for k, p in enumerate(sel):
            track[p].append((iid, k))
    for p, tr in track.items():
        if not tr:
            continue
        points3D[p + 500] = ColmapPoint3D(
            p + 500, xyz[p], np.zeros(3, np.uint8), 0.4,
            np.array([t[0] for t in tr], np.int32),
            np.array([t[1] for t in tr], np.int64),
        )
    model_dir = str(tmp_path / "model")
    write_model(cameras, images, points3D, model_dir, ".bin")

    retrieval_fn = str(tmp_path / "pairs.txt")
    with open(retrieval_fn, "w") as f:
        for i in range(3):
            f.write(f"q/q0.jpg db/v{i}.jpg\n")
    queries_fn = str(tmp_path / "queries.txt")
    with open(queries_fn, "w") as f:
        f.write("q/q0.jpg SIMPLE_PINHOLE 640 480 500 320 240\n")

    out = run_localizer(
        model_dir, feats_fn, retrieval_fn, queries_fn,
        make_nn_match_fn(),
        str(tmp_path / "out"),
        gt_poses={
            "q/q0.jpg": {"qvec": _rotmat2qvec_np(Rq), "tvec": tq}
        },
        ransac_thresh=5.0,
        inlier_th=30,
        obs_th=1,
        covisibility_frame=4,
        max_db_kpts=512,
        num_hypotheses=128,
    )
    assert not out["failed"], out["failed"]
    q, t = out["poses"]["q/q0.jpg"]
    qe, te = compute_pose_error(
        jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.asarray(_rotmat2qvec_np(Rq), jnp.float32),
        jnp.asarray(tq, jnp.float32),
    )
    assert float(qe) < 2.0 and float(te) < 0.05
    # recall tallies counted the query at the tightest threshold
    assert out["recall"]["0.25m/2.0deg"] == 1.0
    # artifact contract matches the reference writers (localizer.py:169-192):
    # poses: "<full query name> <qvec x4> <tvec x3>"
    with open(tmp_path / "out" / "poses.txt") as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert len(lines) == 1
    toks = lines[0].split()
    assert toks[0] == "q/q0.jpg" and len(toks) == 1 + 4 + 3
    np.testing.assert_allclose(
        np.asarray(toks[1:], np.float64), np.concatenate([q, t]), rtol=1e-6
    )
    # <poses>.failed: one failed name per line (empty here)
    with open(str(tmp_path / "out" / "poses.txt") + ".failed") as f:
        assert f.read().strip() == ""
    # _full.log: the reference's per-query summary line format
    import re

    with open(tmp_path / "out" / "poses_full.log") as f:
        log_lines = [ln for ln in f.read().splitlines() if ln]
    assert re.match(
        r"All \d+/\d+ failed cases, time\[cs/fn\]: [\d.]+/[\d.]+, "
        r"q_error:[\d.-]+ t_error:[\d.-]+ \d+/\d+/\d+/\d+, "
        r"time: [\d.]+, \d+pts",
        log_lines[-1],
    ), log_lines[-1]
    # _loc.npy record schema: exactly the reference's two keys per query
    log = np.load(tmp_path / "out" / "loc_log.npy", allow_pickle=True).item()
    assert set(log.keys()) == {"q/q0.jpg"}
    assert set(log["q/q0.jpg"].keys()) == {"keypoints_query", "points3D_ids"}
