"""Tracker tests: frame-to-frame pose propagation on the synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.engine.localizer import LocConfig
from pram_tpu.engine.matching import make_nn_match_fn
from pram_tpu.engine.tracker import Tracker, track_frame
from pram_tpu.geometry.camera import Camera
from pram_tpu.geometry.rotations import compute_pose_error
from pram_tpu.maps.device import to_device
from pram_tpu.maps.synthetic import make_synthetic_scene


def test_track_frame_recovers_pose(rng):
    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    cfg = LocConfig(min_inliers=16, threshold=5.0, num_hypotheses=128)

    last = scene.render_query(rng, noise_px=0.2)
    curr = scene.render_query(rng, noise_px=0.2)
    cam = Camera(
        jnp.asarray([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]),
        jnp.asarray([640.0, 480.0]),
    )
    # the last frame's 3D associations come from its gt point indices
    last_pt = jnp.asarray(last["point_idx"], jnp.int32)
    res = track_frame(
        jax.random.PRNGKey(0), dmap, make_nn_match_fn(), cam,
        jnp.asarray(curr["keypoints"]), jnp.asarray(curr["scores"]),
        jnp.asarray(curr["descriptors"]), jnp.asarray(curr["mask"]),
        jnp.asarray(last["keypoints"]), jnp.asarray(last["scores"]),
        jnp.asarray(last["descriptors"]), jnp.asarray(last["mask"]),
        last_pt, jnp.asarray(0, jnp.int32), cfg,
    )
    assert bool(res.success)
    qe, te = compute_pose_error(
        res.qvec, res.tvec,
        jnp.asarray(curr["qvec"], jnp.float32), jnp.asarray(curr["tvec"]),
    )
    assert float(qe) < 5.0 and float(te) < 0.05


def test_tracker_state_machine(rng):
    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    cfg = LocConfig(min_inliers=16, threshold=5.0, num_hypotheses=128)
    tracker = Tracker(dmap, make_nn_match_fn(), cfg)
    cam = Camera(
        jnp.asarray([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]),
        jnp.asarray([640.0, 480.0]),
    )
    assert tracker.lost
    q0 = scene.render_query(rng, noise_px=0.2)
    assert tracker.track(jax.random.PRNGKey(0), cam,
                         jnp.asarray(q0["keypoints"]), jnp.asarray(q0["scores"]),
                         jnp.asarray(q0["descriptors"]), jnp.asarray(q0["mask"])) is None

    # seed tracker from a fake successful localization
    from pram_tpu.engine.localizer import LocResult

    loc = LocResult(
        qvec=jnp.asarray(q0["qvec"], jnp.float32),
        tvec=jnp.asarray(q0["tvec"]),
        R=jnp.asarray(q0["R"]),
        success=jnp.asarray(True),
        num_inliers=jnp.asarray(100),
        matched_order=jnp.asarray(0),
        matched_sid=jnp.asarray(0),
        initial_num_inliers=jnp.asarray(100),
        kpt_point_idx=jnp.asarray(q0["point_idx"], jnp.int32),
        kpt_xyz=jnp.zeros((len(q0["mask"]), 3)),
    )
    tracker.update_from_localization(
        jnp.asarray(q0["keypoints"]), jnp.asarray(q0["scores"]),
        jnp.asarray(q0["descriptors"]), jnp.asarray(q0["mask"]), loc, 0,
    )
    assert not tracker.lost

    q1 = scene.render_query(rng, noise_px=0.2)
    res = tracker.track(
        jax.random.PRNGKey(1), cam,
        jnp.asarray(q1["keypoints"]), jnp.asarray(q1["scores"]),
        jnp.asarray(q1["descriptors"]), jnp.asarray(q1["mask"]),
    )
    assert res is not None and bool(res.success)
    qe, te = compute_pose_error(
        res.qvec, res.tvec,
        jnp.asarray(q1["qvec"], jnp.float32), jnp.asarray(q1["tvec"]),
    )
    assert float(te) < 0.05
    assert not tracker.lost
