"""Matching-refinement recovery: projection refinement fails (biased initial
pose closes its reprojection gate on the true correspondences), covis-frame
matching recovers.

Scenario (multimap3d.py:251-255 auto dispatch + singlemap3d.py:268-365
matching refinement): every query keypoint of the top-ranked landmark is
shifted by a uniform ~27 px. The initial VRF localization only sees those
(semantically filtered) keypoints, so PnP converges to a systematically
wrong pose that explains the shift as a small rotation. Projection
refinement projects the covisible point set with that wrong pose: the
unbiased points land ~27 px from their true keypoints — outside the
2*threshold gate — so it can only re-find the biased set and stays wrong.
Matching refinement is pose-independent: it stacks descriptor matches from
the covisible frames (the unbiased majority included) and one large RANSAC
recovers the true pose.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.engine.localizer import LocConfig, Localizer
from pram_tpu.engine.matching import make_nn_match_fn
from pram_tpu.geometry.camera import Camera
from pram_tpu.geometry.rotations import compute_pose_error
from pram_tpu.maps.device import to_device
from pram_tpu.maps.synthetic import make_synthetic_scene
from tests.test_engine import perfect_logits


def _build_case(rng):
    scene = make_synthetic_scene(
        rng, n_cluster=8, points_per_cluster=55, n_ref_frames=10,
        desc_dim=64, max_kp_per_frame=256, max_ref_points=1024,
    )
    m = scene.map
    q = scene.render_query(rng, noise_px=0.0)
    gt_seg = q["gt_seg"]
    mask = q["mask"]

    # top-voted segment = the initial localization's candidate (seg_k=1)
    counts = np.bincount(gt_seg[mask & (gt_seg >= 0)], minlength=m.n_class)
    top_sid = int(np.argmax(counts))
    biased = mask & (gt_seg == top_sid)
    assert 8 <= biased.sum() < 64, biased.sum()  # below the trust threshold
    assert (mask & ~biased).sum() > 2 * biased.sum()  # unbiased majority

    kpts = q["keypoints"].copy()
    kpts[biased] += np.array([25.0, 10.0], np.float32)
    logits = perfect_logits(gt_seg, m.n_class, mask)
    return scene, q, kpts, logits, biased


def _as_batch(scene, q, kpts, logits):
    b = 1
    cam = Camera(
        jnp.broadcast_to(
            jnp.asarray([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]), (b, 8)
        ),
        jnp.broadcast_to(jnp.asarray([640.0, 480.0]), (b, 2)),
    )
    return (
        cam,
        jnp.asarray(kpts[None]),
        jnp.asarray(q["scores"][None]),
        jnp.asarray(q["descriptors"][None]),
        jnp.asarray(q["mask"][None]),
        jnp.asarray(logits[None]),
    )


def test_matching_refinement_recovers_when_projection_fails(rng):
    scene, q, kpts, logits, biased = _build_case(rng)
    dmap = to_device(scene.map)
    cfg = LocConfig(
        seg_k=1, min_inliers=8, min_kpts=8, threshold=5.0,
        num_hypotheses=256, do_refinement=True,
        refinement_method="projection",
    )
    key = jax.random.PRNGKey(0)
    cam_batch = _as_batch(scene, q, kpts, logits)
    gt_q = jnp.asarray(q["qvec"][None])
    gt_t = jnp.asarray(q["tvec"][None])

    loc = Localizer(dmap, make_nn_match_fn(), cfg)

    # projection-only: initial pose is biased, the gate hides the truth
    r_proj = loc.localize_batch(key, *cam_batch)
    assert bool(r_proj.success[0])
    _, t_err_proj = compute_pose_error(r_proj.qvec, r_proj.tvec, gt_q, gt_t)
    assert float(t_err_proj[0]) > 0.05, float(t_err_proj[0])
    assert int(r_proj.initial_num_inliers[0]) < 64  # distrusted by dispatch

    # auto dispatch: low-inlier frame reruns with matching refinement
    r_auto = loc.localize_batch_auto_refine(
        key, *cam_batch, trust_inliers=64
    )
    assert 64 in loc._step_auto  # the combined cond step compiled+ran
    q_err, t_err = compute_pose_error(r_auto.qvec, r_auto.tvec, gt_q, gt_t)
    assert bool(r_auto.success[0])
    assert float(t_err[0]) < 0.05, float(t_err[0])
    assert float(q_err[0]) < 5.0, float(q_err[0])
    # recovered from the covisible frames: far more inliers than the biased
    # projection result could keep
    assert int(r_auto.num_inliers[0]) > int(r_proj.num_inliers[0])


def test_matching_refinement_direct_multi_covis(rng):
    """refinement_method='matching' end-to-end through a multi-covis-frame
    map with conflicting correspondences (the biased initial matches vs the
    unbiased covis majority): the stacked [C*N] RANSAC must side with the
    majority."""
    scene, q, kpts, logits, biased = _build_case(rng)
    dmap = to_device(scene.map)
    cfg = LocConfig(
        seg_k=1, min_inliers=8, min_kpts=8, threshold=5.0,
        num_hypotheses=256, do_refinement=True,
        refinement_method="matching", covisibility_frame=8,
    )
    loc = Localizer(dmap, make_nn_match_fn(), cfg)
    r = loc.localize_batch(jax.random.PRNGKey(1), *_as_batch(scene, q, kpts, logits))
    q_err, t_err = compute_pose_error(
        r.qvec, r.tvec, jnp.asarray(q["qvec"][None]), jnp.asarray(q["tvec"][None])
    )
    assert bool(r.success[0])
    assert float(t_err[0]) < 0.05 and float(q_err[0]) < 5.0
    # per-keypoint associations come from covis frames: unbiased inlier
    # keypoints carry their true 3D point index
    pt_idx = np.asarray(r.kpt_point_idx[0])
    gt_pt = q["point_idx"]
    ok = (pt_idx >= 0) & ~biased
    assert ok.sum() > 50
    assert (pt_idx[ok] == gt_pt[ok]).mean() > 0.95
