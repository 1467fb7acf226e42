"""Adaptive two-phase localization == full sweep where phase 1 succeeds."""

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


def test_adaptive_matches_full_on_easy_queries(rng):
    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    cfg = LocConfig(seg_k=4, min_inliers=16, min_kpts=32, threshold=5.0,
                    num_hypotheses=128)
    loc = Localizer(dmap, make_nn_match_fn(), cfg)
    n_class = scene.map.n_class

    queries = [scene.render_query(rng, noise_px=0.3) for _ in range(3)]
    kpts = jnp.asarray(np.stack([q["keypoints"] for q in queries]))
    descs = jnp.asarray(np.stack([q["descriptors"] for q in queries]))
    scores = jnp.asarray(np.stack([q["scores"] for q in queries]))
    mask = jnp.asarray(np.stack([q["mask"] for q in queries]))
    logits = jnp.asarray(np.stack(
        [perfect_logits(q["gt_seg"], n_class, q["mask"]) for q in queries]
    ))
    cam = Camera(
        jnp.broadcast_to(
            jnp.asarray([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]), (3, 8)
        ),
        jnp.broadcast_to(jnp.asarray([640.0, 480.0]), (3, 2)),
    )
    res = loc.localize_batch_adaptive(
        jax.random.PRNGKey(0), cam, kpts, scores, descs, mask, logits
    )
    assert np.asarray(res.success).all()
    for i, q in enumerate(queries):
        qe, te = compute_pose_error(
            res.qvec[i], res.tvec[i],
            jnp.asarray(q["qvec"], jnp.float32), jnp.asarray(q["tvec"]),
        )
        assert float(qe) < 5.0 and float(te) < 0.05


def test_adaptive_falls_back_on_bad_top1(rng):
    """A query whose top-1 landmark has no VRF must be recovered by phase 2."""
    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    cfg = LocConfig(seg_k=4, min_inliers=16, min_kpts=32, threshold=5.0,
                    num_hypotheses=128)
    loc = Localizer(dmap, make_nn_match_fn(), cfg)
    n_class = scene.map.n_class

    q = scene.render_query(rng, noise_px=0.3)
    logits = perfect_logits(q["gt_seg"], n_class, q["mask"])
    # corrupt rank-1: a quarter of kpts vote a WRONG landmark first so phase 1
    # picks a candidate whose VRF doesn't see the query's points
    wrong = (np.asarray(q["gt_seg"]) + 2) % 4
    n = len(logits)
    logits[: n // 2, wrong[: n // 2] + 1] = 30.0

    cam = Camera(
        jnp.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]], jnp.float32),
        jnp.asarray([[640.0, 480.0]], jnp.float32),
    )
    res = loc.localize_batch_adaptive(
        jax.random.PRNGKey(1), cam,
        jnp.asarray(q["keypoints"][None]), jnp.asarray(q["scores"][None]),
        jnp.asarray(q["descriptors"][None]), jnp.asarray(q["mask"][None]),
        jnp.asarray(logits[None]),
    )
    # whether phase 1 or 2 resolved it, the pose must be correct
    assert bool(res.success[0])
    qe, te = compute_pose_error(
        res.qvec[0], res.tvec[0],
        jnp.asarray(q["qvec"], jnp.float32), jnp.asarray(q["tvec"]),
    )
    assert float(qe) < 5.0 and float(te) < 0.05


def test_adaptive_mixed_batch_merges_per_frame(rng):
    """One easy frame + one frame needing phase 2: merged results must keep
    the phase-1 pose for the easy frame and fix the hard one."""
    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    cfg = LocConfig(seg_k=4, min_inliers=16, min_kpts=32, threshold=5.0,
                    num_hypotheses=128)
    loc = Localizer(dmap, make_nn_match_fn(), cfg)
    n_class = scene.map.n_class

    easy = scene.render_query(rng, noise_px=0.3)
    hard = scene.render_query(rng, noise_px=0.3)
    logits_easy = perfect_logits(easy["gt_seg"], n_class, easy["mask"])
    logits_hard = perfect_logits(hard["gt_seg"], n_class, hard["mask"])
    # corrupt hard's rank-1 to a wrong landmark (gt stays rank 2)
    wrong = (np.asarray(hard["gt_seg"]) + 2) % 4
    logits_hard[:, :] -= 1.0
    rows = np.arange(len(logits_hard))
    logits_hard[rows, wrong + 1] = 30.0

    kpts = jnp.asarray(np.stack([easy["keypoints"], hard["keypoints"]]))
    descs = jnp.asarray(np.stack([easy["descriptors"], hard["descriptors"]]))
    scores = jnp.asarray(np.stack([easy["scores"], hard["scores"]]))
    mask = jnp.asarray(np.stack([easy["mask"], hard["mask"]]))
    logits = jnp.asarray(np.stack([logits_easy, logits_hard]))
    cam = Camera(
        jnp.broadcast_to(
            jnp.asarray([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]), (2, 8)
        ),
        jnp.broadcast_to(jnp.asarray([640.0, 480.0]), (2, 2)),
    )
    res = loc.localize_batch_adaptive(
        jax.random.PRNGKey(3), cam, kpts, scores, descs, mask, logits
    )
    for i, q in enumerate([easy, hard]):
        assert bool(res.success[i]), f"frame {i} failed"
        qe, te = compute_pose_error(
            res.qvec[i], res.tvec[i],
            jnp.asarray(q["qvec"], jnp.float32), jnp.asarray(q["tvec"]),
        )
        assert float(qe) < 5.0 and float(te) < 0.05, f"frame {i}"


def test_bf16_pipeline_still_localizes(rng):
    """The mixed-precision split (bf16 descriptors/maps, f32 coords/Sinkhorn/
    PnP) must preserve localization accuracy on the synthetic scene."""
    from pram_tpu.utils.precision import cast_variables

    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    dmap = dmap._replace(point_desc=dmap.point_desc.astype(jnp.bfloat16))
    cfg = LocConfig(seg_k=4, min_inliers=16, min_kpts=32, threshold=5.0,
                    num_hypotheses=128)
    loc = Localizer(dmap, make_nn_match_fn(), cfg)
    n_class = scene.map.n_class

    q = scene.render_query(rng, noise_px=0.3)
    logits = perfect_logits(q["gt_seg"], n_class, q["mask"])
    cam = Camera(
        jnp.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]], jnp.float32),
        jnp.asarray([[640.0, 480.0]], jnp.float32),
    )
    res = loc.localize_batch(
        jax.random.PRNGKey(5), cam,
        jnp.asarray(q["keypoints"][None]),  # coords stay f32
        jnp.asarray(q["scores"][None]),
        jnp.asarray(q["descriptors"][None]).astype(jnp.bfloat16),
        jnp.asarray(q["mask"][None]),
        jnp.asarray(logits[None]),
    )
    assert bool(res.success[0])
    qe, te = compute_pose_error(
        res.qvec[0], res.tvec[0],
        jnp.asarray(q["qvec"], jnp.float32), jnp.asarray(q["tvec"]),
    )
    assert float(qe) < 5.0 and float(te) < 0.05


def test_auto_refine_dispatch(rng):
    """Auto refinement (multimap3d.py:251-255): trusted frames keep the
    projection result; low-inlier frames rerun with matching refinement."""
    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    cfg = LocConfig(seg_k=4, min_inliers=16, min_kpts=32, threshold=5.0,
                    num_hypotheses=128, covisibility_frame=4)
    loc = Localizer(dmap, make_nn_match_fn(), cfg)
    n_class = scene.map.n_class
    q = scene.render_query(rng, noise_px=0.3)
    logits = perfect_logits(q["gt_seg"], n_class, q["mask"])
    cam = Camera(
        jnp.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]], jnp.float32),
        jnp.asarray([[640.0, 480.0]], jnp.float32),
    )
    args = (
        jnp.asarray(q["keypoints"][None]), jnp.asarray(q["scores"][None]),
        jnp.asarray(q["descriptors"][None]), jnp.asarray(q["mask"][None]),
        jnp.asarray(logits[None]),
    )
    # high trust threshold -> forces the matching-refinement rerun branch
    # (single compiled dispatch with the rerun behind lax.cond)
    res = loc.localize_batch_auto_refine(
        jax.random.PRNGKey(4), cam, *args, trust_inliers=10**6
    )
    assert 10**6 in loc._step_auto  # combined cond step was built
    assert bool(res.success[0])
    qe, te = compute_pose_error(
        res.qvec[0], res.tvec[0],
        jnp.asarray(q["qvec"], jnp.float32), jnp.asarray(q["tvec"]),
    )
    assert float(qe) < 5.0 and float(te) < 0.05
    # the rerun actually executed: with nothing trusted, the result must be
    # bit-equal to a standalone matching-refinement step run under the
    # rerun branch's RNG stream (fold_in(key, 2))
    res_match = loc._make_step(
        __import__("dataclasses").replace(cfg, refinement_method="matching")
    )(jax.random.fold_in(jax.random.PRNGKey(4), 2), cam, *args)
    np.testing.assert_array_equal(
        np.asarray(res.tvec), np.asarray(res_match.tvec)
    )

    # low threshold -> trusted everywhere: identical to the plain step
    loc2 = Localizer(dmap, make_nn_match_fn(), cfg)
    res2 = loc2.localize_batch_auto_refine(
        jax.random.PRNGKey(4), cam, *args, trust_inliers=1
    )
    res_plain = loc2.localize_batch(jax.random.PRNGKey(4), cam, *args)
    np.testing.assert_array_equal(
        np.asarray(res2.tvec), np.asarray(res_plain.tvec)
    )
    assert bool(res2.success[0])
