"""Multi-scene packed-map routing: global segment ids localize into the
right scene (the MultiMap3D scene-routing semantics, multimap3d.py:114-124)."""

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.engine.localizer import LocConfig, Localizer
from pram_tpu.engine.matching import make_nn_match_fn
from pram_tpu.geometry.camera import Camera
from pram_tpu.geometry.rotations import compute_pose_error
from pram_tpu.maps.device import to_device
from pram_tpu.maps.packed import concat_maps
from pram_tpu.maps.synthetic import make_synthetic_scene
from tests.test_engine import perfect_logits


def test_multi_scene_concat_and_localize(rng):
    # two scenes with global label offsets, like MultiMap3D composition
    s1 = make_synthetic_scene(rng, n_cluster=3, points_per_cluster=120,
                              n_ref_frames=5, desc_dim=48, start_sid=0,
                              scene_name="sceneA")
    s2 = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=120,
                              n_ref_frames=5, desc_dim=48, start_sid=3,
                              scene_name="sceneB")
    multi = concat_maps([s1.map, s2.map])

    assert multi.n_class == 3 + 4 + 1
    assert multi.num_points == s1.map.num_points + s2.map.num_points
    # scene2's segments route to scene2's VRF slots
    assert (multi.seg_vrf_slot[:3] >= 0).all()
    assert (multi.seg_vrf_slot[3:7] >= len(s1.map.vrf_frame_idx)).all()
    # frame indices offset into the concatenated frame table
    assert multi.vrf_frame_idx.max() < multi.num_frames
    np.testing.assert_array_equal(
        multi.point_seg[: s1.map.num_points], s1.map.point_seg
    )
    np.testing.assert_array_equal(
        multi.point_seg[s1.map.num_points :], s2.map.point_seg
    )

    dmap = to_device(multi)
    cfg = LocConfig(seg_k=4, min_inliers=16, min_kpts=32, threshold=5.0,
                    num_hypotheses=128)
    loc = Localizer(dmap, make_nn_match_fn(), cfg)

    # a query rendered from scene B must localize in scene B's global frame
    q = s2.render_query(rng, noise_px=0.3)
    logits = perfect_logits(q["gt_seg"], multi.n_class, q["mask"])
    cam = Camera(
        jnp.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]], jnp.float32),
        jnp.asarray([[640.0, 480.0]], jnp.float32),
    )
    res = loc.localize_batch(
        jax.random.PRNGKey(0), cam,
        jnp.asarray(q["keypoints"][None]), jnp.asarray(q["scores"][None]),
        jnp.asarray(q["descriptors"][None]), jnp.asarray(q["mask"][None]),
        jnp.asarray(logits[None]),
    )
    assert bool(res.success[0])
    # the accepted landmark is one of scene B's global ids
    assert 3 <= int(res.matched_sid[0]) < 7
    qe, te = compute_pose_error(
        res.qvec[0], res.tvec[0],
        jnp.asarray(q["qvec"], jnp.float32), jnp.asarray(q["tvec"]),
    )
    assert float(qe) < 5.0 and float(te) < 0.05

    # and a scene A query still works on the same engine
    qa = s1.render_query(rng, noise_px=0.3)
    logits_a = perfect_logits(qa["gt_seg"], multi.n_class, qa["mask"])
    res_a = loc.localize_batch(
        jax.random.PRNGKey(1), cam,
        jnp.asarray(qa["keypoints"][None]), jnp.asarray(qa["scores"][None]),
        jnp.asarray(qa["descriptors"][None]), jnp.asarray(qa["mask"][None]),
        jnp.asarray(logits_a[None]),
    )
    assert bool(res_a.success[0])
    assert 0 <= int(res_a.matched_sid[0]) < 3
