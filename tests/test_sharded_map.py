"""Scene-sharded maps: the row-sharded engine must match the replicated one.

SURVEY §7 hard-part 5 / round-1 VERDICT item 6: Aachen-scale maps don't fit
replicated in HBM next to the batch state. maps/sharded.py shards the heavy
point/frame tables over the mesh's 'data' axis with distributed gathers
between the engine phases; these tests pin the sharded engine element-wise
to the replicated engine on the virtual 8-device CPU mesh and check the
tables really are distributed (1/8 of the rows per device).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.engine.localizer import LocConfig, Localizer
from pram_tpu.engine.matching import make_nn_match_fn
from pram_tpu.geometry.camera import Camera
from pram_tpu.maps.device import to_device
from pram_tpu.maps.sharded import ShardedMap, shard_map_tables
from pram_tpu.maps.synthetic import make_synthetic_scene
from pram_tpu.parallel.mesh import make_mesh
from tests.test_engine import perfect_logits


def _queries(rng, scene, b):
    qs = [scene.render_query(rng, noise_px=0.3) for _ in range(b)]
    n_class = scene.map.n_class
    return (
        jnp.asarray(np.stack([q["keypoints"] for q in qs])),
        jnp.asarray(np.stack([q["scores"] for q in qs])),
        jnp.asarray(np.stack([q["descriptors"] for q in qs])),
        jnp.asarray(np.stack([q["mask"] for q in qs])),
        jnp.asarray(np.stack(
            [perfect_logits(q["gt_seg"], n_class, q["mask"]) for q in qs]
        )),
    )


def _camera(b):
    return Camera(
        jnp.broadcast_to(
            jnp.asarray([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]), (b, 8)
        ),
        jnp.broadcast_to(jnp.asarray([640.0, 480.0]), (b, 2)),
    )


@pytest.mark.parametrize("refinement", ["projection", "matching"])
def test_sharded_map_matches_replicated(rng, refinement):
    mesh = make_mesh()
    assert mesh.devices.size == 8

    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    cfg = LocConfig(seg_k=2, min_inliers=16, min_kpts=32, threshold=5.0,
                    num_hypotheses=128, refinement_method=refinement,
                    covisibility_frame=4)

    b = 16  # two queries per device
    kpts, scores, descs, mask, logits = _queries(rng, scene, b)
    cam = _camera(b)
    key = jax.random.PRNGKey(0)

    loc_rep = Localizer(dmap, make_nn_match_fn(), cfg)
    r_rep = loc_rep.localize_batch(key, cam, kpts, scores, descs, mask,
                                   logits)

    smap = shard_map_tables(dmap, mesh)
    assert isinstance(smap, ShardedMap)
    loc_sh = Localizer(smap, make_nn_match_fn(), cfg)
    r_sh = loc_sh.localize_batch(key, cam, kpts, scores, descs, mask, logits)

    assert np.asarray(r_rep.success).all()
    np.testing.assert_array_equal(np.asarray(r_rep.success),
                                  np.asarray(r_sh.success))
    np.testing.assert_array_equal(np.asarray(r_rep.matched_sid),
                                  np.asarray(r_sh.matched_sid))
    np.testing.assert_array_equal(np.asarray(r_rep.num_inliers),
                                  np.asarray(r_sh.num_inliers))
    np.testing.assert_allclose(np.asarray(r_rep.qvec), np.asarray(r_sh.qvec),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_rep.tvec), np.asarray(r_sh.tvec),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(r_rep.kpt_point_idx),
                                  np.asarray(r_sh.kpt_point_idx))
    # kpt_xyz agrees wherever the association is valid (invalid slots hold
    # clip-gather vs zero-gather garbage in the two paths)
    valid = np.asarray(r_rep.kpt_point_idx) >= 0
    np.testing.assert_allclose(
        np.asarray(r_sh.kpt_xyz)[valid], np.asarray(r_rep.kpt_xyz)[valid],
        atol=1e-5,
    )

    # the heavy tables really are sharded: each device holds 1/8 of the rows
    for tab in (smap.point_desc, smap.frame_kp_uv):
        shards = tab.addressable_shards
        assert len({s.device for s in shards}) == 8
        assert all(s.data.shape[0] == tab.shape[0] // 8 for s in shards)

    # results sharded over the mesh like the inputs
    assert len({s.device for s in r_sh.qvec.addressable_shards}) == 8


def test_sharded_map_with_gml_matcher(rng):
    """The attentional matcher (vmapped Pallas Sinkhorn inside shard_map)
    composes with the distributed gathers; results match the replicated
    engine."""
    import jax.numpy as jnp

    from pram_tpu.engine.matching import make_gml_match_fn
    from pram_tpu.models.gml import GML, GMLConfig

    mesh = make_mesh()
    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=120,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    cfg = LocConfig(seg_k=2, min_inliers=10, min_kpts=32, threshold=5.0,
                    num_hypotheses=64, do_refinement=False)
    gml = GML(GMLConfig(descriptor_dim=64, hidden_dim=64, num_heads=2,
                        n_layers=2, sinkhorn_iterations=5))
    z = jnp.zeros((1, 8, 64))
    k = jnp.zeros((1, 8, 2))
    gvars = gml.init(jax.random.PRNGKey(3), z, z, k, k)
    match_fn = make_gml_match_fn(gml, gvars)

    b = 8
    kpts, scores, descs, mask, logits = _queries(rng, scene, b)
    cam = _camera(b)
    key = jax.random.PRNGKey(1)

    r_rep = Localizer(dmap, match_fn, cfg).localize_batch(
        key, cam, kpts, scores, descs, mask, logits)
    smap = shard_map_tables(dmap, mesh)
    r_sh = Localizer(smap, match_fn, cfg).localize_batch(
        key, cam, kpts, scores, descs, mask, logits)

    np.testing.assert_array_equal(np.asarray(r_rep.success),
                                  np.asarray(r_sh.success))
    np.testing.assert_array_equal(np.asarray(r_rep.num_inliers),
                                  np.asarray(r_sh.num_inliers))
    np.testing.assert_allclose(np.asarray(r_rep.tvec),
                               np.asarray(r_sh.tvec), atol=1e-4)


def test_sharded_map_capacity_math(rng):
    """hbm_bytes_per_device reports the 1/n_dev share of the heavy tables."""
    mesh = make_mesh()
    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    smap = shard_map_tables(dmap, mesh)
    per_dev = smap.hbm_bytes_per_device()
    full = sum(
        np.asarray(t).nbytes
        for t in (dmap.point_xyz, dmap.point_desc, dmap.point_seg,
                  dmap.frame_point_idx, dmap.frame_kp_uv,
                  dmap.frame_kp_score, dmap.frame_kp_mask)
    )
    # padded rows + int8 masks make it inexact; within 30% of full/8
    assert per_dev < full / 8 * 1.3
