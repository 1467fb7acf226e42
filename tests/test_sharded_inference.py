"""Multi-chip inference: query batch sharded over the 8-device CPU mesh must
match the single-device engine exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.engine.localizer import LocConfig, Localizer
from pram_tpu.engine.matching import make_nn_match_fn
from pram_tpu.geometry.camera import Camera
from pram_tpu.maps.device import to_device
from pram_tpu.maps.synthetic import make_synthetic_scene
from pram_tpu.parallel.mesh import make_mesh
from tests.test_engine import perfect_logits


def test_sharded_localize_matches_single_device(rng):
    mesh = make_mesh()
    assert mesh.devices.size == 8

    scene = make_synthetic_scene(rng, n_cluster=4, points_per_cluster=150,
                                 n_ref_frames=6, desc_dim=64)
    dmap = to_device(scene.map)
    cfg = LocConfig(seg_k=2, min_inliers=16, min_kpts=32, threshold=5.0,
                    num_hypotheses=128)
    n_class = scene.map.n_class

    b = 8  # one query per device
    queries = [scene.render_query(rng, noise_px=0.3) for _ in range(b)]
    kpts = jnp.asarray(np.stack([q["keypoints"] for q in queries]))
    descs = jnp.asarray(np.stack([q["descriptors"] for q in queries]))
    scores = jnp.asarray(np.stack([q["scores"] for q in queries]))
    mask = jnp.asarray(np.stack([q["mask"] for q in queries]))
    logits = jnp.asarray(np.stack(
        [perfect_logits(q["gt_seg"], n_class, q["mask"]) for q in queries]
    ))
    cam = Camera(
        jnp.broadcast_to(
            jnp.asarray([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]), (b, 8)
        ),
        jnp.broadcast_to(jnp.asarray([640.0, 480.0]), (b, 2)),
    )
    key = jax.random.PRNGKey(0)

    loc1 = Localizer(dmap, make_nn_match_fn(), cfg)
    r1 = loc1.localize_batch(key, cam, kpts, scores, descs, mask, logits)

    loc8 = Localizer(dmap, make_nn_match_fn(), cfg, mesh=mesh)
    r8 = loc8.localize_batch(key, cam, kpts, scores, descs, mask, logits)

    assert np.asarray(r8.success).all()
    np.testing.assert_array_equal(
        np.asarray(r1.success), np.asarray(r8.success)
    )
    np.testing.assert_allclose(
        np.asarray(r1.qvec), np.asarray(r8.qvec), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r1.tvec), np.asarray(r8.tvec), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(r1.num_inliers), np.asarray(r8.num_inliers)
    )
    # the result really is sharded over the mesh
    shard_devs = {s.device for s in r8.qvec.addressable_shards}
    assert len(shard_devs) == 8
