"""Full-stack integration: synthetic features -> offline map build -> packed
map -> compiled relocalization, all through the public CLIs/file formats.

This is the strongest correctness statement in the suite: the h5 features,
matches, triangulated model, cluster/vrf/desc artifacts, compressed model and
the device engine all interoperate, and query poses come back to (5cm, 5deg).
"""

import os
import os.path as osp

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax
import jax.numpy as jnp

from pram_tpu.engine.localizer import LocConfig, Localizer
from pram_tpu.engine.matching import make_nn_match_fn
from pram_tpu.geometry.camera import Camera
from pram_tpu.geometry.rotations import compute_pose_error
from pram_tpu.maps.device import to_device
from pram_tpu.maps.loader import load_scene_map
from tests.test_engine import perfect_logits


def _look_at(eye, target):
    from pram_tpu.maps.synthetic import _look_at as la

    return la(eye, target)


def build_world(rng, n_pts=400, desc_dim=32):
    """3D points with distinctive descriptors + camera ring."""
    xyz = np.stack(
        [
            (rng.rand(n_pts) - 0.5) * 4,
            (rng.rand(n_pts) - 0.5) * 2,
            rng.rand(n_pts) * 2 + 6,
        ],
        -1,
    )
    desc = rng.randn(n_pts, desc_dim).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return xyz, desc


def render(xyz, R, t, f=500.0, cx=320.0, cy=240.0, w=640, h=480):
    xc = xyz @ R.T + t
    z = xc[:, 2]
    uv = np.stack([xc[:, 0] / z * f + cx, xc[:, 1] / z * f + cy], -1)
    vis = (z > 0.3) & (uv[:, 0] >= 4) & (uv[:, 0] < w - 4) \
        & (uv[:, 1] >= 4) & (uv[:, 1] < h - 4)
    return uv, vis


def test_offline_to_online_pipeline(tmp_path, rng):
    from pram_tpu.cli.build_map import main as build_map_main
    from pram_tpu.cli.match_features import match_from_paths
    from pram_tpu.cli.triangulate import main as triangulate_main
    from pram_tpu.maps.synthetic import _rotmat2qvec_np

    xyz, desc = build_world(rng)
    n_views = 8
    center = xyz.mean(0)

    # ---- write db features h5 (exact descriptors + pixel-true keypoints)
    feats_fn = str(tmp_path / "feats.h5")
    views = []
    with h5py.File(feats_fn, "w") as f:
        for i in range(n_views):
            ang = 2 * np.pi * i / n_views
            eye = center + np.array([np.sin(ang) * 1.5, 0.3 * np.sin(2 * ang),
                                     -8.0 - np.cos(ang)])
            R, t = _look_at(eye, center)
            uv, vis = render(xyz, R, t)
            sel = np.nonzero(vis)[0]
            views.append({"R": R, "t": t, "sel": sel, "name": f"db/v{i}.png"})
            g = f.create_group(f"db/v{i}.png")
            g.create_dataset("keypoints", data=uv[sel].astype(np.float32))
            g.create_dataset("scores", data=np.ones(len(sel), np.float32))
            g.create_dataset("descriptors", data=desc[sel].T)
            g.create_dataset("image_size", data=np.array([640, 480]))

    # ---- reference model with known poses (for triangulation)
    from pram_tpu.maps.colmap_io import (
        ColmapCamera,
        ColmapImage,
        write_model,
    )

    cameras = {1: ColmapCamera(1, "SIMPLE_PINHOLE", 640, 480,
                               np.array([500.0, 320.0, 240.0]))}
    images = {}
    for i, v in enumerate(views):
        images[i + 1] = ColmapImage(
            i + 1, _rotmat2qvec_np(v["R"]), v["t"], 1, v["name"],
            np.zeros((0, 2)), np.zeros(0, np.int64),
        )
    ref_model = str(tmp_path / "ref_model")
    write_model(cameras, images, {}, ref_model, ".bin")

    # ---- pairs + matching (sequential ring pairs)
    pairs_fn = str(tmp_path / "pairs.txt")
    with open(pairs_fn, "w") as f:
        for i in range(n_views):
            for j in (1, 2):
                f.write(
                    f"{views[i]['name']} {views[(i + j) % n_views]['name']}\n"
                )
    matches_fn = str(tmp_path / "matches.h5")
    match_from_paths(
        [tuple(l.split()) for l in open(pairs_fn)], feats_fn, matches_fn,
        conf_name="NNM", pad_to=512,
    )

    # ---- triangulate
    model_dir = str(tmp_path / "model")
    triangulate_main([
        "--reference_model", ref_model, "--features", feats_fn,
        "--pairs", pairs_fn, "--matches", matches_fn, "--output", model_dir,
    ])

    # ---- landmark map build (kmeans: deterministic-ish, no birch threshold)
    landmark_dir = str(tmp_path / "landmarks")
    build_map_main([
        "--model", model_dir, "--features", feats_fn,
        "--output", landmark_dir, "--n_cluster", "4",
        "--cluster_mode", "xyz", "--cluster_method", "kmeans",
        "--vrf_min_obs", "10", "--compress_radius", "8",
    ])

    # ---- load packed map from the artifacts and localize a novel query
    pmap = load_scene_map(
        landmark_dir, n_cluster=4, cluster_mode="xyz",
        cluster_method="kmeans", with_compress=True,
    )
    assert pmap.num_points > 100
    dmap = to_device(pmap)

    # novel query pose
    eye = center + np.array([0.3, -0.2, -7.0])
    Rq, tq = _look_at(eye, center + [0.1, 0, 0])
    uv, vis = render(xyz, Rq, tq)
    sel = np.nonzero(vis)[0][:512]
    nq = len(sel)
    K = 512
    kpts = np.zeros((K, 2), np.float32)
    descs = np.zeros((K, desc.shape[1]), np.float32)
    mask = np.zeros((K,), bool)
    kpts[:nq] = uv[sel] + rng.randn(nq, 2) * 0.3
    descs[:nq] = desc[sel]
    mask[:nq] = True

    # recognition logits from the map's own labels (nearest-descriptor lookup)
    sim = descs @ pmap.point_desc.T
    nn = np.argmax(sim, -1)
    gt_seg = np.where(
        mask & (np.max(sim, -1) > 0.99), pmap.point_seg[nn], -1
    )
    logits = perfect_logits(gt_seg, pmap.n_class, mask)

    cfg = LocConfig(seg_k=4, min_inliers=16, min_kpts=32, threshold=5.0,
                    num_hypotheses=128)
    loc = Localizer(dmap, make_nn_match_fn(), cfg)
    cam = Camera(
        jnp.asarray([[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]], jnp.float32),
        jnp.asarray([[640.0, 480.0]], jnp.float32),
    )
    res = loc.localize_batch(
        jax.random.PRNGKey(0), cam,
        jnp.asarray(kpts[None]), jnp.asarray(mask[None], jnp.float32),
        jnp.asarray(descs[None]), jnp.asarray(mask[None]),
        jnp.asarray(logits[None]),
    )
    assert bool(res.success[0])
    qe, te = compute_pose_error(
        res.qvec[0], res.tvec[0],
        jnp.asarray(_rotmat2qvec_np(Rq), jnp.float32),
        jnp.asarray(tq, jnp.float32),
    )
    assert float(qe) < 5.0, f"rotation err {float(qe)}"
    assert float(te) < 0.05, f"translation err {float(te)}"
