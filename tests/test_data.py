"""Data pipeline tests on a synthetic on-disk scene."""

import os
import os.path as osp

import numpy as np
import pytest

from pram_tpu.data.loader import BatchLoader, collate
from pram_tpu.data.multiscene import MultiSceneDataset
from pram_tpu.data.scene import SceneDataset, SceneSpec, normalize_size
from pram_tpu.maps.colmap_io import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
    write_model,
)


def build_disk_scene(tmp_path, rng, name="synth", n_imgs=6, n_kpts=200,
                     n_points=120, n_cluster=4, desc_dim=32):
    root = tmp_path / name
    feat_dir = root / "feats"
    os.makedirs(feat_dir)
    model_dir = root / "3D-models"

    cameras = {1: ColmapCamera(1, "SIMPLE_PINHOLE", 640, 480,
                               np.array([500.0, 320.0, 240.0]))}
    images, names = {}, []
    labels = rng.randint(0, n_cluster, n_points)
    points3D = {}
    for p in range(n_points):
        points3D[p + 1] = ColmapPoint3D(
            p + 1, rng.randn(3), np.zeros(3, np.uint8), 0.5,
            np.arange(1, n_imgs + 1, dtype=np.int32),
            np.zeros(n_imgs, np.int64),
        )
    for i in range(n_imgs):
        nm = f"seq/frame-{i:03d}.png"
        names.append(nm)
        kpts = rng.rand(n_kpts, 2) * [640, 480]
        # half the keypoints observe a 3D point
        p3d = np.full(n_kpts, -1, np.int64)
        p3d[: n_kpts // 2] = rng.randint(1, n_points + 1, n_kpts // 2)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        images[i + 1] = ColmapImage(i + 1, q, rng.randn(3), 1, nm, kpts, p3d)
        np.save(
            feat_dir / (nm.replace("/", "+") + ".npy"),
            {
                "keypoints": kpts.astype(np.float32),
                "scores": rng.rand(n_kpts).astype(np.float32),
                "descriptors": rng.randn(n_kpts, desc_dim).astype(np.float32),
                "image_size": np.array([480, 640]),
            },
        )
    write_model(cameras, images, points3D, str(model_dir), ".bin")

    cluster_fn = root / "cluster.npy"
    np.save(
        cluster_fn,
        {"id": np.arange(1, n_points + 1), "label": labels},
    )
    # query association: reuse the db keypoint->p3d mapping
    qfn = root / "query_p3d.npy"
    np.save(qfn, {nm: images[i + 1].point3D_ids for i, nm in enumerate(names)})

    return SceneSpec(
        name=name,
        image_names=names,
        feature_dir=str(feat_dir),
        sfm_model_path=str(model_dir),
        cluster_file=str(cluster_fn),
        query_p3d_file=str(qfn),
        n_class=n_cluster + 1,
    )


def test_train_item_shapes_and_labels(tmp_path, rng):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=128, train=True)
    item = ds.get_train_item(0, np.random.RandomState(0))
    assert item["keypoints"].shape == (128, 2)
    assert item["gt_seg"].shape == (128,)
    assert item["scores"].shape == (128,)
    assert item["gt_cls"].shape == (5,)
    assert item["mask"].all()
    # labels are within [0, n_class)
    assert item["gt_seg"].min() >= 0 and item["gt_seg"].max() < 5
    # gt stats consistent
    for uid in np.unique(item["gt_seg"]):
        if uid == 0:
            continue
        assert item["gt_cls"][uid] == 1
        assert item["gt_n_seg"][uid] == np.sum(item["gt_seg"] == uid)


def test_train_item_deterministic_given_rng(tmp_path, rng):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=64, train=True)
    a = ds.get_train_item(1, np.random.RandomState(7))
    b = ds.get_train_item(1, np.random.RandomState(7))
    np.testing.assert_array_equal(a["keypoints"], b["keypoints"])
    np.testing.assert_array_equal(a["gt_seg"], b["gt_seg"])


def test_test_item_topk_by_score(tmp_path, rng):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=32, train=False)
    item = ds.get_test_item(0)
    assert item["descriptors"].shape == (32, 32)
    assert item["mask"].sum() == 32
    # scores sorted descending
    s = item["scores"][item["mask"]]
    assert np.all(np.diff(s) <= 0)


def test_multiscene_label_offsets(tmp_path, rng):
    spec1 = build_disk_scene(tmp_path, rng, name="a", n_cluster=3)
    spec2 = build_disk_scene(tmp_path, rng, name="b", n_cluster=4)
    ds1 = SceneDataset(spec1, nfeatures=64, train=True)
    ds2 = SceneDataset(spec2, nfeatures=64, train=True)
    multi = MultiSceneDataset([ds1, ds2])
    assert multi.n_class == 1 + 3 + 4

    rng0 = np.random.RandomState(0)
    item1 = multi.get_train_item(0, rng0)  # from ds1
    item2 = multi.get_train_item(len(ds1), rng0)  # from ds2
    s1 = item1["gt_seg"][item1["gt_seg"] > 0]
    s2 = item2["gt_seg"][item2["gt_seg"] > 0]
    # scene 1 labels in [1, 3]; scene 2 labels in [4, 7]
    assert s1.size and s1.min() >= 1 and s1.max() <= 3
    assert s2.size and s2.min() >= 4 and s2.max() <= 7
    assert item1["gt_cls"].shape == (8,)


def test_batch_loader_shapes_and_determinism(tmp_path, rng):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=64, train=True)
    loader = BatchLoader(ds, batch_size=4, train=True, seed=3)
    batches = list(loader.epoch(0))
    assert len(batches) == len(ds) // 4
    b0 = batches[0]
    assert b0["keypoints"].shape == (4, 64, 2)
    assert b0["gt_seg"].shape == (4, 64)
    # same epoch/seed reproduces batches
    batches2 = list(loader.epoch(0))
    np.testing.assert_array_equal(
        batches[0]["keypoints"], batches2[0]["keypoints"]
    )
    # different epoch reshuffles
    b_other = next(iter(loader.epoch(1)))
    assert not np.array_equal(b0["keypoints"], b_other["keypoints"])


def test_batch_loader_host_sharding(tmp_path, rng):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=32, train=False)
    l0 = BatchLoader(ds, batch_size=1, train=False, num_hosts=2, host_id=0)
    l1 = BatchLoader(ds, batch_size=1, train=False, num_hosts=2, host_id=1)
    names0 = [b["file_name"][0] for b in l0.epoch(0)]
    names1 = [b["file_name"][0] for b in l1.epoch(0)]
    assert not set(names0) & set(names1)
    assert len(names0) + len(names1) == len(ds)


def test_batch_loader_workers_match_sync(tmp_path, rng):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=32, train=True)
    sync = list(BatchLoader(ds, batch_size=2, seed=5).epoch(0))
    thr = list(BatchLoader(ds, batch_size=2, seed=5, num_workers=3).epoch(0))
    assert len(sync) == len(thr)
    for a, b in zip(sync, thr):
        np.testing.assert_array_equal(a["keypoints"], b["keypoints"])


def test_normalize_size_matches_reference_quirk():
    """The reference subtracts (h/2, w/2) from (x, y) — swapped axes
    (dataset/utils.py:11-14); we reproduce it for checkpoint parity."""
    kpts = np.array([[240.0, 320.0], [0.0, 0.0]])
    out = normalize_size(kpts, (480, 640))
    np.testing.assert_allclose(out[0], [0, 0])
    np.testing.assert_allclose(
        out[1], [-240 / (640.5 * 0.7), -320 / (640.5 * 0.7)]
    )
