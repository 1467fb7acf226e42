"""Mapping pipeline tests: outliers, clustering, descriptors, VRFs, compression."""

import numpy as np
import pytest

from pram_tpu.mapping.clustering import cluster_points, kmeans_jax
from pram_tpu.mapping.outliers import statistical_outlier_removal
from pram_tpu.mapping.recmap import RecMap
from pram_tpu.maps.colmap_io import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
)


def test_outlier_removal_drops_far_points(rng):
    core = rng.randn(500, 3) * 0.5
    outliers = rng.randn(10, 3) * 0.5 + 50.0
    xyz = np.vstack([core, outliers])
    keep = statistical_outlier_removal(xyz, nb_neighbors=20, std_ratio=2.0)
    assert all(i < 500 for i in keep)
    assert len(keep) >= 490


def test_kmeans_jax_separates_blobs(rng):
    import jax

    blobs = np.vstack(
        [rng.randn(100, 3) * 0.2 + c for c in ([0, 0, 0], [5, 0, 0], [0, 5, 0])]
    ).astype(np.float32)
    labels, centers = kmeans_jax(jax.random.PRNGKey(0), blobs, 3)
    labels = np.asarray(labels)
    # each blob is one pure cluster
    for b in range(3):
        blob_labels = labels[b * 100 : (b + 1) * 100]
        assert len(np.unique(blob_labels)) == 1
    assert len(np.unique(labels)) == 3


def test_cluster_points_axis_masking(rng):
    # two groups separated only along y: 'xz' mode cannot separate them,
    # 'y' (or 'xyz') can
    g1 = rng.randn(80, 3) * 0.1
    g2 = g1 + [0, 10.0, 0]
    xyz = np.vstack([g1, g2])
    labels_y = cluster_points(xyz, 2, mode="xyz", method="kmeans")
    assert len(np.unique(labels_y[:80])) == 1  # g1 uniform
    assert len(np.unique(labels_y[80:])) == 1  # g2 uniform
    assert labels_y[0] != labels_y[100]
    labels_xz = cluster_points(xyz, 2, mode="xz", method="kmeans")
    # with y masked, the two groups are identical point sets -> same labels
    np.testing.assert_array_equal(labels_xz[:80], labels_xz[80:160])


def build_recmap(rng, n_points=60, n_imgs=5, desc_dim=16):
    """Tiny synthetic reconstruction + per-image features."""
    m = RecMap()
    m.cameras = {
        1: ColmapCamera(1, "SIMPLE_PINHOLE", 320, 240,
                        np.array([300.0, 160.0, 120.0]))
    }
    xyz = rng.randn(n_points, 3) + [0, 0, 5.0]
    # ground-truth distinctive descriptor per point
    pdesc = rng.randn(n_points, desc_dim).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=-1, keepdims=True)

    images = {}
    feats = {}
    tracks = [[] for _ in range(n_points)]
    for i in range(n_imgs):
        sel = rng.choice(n_points, size=40, replace=False)
        kpts = rng.rand(40, 2) * [320, 240]
        descs = pdesc[sel] + rng.randn(40, desc_dim).astype(np.float32) * 0.05
        descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
        name = f"im{i}.png"
        images[i + 1] = ColmapImage(
            i + 1,
            np.array([1.0, 0, 0, 0]),
            np.zeros(3),
            1,
            name,
            kpts,
            (sel + 100).astype(np.int64),
        )
        feats[name] = {
            "keypoints": kpts,
            "scores": rng.rand(40),
            "descriptors": descs,
            "image_size": np.array([240, 320]),
        }
        for k, p in enumerate(sel):
            tracks[p].append((i + 1, k))

    points3D = {}
    for p in range(n_points):
        iids = np.array([t[0] for t in tracks[p]], np.int32)
        p2ds = np.array([t[1] for t in tracks[p]], np.int64)
        points3D[p + 100] = ColmapPoint3D(
            p + 100, xyz[p], np.zeros(3, np.uint8), 0.3, iids, p2ds
        )
    m.images = images
    m.points3D = {
        p: v for p, v in points3D.items() if len(v.image_ids) > 0
    }

    class DictSource:
        def get(self, name):
            return feats[name]

        def names(self):
            return list(feats)

    return m, DictSource(), pdesc


def test_descriptor_assignment_picks_representative(rng):
    m, src, pdesc = build_recmap(rng)
    out = m.assign_point3D_descriptors(src)
    assert len(out) == len(m.points3D)
    # the chosen descriptor must be close to the gt point descriptor
    sims = []
    for pid, d in out.items():
        gt = pdesc[pid - 100]
        sims.append(float(d @ gt))
    assert np.mean(sims) > 0.95


def test_vrf_selection_covers_segments(rng):
    m, src, _ = build_recmap(rng)
    labels = np.zeros(len(m.points3D), int)
    pids = sorted(m.points3D.keys())
    labels[len(pids) // 2 :] = 1
    m.load_segmentation_data(
        {"id": np.asarray(pids), "label": labels}
    )
    vrf = m.create_virtual_frames(min_obs=1, n_vrf=3, min_cover_ratio=0.9)
    assert set(vrf.keys()) == {0, 1}
    for sid, recs in vrf.items():
        assert len(recs) >= 1
        rec = recs[0]
        assert rec["image_id"] in m.images
        assert len(rec["original_points3d"]) > 0
        assert "covisible_frame_ids" in rec


def test_compression_reduces_points_and_writes_model(rng, tmp_path):
    m, src, _ = build_recmap(rng)
    pids = sorted(m.points3D.keys())
    m.load_segmentation_data(
        {"id": np.asarray(pids), "label": np.zeros(len(pids), int)}
    )
    vrf = m.create_virtual_frames(min_obs=1, n_vrf=1)
    descs = m.assign_point3D_descriptors(src)
    cams, images, points = m.compress_map_by_projection(
        vrf, descs, radius=40.0, save_dir=str(tmp_path / "compress")
    )
    assert len(points) <= len(m.points3D)
    assert len(images) >= 1
    # round-trips through the compressed reader
    from pram_tpu.maps.colmap_io import read_compressed_model

    c2, i2, p2 = read_compressed_model(str(tmp_path / "compress"), ".bin")
    assert set(p2.keys()) == set(points.keys())
    loaded_desc = np.load(
        tmp_path / "compress" / "point3D_desc.npy", allow_pickle=True
    )[()]
    assert set(loaded_desc.keys()) == set(points.keys())


def test_grid_sparsification():
    from pram_tpu.mapping.recmap import _sparsify_by_grid

    uvs = np.array([[1.0, 1.0], [2.0, 2.0], [50.0, 50.0]])
    scores = np.array([1.0, 5.0, 2.0])
    keep = _sparsify_by_grid(100, 100, uvs, scores, radius=20.0)
    # first two share a cell -> keep the higher-score one (idx 1) + idx 2
    assert set(keep.tolist()) == {1, 2}
