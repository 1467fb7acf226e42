"""Native feature-pack sampler tests: build, invariants, throughput sanity."""

import numpy as np
import pytest

from pram_tpu.data.feature_pack import FeaturePack, build_native
from pram_tpu.data.scene import SceneDataset
from tests.test_data import build_disk_scene


@pytest.fixture(scope="module")
def native_lib():
    try:
        return build_native()
    except Exception as e:  # no g++ available
        pytest.skip(f"native build unavailable: {e}")


def test_build_and_sample(tmp_path, rng, native_lib):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=64, train=True)
    pack = FeaturePack.build(ds, with_descriptors=True)
    assert pack.n_images == len(ds)
    assert pack.desc_dim == 32

    batch = pack.sample_batch(
        np.array([0, 1, 2, 3]), nfeatures=64, min_inliers=8, max_inliers=48,
        seed=7,
    )
    assert batch["keypoints"].shape == (4, 64, 2)
    assert batch["gt_seg"].shape == (4, 64)
    assert batch["seg_descriptors"].shape == (4, 64, 32)
    # labels valid
    assert batch["gt_seg"].min() >= 0
    assert batch["gt_seg"].max() < ds.n_class
    # sampled keypoints (non-padded) come from the source image's table
    for b, img in enumerate([0, 1, 2, 3]):
        lo, hi = pack.offsets[img], pack.offsets[img + 1]
        src = {tuple(x) for x in pack.kpts[lo:hi].tolist()}
        hits = sum(
            tuple(x) in src for x in batch["keypoints"][b].tolist()
        )
        assert hits >= 32  # most tokens are direct copies (rest jittered)


def test_sampler_determinism_and_seeds(tmp_path, rng, native_lib):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=32, train=True)
    pack = FeaturePack.build(ds)
    idx = np.array([0, 1])
    a = pack.sample_batch(idx, 32, seed=3)
    b = pack.sample_batch(idx, 32, seed=3)
    np.testing.assert_array_equal(a["keypoints"], b["keypoints"])
    c = pack.sample_batch(idx, 32, seed=4)
    assert not np.array_equal(a["keypoints"], c["keypoints"])


def test_sampler_inlier_bounds(tmp_path, rng, native_lib):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=96, train=True)
    pack = FeaturePack.build(ds)
    batch = pack.sample_batch(
        np.arange(6), 96, min_inliers=4, max_inliers=40, seed=0
    )
    for b in range(6):
        seg = batch["gt_seg"][b]
        # per-image source inlier count bounds the non-padded inliers; with
        # padding by labeled copies inliers can exceed max_inliers only via
        # the jitter fill — sanity: some inliers and some outliers exist
        assert (seg > 0).sum() > 0


def test_pack_save_load_roundtrip(tmp_path, rng, native_lib):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=32, train=True)
    pack = FeaturePack.build(ds, with_descriptors=True)
    fn = str(tmp_path / "pack.npz")
    pack.save(fn)
    pack2 = FeaturePack.load(fn, mmap=False)
    np.testing.assert_array_equal(pack.offsets, pack2.offsets)
    np.testing.assert_allclose(pack.kpts, pack2.kpts)
    a = pack.sample_batch(np.array([0]), 32, seed=1)
    b = pack2.sample_batch(np.array([0]), 32, seed=1)
    np.testing.assert_array_equal(a["keypoints"], b["keypoints"])


def test_multithreaded_matches_single(tmp_path, rng, native_lib):
    spec = build_disk_scene(tmp_path, rng)
    ds = SceneDataset(spec, nfeatures=48, train=True)
    pack = FeaturePack.build(ds)
    idx = np.arange(6)
    a = pack.sample_batch(idx, 48, seed=9, n_threads=1)
    b = pack.sample_batch(idx, 48, seed=9, n_threads=4)
    np.testing.assert_array_equal(a["keypoints"], b["keypoints"])
    np.testing.assert_array_equal(a["gt_seg"], b["gt_seg"])


def test_pack_loader_multiscene(tmp_path, rng, native_lib):
    from pram_tpu.data.pack_loader import PackLoader

    spec1 = build_disk_scene(tmp_path, rng, name="pa", n_cluster=3)
    spec2 = build_disk_scene(tmp_path, rng, name="pb", n_cluster=4)
    ds1 = SceneDataset(spec1, nfeatures=32, train=True)
    ds2 = SceneDataset(spec2, nfeatures=32, train=True)
    p1 = FeaturePack.build(ds1)
    p2 = FeaturePack.build(ds2)
    loader = PackLoader([p1, p2], [3, 4], batch_size=4, nfeatures=32, seed=1)
    assert loader.n_class == 8
    batches = list(loader.epoch(0))
    assert len(batches) == (len(ds1) + len(ds2)) // 4
    seen = np.concatenate([b["gt_seg"].ravel() for b in batches])
    # labels live in the global space [0, 8)
    assert seen.min() >= 0 and seen.max() < 8
    # scene A contributes labels 1..3 and scene B 4..7
    assert set(np.unique(seen)) - {0} <= set(range(1, 8))
    b0 = batches[0]
    assert b0["norm_keypoints"].shape == (4, 32, 2)
    # determinism across epochs with same seed
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(b0["keypoints"], again[0]["keypoints"])
