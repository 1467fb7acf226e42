"""Offline pipeline smoke tests: extract -> match -> h5 format compatibility."""

import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")


def make_images(tmp_path, rng, n=3, h=96, w=128):
    img_dir = tmp_path / "images"
    os.makedirs(img_dir / "seq")
    names = []
    base = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    for i in range(n):
        # shifted views of the same texture -> matchable features
        img = np.roll(base, shift=i * 4, axis=1)
        name = f"seq/im{i}.png"
        cv2.imwrite(str(img_dir / name), img)
        names.append(name)
    return str(img_dir), names


def test_extract_features_h5_layout(tmp_path, rng):
    from pram_tpu.cli.extract_features import extract_to_h5

    img_dir, names = make_images(tmp_path, rng)
    out = str(tmp_path / "feats.h5")
    extract_to_h5(img_dir, out, conf_name="sfd2")
    with h5py.File(out, "r") as f:
        for name in names:
            g = f[name]
            kp = g["keypoints"][()]
            desc = g["descriptors"][()]
            sc = g["scores"][()]
            size = g["image_size"][()]
            assert kp.ndim == 2 and kp.shape[1] == 2
            assert desc.shape == (128, kp.shape[0])  # hloc [D, N] layout
            assert sc.shape == (kp.shape[0],)
            np.testing.assert_array_equal(size, [128, 96])


def test_match_features_roundtrip(tmp_path, rng):
    from pram_tpu.cli.match_features import match_from_paths
    from pram_tpu.maps.parsers import get_matches

    # synthetic features: image b's descriptors are a permuted copy of a's
    feats_fn = str(tmp_path / "feats.h5")
    n, d = 50, 32
    desc_a = rng.randn(n, d).astype(np.float32)
    desc_a /= np.linalg.norm(desc_a, axis=1, keepdims=True)
    perm = rng.permutation(n)
    with h5py.File(feats_fn, "w") as f:
        for name, desc in (("a.png", desc_a), ("b.png", desc_a[perm])):
            g = f.create_group(name)
            g.create_dataset(
                "keypoints", data=rng.rand(n, 2).astype(np.float32) * 100
            )
            g.create_dataset("scores", data=np.ones(n, np.float32))
            g.create_dataset("descriptors", data=desc.T)
            g.create_dataset("image_size", data=np.array([128, 96]))

    out = str(tmp_path / "matches.h5")
    match_from_paths(
        [("a.png", "b.png")], feats_fn, out, conf_name="NNM", pad_to=64
    )
    matches, scores = get_matches(out, "a.png", "b.png")
    # NN matching of permuted unit descriptors recovers the permutation
    inv = np.empty(n, int)
    inv[perm] = np.arange(n)
    got = {tuple(m) for m in matches.tolist()}
    expected = {(i, int(inv[i])) for i in range(n)}
    assert got == expected

    # re-running skips done pairs without error
    match_from_paths(
        [("a.png", "b.png")], feats_fn, out, conf_name="NNM", pad_to=64
    )


def test_extract_then_match_pipeline(tmp_path, rng):
    from pram_tpu.cli.extract_features import extract_to_h5
    from pram_tpu.cli.match_features import match_from_paths
    from pram_tpu.maps.parsers import get_matches, list_h5_names

    img_dir, names = make_images(tmp_path, rng)
    feats = str(tmp_path / "feats.h5")
    extract_to_h5(img_dir, feats, conf_name="sfd2")
    assert set(list_h5_names(feats)) >= set(names)
    matches_fn = str(tmp_path / "matches.h5")
    match_from_paths(
        [(names[0], names[1])], feats, matches_fn, conf_name="NNM",
        pad_to=4096,
    )
    m, s = get_matches(matches_fn, names[0], names[1])
    assert m.ndim == 2 and m.shape[1] == 2


def test_extract_features_feat_dim_64(tmp_path, rng):
    """--feat_dim 64 routes descriptors through DescriptorCompressor
    (reference main.py:50-63): h5 carries unit-norm 64-d descriptors."""
    from pram_tpu.cli.extract_features import extract_to_h5

    img_dir, names = make_images(tmp_path, rng)
    out = str(tmp_path / "feats64.h5")
    extract_to_h5(img_dir, out, conf_name="sfd2", feat_dim=64)
    with h5py.File(out, "r") as f:
        g = f[names[0]]
        desc = g["descriptors"][()]
        assert desc.shape[0] == 64  # hloc [D, N] layout
        if desc.shape[1]:
            np.testing.assert_allclose(
                np.linalg.norm(desc, axis=0), 1.0, atol=1e-4
            )
