"""COLMAP model I/O tests: binary/text/compressed roundtrips + byte layout."""

import struct

import numpy as np

from pram_tpu.maps.colmap_io import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
    read_compressed_model,
    read_model,
    write_compressed_model,
    write_model,
)


def make_model(rng):
    cameras = {
        1: ColmapCamera(1, "SIMPLE_PINHOLE", 640, 480,
                        np.array([500.0, 320.0, 240.0])),
        2: ColmapCamera(2, "PINHOLE", 1024, 768,
                        np.array([800.0, 810.0, 512.0, 384.0])),
    }
    images = {}
    for i in range(1, 4):
        n = rng.randint(3, 8)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        images[i] = ColmapImage(
            i,
            q,
            rng.randn(3),
            1 + (i % 2),
            f"seq/frame-{i:06d}.color.png",
            rng.rand(n, 2) * 640,
            rng.randint(-1, 10, n).astype(np.int64),
        )
    points = {}
    for i in range(5):
        tl = rng.randint(2, 5)
        points[i + 100] = ColmapPoint3D(
            i + 100,
            rng.randn(3),
            rng.randint(0, 255, 3).astype(np.uint8),
            float(rng.rand()),
            rng.randint(1, 4, tl).astype(np.int32),
            rng.randint(0, 7, tl).astype(np.int64),
        )
    return cameras, images, points


def assert_models_equal(m1, m2, compressed=False):
    c1, i1, p1 = m1
    c2, i2, p2 = m2
    assert c1.keys() == c2.keys()
    for k in c1:
        assert c1[k].model == c2[k].model
        assert (c1[k].width, c1[k].height) == (c2[k].width, c2[k].height)
        np.testing.assert_allclose(c1[k].params, c2[k].params)
    assert i1.keys() == i2.keys()
    for k in i1:
        np.testing.assert_allclose(i1[k].qvec, i2[k].qvec, atol=1e-12)
        np.testing.assert_allclose(i1[k].tvec, i2[k].tvec, atol=1e-12)
        assert i1[k].name == i2[k].name
        assert i1[k].camera_id == i2[k].camera_id
        np.testing.assert_array_equal(i1[k].point3D_ids, i2[k].point3D_ids)
        if not compressed:
            np.testing.assert_allclose(i1[k].xys, i2[k].xys, atol=1e-12)
    assert p1.keys() == p2.keys()
    for k in p1:
        np.testing.assert_allclose(p1[k].xyz, p2[k].xyz, atol=1e-12)
        np.testing.assert_array_equal(p1[k].rgb, p2[k].rgb)
        np.testing.assert_array_equal(p1[k].image_ids, p2[k].image_ids)
        if not compressed:
            np.testing.assert_array_equal(p1[k].point2D_idxs, p2[k].point2D_idxs)


def test_binary_roundtrip(rng, tmp_path):
    m = make_model(rng)
    write_model(*m, str(tmp_path), ".bin")
    m2 = read_model(str(tmp_path), ".bin")
    assert_models_equal(m, m2)


def test_text_roundtrip(rng, tmp_path):
    m = make_model(rng)
    write_model(*m, str(tmp_path), ".txt")
    m2 = read_model(str(tmp_path), ".txt")
    assert_models_equal(m, m2)


def test_compressed_roundtrip(rng, tmp_path):
    m = make_model(rng)
    write_compressed_model(*m, str(tmp_path))
    m2 = read_compressed_model(str(tmp_path), ".bin")
    assert_models_equal(m, m2, compressed=True)
    # compressed images drop the xys payload
    for img in m2[1].values():
        assert img.xys.size == 0


def test_cameras_binary_byte_layout(tmp_path):
    """The exact COLMAP byte layout (read_write_model.py:143-153 reference)."""
    cam = ColmapCamera(7, "PINHOLE", 64, 48, np.array([10.0, 11.0, 32.0, 24.0]))
    from pram_tpu.maps.colmap_io import write_cameras_binary

    p = str(tmp_path / "cameras.bin")
    write_cameras_binary({7: cam}, p)
    buf = open(p, "rb").read()
    assert struct.unpack_from("<Q", buf, 0)[0] == 1
    cam_id, model_id, w, h = struct.unpack_from("<iiQQ", buf, 8)
    assert (cam_id, model_id, w, h) == (7, 1, 64, 48)
    params = np.frombuffer(buf, "<f8", 4, 32)
    np.testing.assert_array_equal(params, [10.0, 11.0, 32.0, 24.0])
    assert len(buf) == 32 + 32
