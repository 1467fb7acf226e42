"""Rendered textured world: render/lift geometric consistency, dot
projection occlusion handling, and map building from a (fake) extractor.

The on-hardware end of this machinery (real SFD2 through the Pallas
extraction kernels) is exercised by bench.py's image-level recall guard and
scripts/train_rendered.py; these tests pin the geometry with an exact
synthetic extractor so they run fast on CPU."""

import numpy as np
import pytest

from pram_tpu.maps.rendered import (
    RenderedScene,
    build_rendered_scene,
    make_world,
    query_pose,
    ref_poses,
)
from pram_tpu.maps.synthetic import _look_at

W, H = 320, 240
CAM = (250.0, 250.0, W / 2, H / 2)


@pytest.fixture(scope="module")
def world():
    return make_world(np.random.RandomState(0))


def test_render_shape_and_coverage(world):
    R, t = ref_poses(4)[1]
    img = world.render(R, t, CAM, W, H)
    assert img.shape == (H, W, 3)
    assert img.min() >= 0 and img.max() <= 1
    # the corner view should be (almost) fully textured, not background
    assert (img[..., 0] != 0.5).mean() > 0.95
    # textured surface has real contrast
    assert img.std() > 0.05


def test_lift_render_roundtrip(world):
    """Lifting a pixel and reprojecting it returns the same pixel."""
    R, t = ref_poses(4)[2]
    rng = np.random.RandomState(1)
    uv = np.stack(
        [rng.uniform(5, W - 5, 64), rng.uniform(5, H - 5, 64)], -1
    )
    xyz, pid, lu, lv, ok = world.lift(uv, R, t, CAM)
    assert ok.mean() > 0.9
    xc = xyz[ok] @ R.T + t
    proj = np.stack(
        [
            xc[:, 0] / xc[:, 2] * CAM[0] + CAM[2],
            xc[:, 1] / xc[:, 2] * CAM[1] + CAM[3],
        ],
        -1,
    )
    np.testing.assert_allclose(proj, uv[ok], atol=1e-6)
    # lifted points lie exactly on their plane
    for i, pl in enumerate(world.planes):
        sel = ok & (pid == i)
        if sel.any():
            d = (xyz[sel] - pl.p0[None]) @ pl.normal
            np.testing.assert_allclose(d, 0, atol=1e-9)


def test_lift_picks_nearest_plane(world):
    """Rays hitting multiple planes take the first (nearest) hit."""
    R, t = ref_poses(4)[0]
    C = -R.T @ t
    uv = np.stack(
        [np.linspace(5, W - 5, 200), np.full(200, H / 2)], -1
    )
    xyz, pid, _, _, ok = world.lift(uv, R, t, CAM)
    dist = np.linalg.norm(xyz[ok] - C[None], axis=-1)
    # verify no other plane is hit strictly earlier along each ray
    d = (xyz[ok] - C[None]) / dist[:, None]
    for j, pl in enumerate(world.planes):
        n = pl.normal
        denom = d @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            th = ((pl.p0 - C) @ n) / denom
        rel = (C[None] + th[:, None] * d) - pl.p0[None]
        lu = (rel @ pl.eu) / pl.su
        lv = (rel @ pl.ev) / pl.sv
        hits = (
            (th > 0.1) & np.isfinite(th)
            & (lu >= 0) & (lu < 1) & (lv >= 0) & (lv < 1)
        )
        assert not (hits & (th < dist - 1e-6)).any()


def test_project_dots_roundtrip(world):
    R, t = query_pose(np.random.RandomState(2))
    uv, xyz, ids = world.project_dots(R, t, CAM, W, H)
    assert len(uv) > 50
    assert len(np.unique(ids)) == len(ids)
    # projected dots lift back to their own world position
    lx, _, _, _, ok = world.lift(uv, R, t, CAM)
    assert ok.all()
    np.testing.assert_allclose(lx, xyz, atol=1e-3)
    # dot ids are stable across views: common ids = same world points
    R2, t2 = query_pose(np.random.RandomState(3))
    uv2, xyz2, ids2 = world.project_dots(R2, t2, CAM, W, H)
    common, i1, i2 = np.intersect1d(ids, ids2, return_indices=True)
    assert len(common) > 20
    np.testing.assert_allclose(xyz[i1], xyz2[i2], atol=1e-12)


def test_seg_class_partition(world):
    rng = np.random.RandomState(4)
    pid = rng.randint(0, 3, 100)
    u = rng.rand(100)
    v = rng.rand(100)
    cls = world.seg_class(pid, u, v)
    assert cls.min() >= 0 and cls.max() < world.n_seg_classes()
    # same cell -> same class; adjacent plane -> disjoint ranges
    gu, gv = world.seg_grid
    assert set(cls[pid == 0]) <= set(range(gu * gv))
    assert set(cls[pid == 1]) <= set(range(gu * gv, 2 * gu * gv))


def _grid_extractor(n_kpts=96):
    """Fake extractor: a fixed pixel grid per view with random descriptors —
    build_rendered_scene lifts them with its OWN poses, so the structural
    invariants (on-plane points, frames, segments) hold exactly."""
    gx, gy = 12, 8
    xs = np.linspace(16, W - 16, gx)
    ys = np.linspace(16, H - 16, gy)
    grid = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)[:n_kpts]

    def extract_np(images):
        b = images.shape[0]
        rng = np.random.RandomState(9)
        kx = np.broadcast_to(
            grid.astype(np.float32), (b,) + grid.shape
        ).copy()
        ks = np.ones((b, grid.shape[0]), np.float32)
        kd = rng.randn(b, grid.shape[0], 128).astype(np.float32)
        kd /= np.linalg.norm(kd, axis=-1, keepdims=True)
        km = np.ones((b, grid.shape[0]), bool)
        return kx, ks, kd, km

    return extract_np


def test_build_rendered_scene_structure(world):
    scene = build_rendered_scene(
        _grid_extractor(), np.random.RandomState(0),
        width=W, height=H, n_ref=6, kp_per_ref=128, max_ref_points=512,
    )
    assert isinstance(scene, RenderedScene)
    pm = scene.map
    assert pm.point_xyz.shape[0] > 100
    assert pm.frame_point_idx.shape[0] == 6
    assert pm.n_class == scene.world.n_seg_classes() + 1
    # every packed point's seg label is in range
    seg = pm.point_seg[pm.point_seg >= 0]
    assert seg.max() < scene.world.n_seg_classes()
    # ref_views record matches the packed frames
    assert len(scene.ref_views) == 6
    # lifted points actually lie on world planes
    for rv in scene.ref_views[:2]:
        xyz = rv["xyz"]
        dists = np.stack(
            [np.abs((xyz - pl.p0[None]) @ pl.normal)
             for pl in scene.world.planes]
        ).min(0)
        assert dists.max() < 1e-9


def test_render_query_pose_is_exact(world):
    rng = np.random.RandomState(7)
    scene = RenderedScene(
        world=world, cam=CAM, width=W, height=H, map=None, ref_views=[]
    )
    q = scene.render_query(rng)
    assert q["image"].shape == (H, W, 3)
    # qvec/R consistency
    from pram_tpu.maps.packed import _qvec2rotmat_np

    np.testing.assert_allclose(_qvec2rotmat_np(q["qvec"]), q["R"], atol=1e-6)
