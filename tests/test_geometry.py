"""Geometry tests: rotations, cameras, P3P, RANSAC PnP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.geometry.camera import (
    CameraModel,
    make_camera,
    pixel_to_bearing,
    project,
)
from pram_tpu.geometry.pnp import (
    gauss_newton_pose,
    p3p_grunert,
    ransac_pnp,
    solve_quartic,
)
from pram_tpu.geometry.rotations import (
    compute_pose_error,
    qvec2rotmat,
    rotmat2qvec,
    so3_exp,
)


def random_rotation(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return q


def test_qvec_roundtrip(rng):
    for _ in range(10):
        q = random_rotation(rng)
        R = np.asarray(qvec2rotmat(jnp.asarray(q, jnp.float32)))
        # orthonormal, det 1
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99
        q2 = np.asarray(rotmat2qvec(jnp.asarray(R)))
        # signed comparison (up to global quaternion sign): abs() would hide
        # a transposed-matrix bug
        if np.dot(q2, q) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-4)
        # and the roundtrip must reproduce R itself
        np.testing.assert_allclose(
            np.asarray(qvec2rotmat(jnp.asarray(q2, jnp.float32))), R, atol=1e-4
        )


def test_qvec2rotmat_matches_colmap_formula(rng):
    # independent check against scipy-free quaternion->matrix formula
    q = random_rotation(rng)
    w, x, y, z = q
    R_ref = np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )
    np.testing.assert_allclose(
        np.asarray(qvec2rotmat(jnp.asarray(q, jnp.float32))), R_ref, atol=1e-6
    )


def test_so3_exp_properties(rng):
    w = rng.randn(5, 3).astype(np.float32) * 0.5
    R = np.asarray(so3_exp(jnp.asarray(w)))
    for i in range(5):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        # angle equals |w|
        angle = np.arccos(np.clip((np.trace(R[i]) - 1) / 2, -1, 1))
        np.testing.assert_allclose(angle, np.linalg.norm(w[i]), atol=1e-5)
    # tiny rotation branch
    R0 = np.asarray(so3_exp(jnp.zeros((3,))))
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-7)


def test_pose_error_zero_and_known(rng):
    q = jnp.asarray(random_rotation(rng), jnp.float32)
    t = jnp.asarray(rng.randn(3), jnp.float32)
    qe, te = compute_pose_error(q, t, q, t)
    assert float(qe) < 1e-2
    assert float(te) < 1e-5


def test_camera_project_bearing_roundtrip(rng):
    cam = make_camera(CameraModel.PINHOLE, [500.0, 480.0, 320.0, 240.0], 640, 480)
    q = random_rotation(rng)
    R = jnp.asarray(qvec2rotmat(jnp.asarray(q, jnp.float32)))
    t = jnp.asarray([0.1, -0.2, 4.0], jnp.float32)
    xyz = jnp.asarray(rng.randn(30, 3).astype(np.float32))
    uv, z = project(cam, R, t, xyz)
    assert np.all(np.asarray(z) > 0)
    # bearings of projections align with camera-frame points
    f = np.asarray(pixel_to_bearing(cam, uv))
    xc = np.asarray(xyz) @ np.asarray(R).T + np.asarray(t)
    xc /= np.linalg.norm(xc, axis=-1, keepdims=True)
    np.testing.assert_allclose(f, xc, atol=1e-5)


def test_camera_radial_distortion_roundtrip(rng):
    cam = make_camera(
        CameraModel.SIMPLE_RADIAL, [500.0, 320.0, 240.0, -0.05], 640, 480
    )
    from pram_tpu.geometry.camera import distort, undistort

    xy = jnp.asarray((rng.rand(50, 2) - 0.5).astype(np.float32))
    d = distort(cam, xy)
    u = undistort(cam, d)
    np.testing.assert_allclose(np.asarray(u), np.asarray(xy), atol=1e-5)


def test_solve_quartic_known_roots(rng):
    # (x-1)(x-2)(x-3)(x-4) = x^4 -10x^3 +35x^2 -50x +24
    coeffs = jnp.asarray([[1.0, -10.0, 35.0, -50.0, 24.0]])
    roots, valid = solve_quartic(coeffs)
    r = np.sort(np.asarray(roots[0])[np.asarray(valid[0])])
    np.testing.assert_allclose(r, [1, 2, 3, 4], atol=1e-3)

    # two real roots: (x^2+1)(x-1)(x-5) = x^4 -6x^3 +6x^2 -6x +5
    coeffs = jnp.asarray([[1.0, -6.0, 6.0, -6.0, 5.0]])
    roots, valid = solve_quartic(coeffs)
    r = np.sort(np.asarray(roots[0])[np.asarray(valid[0])])
    np.testing.assert_allclose(r, [1, 5], atol=1e-3)


def _synthetic_scene(rng, n=50, noise=0.0, outlier_frac=0.0):
    cam = make_camera(CameraModel.PINHOLE, [500.0, 500.0, 320.0, 240.0], 640, 480)
    q = random_rotation(rng)
    R = np.asarray(qvec2rotmat(jnp.asarray(q, jnp.float32)))
    t = np.array([0.2, -0.1, 3.5], np.float32)
    # points in front of the camera: sample in camera frame, lift to world
    xc = np.stack(
        [
            (rng.rand(n) - 0.5) * 2.0,
            (rng.rand(n) - 0.5) * 1.5,
            rng.rand(n) * 4.0 + 1.0,
        ],
        -1,
    ).astype(np.float32)
    xyz = (xc - t) @ R  # R^T (xc - t)
    uv, z = project(cam, jnp.asarray(R), jnp.asarray(t), jnp.asarray(xyz))
    uv = np.asarray(uv)
    if noise > 0:
        uv = uv + rng.randn(n, 2).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] = rng.rand(n_out, 2) * [640, 480]
    return cam, R, t, xyz.astype(np.float32), uv.astype(np.float32)


def test_p3p_exact(rng):
    cam, R, t, xyz, uv = _synthetic_scene(rng, n=3)
    f = pixel_to_bearing(cam, jnp.asarray(uv))
    Rs, ts, valid = p3p_grunert(f[None], jnp.asarray(xyz)[None])
    Rs, ts, valid = np.asarray(Rs[0]), np.asarray(ts[0]), np.asarray(valid[0])
    best = np.inf
    for i in range(4):
        if not valid[i]:
            continue
        err = np.abs(Rs[i] - R).max() + np.abs(ts[i] - t).max()
        best = min(best, err)
    assert best < 1e-2, f"no P3P solution near ground truth (best={best})"


def test_gauss_newton_converges(rng):
    cam, R, t, xyz, uv = _synthetic_scene(rng, n=60, noise=0.0)
    # perturb the pose
    dw = rng.randn(3).astype(np.float32) * 0.03
    R0 = np.asarray(so3_exp(jnp.asarray(dw))) @ R
    t0 = t + rng.randn(3).astype(np.float32) * 0.05
    w = jnp.ones((60,), jnp.float32)
    Rn, tn = gauss_newton_pose(
        cam, jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(xyz), jnp.asarray(uv), w
    )
    assert np.abs(np.asarray(Rn) - R).max() < 1e-3
    assert np.abs(np.asarray(tn) - t).max() < 1e-3


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.5])
def test_ransac_pnp_with_outliers(rng, outlier_frac):
    cam, R, t, xyz, uv = _synthetic_scene(
        rng, n=100, noise=0.5, outlier_frac=outlier_frac
    )
    mask = jnp.ones((100,), bool)
    res = ransac_pnp(
        jax.random.PRNGKey(0),
        cam,
        jnp.asarray(uv),
        jnp.asarray(xyz),
        mask,
        inlier_threshold=4.0,
        num_hypotheses=128,
    )
    assert bool(res.success)
    n_expected = int(100 * (1 - outlier_frac))
    assert int(res.num_inliers) >= n_expected * 0.9
    assert np.abs(np.asarray(res.R) - R).max() < 5e-3
    assert np.abs(np.asarray(res.t) - t).max() < 2e-2


def test_ransac_pnp_respects_mask(rng):
    cam, R, t, xyz, uv = _synthetic_scene(rng, n=80, noise=0.3)
    # corrupt the masked-out half completely; solver must still succeed
    uv2 = uv.copy()
    uv2[40:] = 0.0
    mask = np.zeros(80, bool)
    mask[:40] = True
    res = ransac_pnp(
        jax.random.PRNGKey(1),
        cam,
        jnp.asarray(uv2),
        jnp.asarray(xyz),
        jnp.asarray(mask),
        inlier_threshold=4.0,
        num_hypotheses=128,
    )
    assert bool(res.success)
    assert np.abs(np.asarray(res.t) - t).max() < 2e-2
    # masked-out points are never counted as inliers
    assert not np.asarray(res.inliers)[40:].any()
