"""Fused RANSAC scoring kernel vs geometry/pnp.py:_count_inliers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.geometry.camera import Camera
from pram_tpu.geometry.pnp import _count_inliers
from pram_tpu.ops.pnp_pallas import ransac_score_pallas, score_supported


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def _random_poses(rng, k):
    from pram_tpu.geometry.rotations import so3_exp

    w = jnp.asarray(rng.randn(k, 3).astype(np.float32) * 0.3)
    R = so3_exp(w)
    t = jnp.asarray(rng.randn(k, 3).astype(np.float32) * 0.5 + [0, 0, 5.0])
    return R, t


@pytest.mark.parametrize("n", [128, 512])
@pytest.mark.parametrize("distortion", [False, True])
def test_score_matches_count_inliers(rng, n, distortion):
    k = 64
    params = np.array(
        [400.0, 410.0, 320.0, 240.0, 0, 0, 0, 0], np.float32
    )
    if distortion:
        params[4:8] = [0.05, -0.01, 0.001, -0.002]
    cam = Camera(jnp.asarray(params), jnp.asarray([640.0, 480.0]))
    R, t = _random_poses(rng, k)

    xyz = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 2.0)
    # project some points through pose 0 so real inliers exist
    uv = jnp.asarray(
        (rng.rand(n, 2) * [640, 480]).astype(np.float32)
    )
    from pram_tpu.geometry.camera import project

    proj0, _ = project(cam, R[0], t[0], xyz)
    take = rng.rand(n) < 0.5
    uv = jnp.where(jnp.asarray(take)[:, None], proj0, uv)
    mask = jnp.asarray(rng.rand(n) > 0.2)

    ref, _ = _count_inliers(
        cam, R, t, xyz[None], uv[None], mask[None], 8.0
    )
    got = ransac_score_pallas(
        cam.params, R, t, xyz, uv, mask, 8.0, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_score_vmaps_over_batch(rng):
    k, n, b = 16, 128, 3
    cam_p = jnp.asarray(
        np.stack(
            [[400.0, 400.0, 320.0, 240.0, 0, 0, 0, 0]] * b
        ).astype(np.float32)
    )
    R, t = _random_poses(rng, b * k)
    R = R.reshape(b, k, 3, 3)
    t = t.reshape(b, k, 3)
    xyz = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 2)
    uv = jnp.asarray((rng.rand(b, n, 2) * [640, 480]).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.3)

    cam = Camera(cam_p, jnp.broadcast_to(jnp.asarray([640.0, 480.0]), (b, 2)))
    ref, _ = jax.vmap(
        lambda p, R_, t_, x, u, m: _count_inliers(
            Camera(p, jnp.asarray([640.0, 480.0])), R_, t_,
            x[None], u[None], m[None], 6.0,
        )
    )(cam_p, R, t, xyz, uv, mask)

    got = jax.vmap(
        lambda p, R_, t_, x, u, m: ransac_score_pallas(
            p, R_, t_, x, u, m, 6.0, interpret=True
        )
    )(cam_p, R, t, xyz, uv, mask)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_score_point_tiling(rng):
    """N big enough to force multi-block accumulation."""
    import pram_tpu.ops.pnp_pallas as pp

    k, n = 8, 512
    cam = Camera(
        jnp.asarray([400.0, 400.0, 320.0, 240.0, 0, 0, 0, 0]),
        jnp.asarray([640.0, 480.0]),
    )
    R, t = _random_poses(rng, k)
    xyz = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 2)
    uv = jnp.asarray((rng.rand(n, 2) * [640, 480]).astype(np.float32))
    mask = jnp.asarray(rng.rand(n) > 0.2)
    ref, _ = _count_inliers(cam, R, t, xyz[None], uv[None], mask[None], 8.0)

    orig = pp._pick_nblock
    pp._pick_nblock = lambda k_, n_: 128  # force 4 blocks
    try:
        got = ransac_score_pallas(
            cam.params, R, t, xyz, uv, mask, 8.0, interpret=True
        )
    finally:
        pp._pick_nblock = orig
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_score_supported_gate():
    assert score_supported(512, 512)
    assert score_supported(1024, 10240)
    assert not score_supported(7, 512)  # unaligned pose count


def _xla_polish_tail(cam, R_best, t_best, xyz, uv, mask, inlier_threshold,
                     min_inliers, gn_iters, lo_rounds):
    """The exact XLA refinement tail of geometry/pnp.py:ransac_pnp."""
    from pram_tpu.geometry.pnp import gauss_newton_pose

    def lo_round(carry, _):
        R, t = carry
        cnt, inl = _count_inliers(cam, R, t, xyz, uv, mask, inlier_threshold)
        w = inl.astype(uv.dtype)
        Rn, tn = gauss_newton_pose(cam, R, t, xyz, uv, w, num_iters=gn_iters)
        cn, _ = _count_inliers(cam, Rn, tn, xyz, uv, mask, inlier_threshold)
        better = cn >= cnt
        return (jnp.where(better, Rn, R), jnp.where(better, tn, t)), None

    (R_best, t_best), _ = jax.lax.scan(
        lo_round, (R_best, t_best), None, length=lo_rounds
    )
    for s in (1.0, 0.5, 0.25):
        th_r = jnp.maximum(inlier_threshold * s, 2.0)
        cnt_r, inl_r = _count_inliers(cam, R_best, t_best, xyz, uv, mask, th_r)
        Rp, tp = gauss_newton_pose(
            cam, R_best, t_best, xyz, uv, inl_r.astype(uv.dtype),
            num_iters=gn_iters, huber_delta=jnp.maximum(th_r / 2.0, 1.0),
        )
        cnt_new, _ = _count_inliers(cam, Rp, tp, xyz, uv, mask, th_r)
        okp = (cnt_r >= min_inliers) & (cnt_new >= cnt_r)
        R_best = jnp.where(okp, Rp, R_best)
        t_best = jnp.where(okp, tp, t_best)
    num_inl, inl = _count_inliers(
        cam, R_best, t_best, xyz, uv, mask, inlier_threshold
    )
    return R_best, t_best, num_inl, inl


def test_gn_polish_matches_xla_tail(rng):
    """Fused polish kernel vs the XLA refinement tail on a noisy scene."""
    from pram_tpu.geometry.camera import project
    from pram_tpu.geometry.rotations import so3_exp
    from pram_tpu.ops.pnp_pallas import gn_polish_pallas

    n = 256
    cam = Camera(
        jnp.asarray([450.0, 460.0, 320.0, 240.0, 0.02, -0.004, 0, 0]),
        jnp.asarray([640.0, 480.0]),
    )
    R_gt = np.asarray(so3_exp(jnp.asarray([0.2, -0.1, 0.3])))
    t_gt = np.array([0.3, -0.2, 5.0], np.float32)
    xyz = rng.randn(n, 3).astype(np.float32) * 2.0
    uv_clean, _ = project(cam, jnp.asarray(R_gt), jnp.asarray(t_gt),
                          jnp.asarray(xyz))
    uv = np.asarray(uv_clean) + rng.randn(n, 2).astype(np.float32) * 0.5
    out = rng.rand(n) < 0.3  # outliers
    uv[out] += rng.randn(out.sum(), 2) * 80
    mask = jnp.asarray(rng.rand(n) > 0.1)

    # perturbed starting pose
    R0 = np.asarray(so3_exp(jnp.asarray([0.21, -0.12, 0.29]))).astype(
        np.float32
    )
    t0 = t_gt + np.array([0.05, -0.03, 0.08], np.float32)

    args = (
        cam, jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(xyz),
        jnp.asarray(uv), mask,
    )
    R_ref, t_ref, n_ref, inl_ref = _xla_polish_tail(
        *args, 8.0, 12, 5, 1
    )
    R_got, t_got, n_got, inl_got = gn_polish_pallas(
        cam.params, jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(xyz),
        jnp.asarray(uv), mask, 8.0, 12, gn_iters=5, lo_rounds=1,
        interpret=True,
    )
    # same consensus (counts may differ by a point or two at the gate edge
    # due to f32 reduction-order differences)
    assert abs(int(n_got) - int(n_ref)) <= 2
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(R_got), np.asarray(R_ref),
                               atol=2e-3)
    # and the polished pose is close to ground truth
    np.testing.assert_allclose(np.asarray(t_got), t_gt, atol=2e-2)


def test_gn_polish_vmap(rng):
    """Batched use (the localizer vmaps ransac_pnp over frames)."""
    from pram_tpu.geometry.camera import project
    from pram_tpu.geometry.rotations import so3_exp
    from pram_tpu.ops.pnp_pallas import gn_polish_pallas

    b, n = 3, 128
    cam_p = jnp.asarray(
        [[400.0, 400.0, 320.0, 240.0, 0, 0, 0, 0]] * b, jnp.float32
    )
    R_gt = so3_exp(jnp.asarray(rng.randn(b, 3).astype(np.float32) * 0.2))
    t_gt = jnp.asarray(
        rng.randn(b, 3).astype(np.float32) * 0.3 + [0, 0, 5.0]
    )
    xyz = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 2)
    cam = Camera(cam_p, jnp.broadcast_to(jnp.asarray([640.0, 480.0]), (b, 2)))
    uv, _ = jax.vmap(lambda p, R, t, x: project(
        Camera(p, jnp.asarray([640.0, 480.0])), R, t, x
    ))(cam_p, R_gt, t_gt, xyz)
    uv = uv + jnp.asarray(rng.randn(b, n, 2).astype(np.float32) * 0.3)
    mask = jnp.ones((b, n), bool)

    # small perturbation: a start too far off correctly fails the
    # min-inlier gate and is left unrefined (same as the XLA tail)
    R0 = so3_exp(jnp.asarray(rng.randn(b, 3).astype(np.float32) * 0.02))
    R0 = jnp.einsum("bij,bjk->bik", R0, R_gt)
    t0 = t_gt + 0.05

    Rg, tg, ng, inlg = jax.vmap(
        lambda p, R_, t_, x, u, m: gn_polish_pallas(
            p, R_, t_, x, u, m, 8.0, 12, gn_iters=4, lo_rounds=1,
            interpret=True,
        )
    )(cam_p, R0, t0, xyz, uv, mask)
    assert Rg.shape == (b, 3, 3) and ng.shape == (b,)
    np.testing.assert_allclose(np.asarray(tg), np.asarray(t_gt), atol=2e-2)
