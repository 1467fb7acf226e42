"""RANSAC PnP stress suite: documented robustness envelope (VERDICT r4 #6).

The reference localizes through pycolmap's LO-RANSAC
(`/root/reference/localization/singlemap3d.py:168`,
``pycolmap.absolute_pose_estimation``); pycolmap is not installable in
this environment, so solver-tolerance parity cannot be A/B'd directly.
This suite is the substitute evidence: instead of a single recall=1.0 on
a cooperative scene, it sweeps the solver to its breaking point —

  - outlier fraction 30/50/70/80% (reference RANSAC regime: pycolmap
    default max_error 12px, min_inlier_ratio 0.01),
  - near-planar scenes (all points on one tilted plane — P3P's classic
    stress; pose-ambiguity territory),
  - low-parallax scenes (depth range 2.5% of distance — weak-perspective
    limit, GN Jacobian near rank-deficient in z),
  - a noise x inlier-threshold grid,
  - the bench's shallow schedule (gn_iters=5, lo_rounds=1; bench.py) vs
    the library default (8, 2) ON THE SAME hard scenes, so the schedule
    the fps number uses is certified where it holds and its divergence
    point is pinned.

Each config runs TRIALS independent random scenes through ONE vmapped
``ransac_pnp`` call (fixed shapes: one compile per schedule). Recall is
judged at (5 cm, 5 deg) on camera CENTER error — the bench's own localizer
metric — with scene units read as meters (depths 1-8 m, indoor scale).

`scripts/stress_pnp.py` prints the full grid as a markdown table (the
ROUND_NOTES artifact); the assertions here pin the envelope's load-bearing
cells so regressions fail CI, with slack below the measured curve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.geometry.camera import CameraModel, make_camera, project
from pram_tpu.geometry.pnp import ransac_pnp
from pram_tpu.geometry.rotations import qvec2rotmat

TRIALS = 16
N_PTS = 128


def random_rotation_mat(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    return np.asarray(qvec2rotmat(jnp.asarray(q, jnp.float32)))


def make_trials(
    rng,
    n_trials=TRIALS,
    n=N_PTS,
    geometry="general",
    noise=0.5,
    outlier_frac=0.0,
):
    """Batch of synthetic localization problems with known poses.

    Returns (camera, uv [S,N,2], xyz [S,N,3], R_gt [S,3,3], t_gt [S,3]).
    Points are sampled in the CAMERA frame (guaranteed in front, filling
    the image) and lifted to world via the ground-truth pose; outliers are
    uniform random pixels (the worst case: no structure to reject by).
    """
    cam = make_camera(
        CameraModel.PINHOLE, [500.0, 500.0, 320.0, 240.0], 640, 480
    )
    uvs, xyzs, Rs, ts = [], [], [], []
    for _ in range(n_trials):
        R = random_rotation_mat(rng)
        t = np.array(
            [rng.randn() * 0.3, rng.randn() * 0.3, 3.5 + rng.rand()],
            np.float32,
        )
        u = (rng.rand(n) - 0.5) * 2.0
        v = (rng.rand(n) - 0.5) * 1.5
        if geometry == "general":
            z = rng.rand(n) * 4.0 + 1.0
            xc = np.stack([u * z / 2.5, v * z / 2.5, z], -1)
        elif geometry == "planar":
            # all points on one tilted plane in the camera frame:
            # z = z0 + a*x + b*y  (tilt up to ~20 deg)
            a, b = rng.randn(2) * 0.2
            z0 = 2.5 + rng.rand()
            # solve z = z0 + a*(u*z/2.5) + b*(v*z/2.5) for z
            denom = 1.0 - (a * u + b * v) / 2.5
            z = z0 / np.maximum(denom, 0.5)
            xc = np.stack([u * z / 2.5, v * z / 2.5, z], -1)
        elif geometry == "low_parallax":
            # depth range 0.2 at distance 8: 2.5% relative depth
            z = 7.9 + rng.rand(n) * 0.2
            xc = np.stack([u * z / 2.5, v * z / 2.5, z], -1)
        else:
            raise ValueError(geometry)
        xc = xc.astype(np.float32)
        xyz = (xc - t) @ R  # world points: R^T (xc - t)
        uv, _ = project(cam, jnp.asarray(R), jnp.asarray(t), jnp.asarray(xyz))
        uv = np.asarray(uv)
        if noise > 0:
            uv = uv + rng.randn(n, 2).astype(np.float32) * noise
        n_out = int(round(n * outlier_frac))
        if n_out:
            uv[:n_out] = rng.rand(n_out, 2) * [640, 480]
        uvs.append(uv.astype(np.float32))
        xyzs.append(xyz.astype(np.float32))
        Rs.append(R)
        ts.append(t)
    return (
        cam,
        np.stack(uvs),
        np.stack(xyzs),
        np.stack(Rs).astype(np.float32),
        np.stack(ts),
    )


def run_batch(
    cam, uv, xyz, *, threshold=4.0, num_hyps=256, gn_iters=8, lo_rounds=2,
    seed=0,
):
    """One vmapped ransac_pnp over all trials (single compile per schedule)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), uv.shape[0])
    fn = jax.vmap(
        lambda k, uv1, x1: ransac_pnp(
            k, cam, uv1, x1, jnp.ones(uv1.shape[0], bool),
            inlier_threshold=threshold, num_hypotheses=num_hyps,
            gn_iters=gn_iters, lo_rounds=lo_rounds,
        )
    )
    return fn(jnp.asarray(keys), jnp.asarray(uv), jnp.asarray(xyz))


def pose_errors(res, R_gt, t_gt):
    """(rotation deg [S], camera-center m [S]) vs ground truth."""
    R = np.asarray(res.R, np.float64)
    t = np.asarray(res.t, np.float64)
    tr = np.einsum("sij,sij->s", R, R_gt.astype(np.float64))
    ang = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    C = -np.einsum("sji,sj->si", R, t)
    C_gt = -np.einsum("sji,sj->si", R_gt.astype(np.float64), t_gt)
    cen = np.linalg.norm(C - C_gt, axis=-1)
    return ang, cen


def recall_5cm5deg(res, R_gt, t_gt):
    ang, cen = pose_errors(res, R_gt, t_gt)
    ok = (ang < 5.0) & (cen < 0.05) & np.asarray(res.success)
    return float(ok.mean())


@pytest.fixture
def rng():
    return np.random.RandomState(7)


@pytest.mark.parametrize("outlier_frac", [0.3, 0.5, 0.7])
def test_outlier_sweep_full_recall(rng, outlier_frac):
    """Up to 70% outliers: every trial localizes to (5cm, 5deg).

    At 70%, P(clean triplet) = 0.3^3 = 2.7%; 256 hypotheses give a >99.9%
    chance of at least one, and LO + graduated polish recover the exact
    consensus. This is the regime the full pipeline actually operates in
    (GML match precision >= 0.95 on the bench guard => <5% outliers).
    """
    cam, uv, xyz, R_gt, t_gt = make_trials(
        rng, noise=0.5, outlier_frac=outlier_frac
    )
    res = run_batch(cam, uv, xyz)
    assert recall_5cm5deg(res, R_gt, t_gt) == 1.0


def test_outlier_breaking_point(rng):
    """80% outliers is the documented breaking point at K=256.

    P(clean triplet) = 0.2^3 = 0.8% => P(none in 256) ~ 13%: recall must
    degrade below 1.0 *by sampling math*, not implementation weakness.
    Doubling K to 512 halves the miss exponent (P(none) ~ 1.7%) and the
    suite pins that recovery. Measured curve (scripts/stress_pnp.py,
    seed-deterministic): K=256 -> ~0.88, K=512 -> 1.0.
    """
    cam, uv, xyz, R_gt, t_gt = make_trials(rng, noise=0.5, outlier_frac=0.8)
    r256 = recall_5cm5deg(run_batch(cam, uv, xyz, num_hyps=256), R_gt, t_gt)
    r512 = recall_5cm5deg(run_batch(cam, uv, xyz, num_hyps=512), R_gt, t_gt)
    assert r256 >= 0.7  # slack under the measured ~0.88
    assert r512 >= r256
    assert r512 >= 0.9


@pytest.mark.parametrize("outlier_frac", [0.0, 0.5])
def test_near_planar(rng, outlier_frac):
    """All scene points on one tilted plane: P3P's ambiguity stress.

    Planar configurations admit a second (reflected) pose with near-equal
    reprojection on the plane; the inlier count over the full point set
    breaks the tie and GN converges to the true pose. pycolmap handles
    this via its P3P + LO; recall must not drop vs the general case.
    """
    cam, uv, xyz, R_gt, t_gt = make_trials(
        rng, geometry="planar", noise=0.5, outlier_frac=outlier_frac
    )
    res = run_batch(cam, uv, xyz)
    assert recall_5cm5deg(res, R_gt, t_gt) == 1.0


def test_low_parallax(rng):
    """Depth range 2.5% of distance (weak perspective) at 8 m.

    The z-translation column of the GN Jacobian is nearly parallel to the
    focal-length gauge here, so center error inflates along the optical
    axis; the (5cm,5deg) gate at 8 m is strict. The suite pins recall at
    the measured level and bounds rotation tightly (rotation stays
    observable even when z-depth is weak).
    """
    cam, uv, xyz, R_gt, t_gt = make_trials(
        rng, geometry="low_parallax", noise=0.5
    )
    res = run_batch(cam, uv, xyz)
    ang, cen = pose_errors(res, R_gt, t_gt)
    assert np.asarray(res.success).all()
    assert float(np.max(ang)) < 0.5  # rotation stays sharp
    # center error inflates along the optical axis but stays sub-decimeter
    assert recall_5cm5deg(res, R_gt, t_gt) >= 0.8


@pytest.mark.parametrize(
    "noise,threshold,expect_full",
    [
        (0.5, 4.0, True),
        (1.0, 4.0, True),
        (2.0, 8.0, True),
        (2.0, 12.0, True),  # pycolmap's default 12px gate
        # threshold at 2 sigma: the loose gate rejects ~13% of true
        # inliers per count, the expected weak cell — MEASURED recall
        # still 1.0 (the graduated polish's 2px floor re-fits on the
        # tight consensus; scripts/stress_pnp.py), asserted at a
        # conservative floor so seed drift can't flake the suite
        (2.0, 4.0, False),
    ],
)
def test_noise_threshold_grid(rng, noise, threshold, expect_full):
    cam, uv, xyz, R_gt, t_gt = make_trials(
        rng, noise=noise, outlier_frac=0.3
    )
    res = run_batch(cam, uv, xyz, threshold=threshold)
    r = recall_5cm5deg(res, R_gt, t_gt)
    if expect_full:
        assert r == 1.0, (noise, threshold, r)
    else:
        # under-thresholded: inlier sets shrink and the pose fit sits on
        # a biased subsample; recall may drop but the solver must not
        # collapse (>= half the trials still localize)
        assert r >= 0.5, (noise, threshold, r)


def test_shallow_schedule_matches_default_in_operating_regime(rng):
    """bench.py's gn_iters=5/lo_rounds=1 vs the default 8/2.

    In the pipeline's operating regime (<=50% outliers, <=1px noise) the
    two schedules must agree at recall 1.0 — this is what licenses the
    bench to run the shallow schedule for fps.
    """
    cam, uv, xyz, R_gt, t_gt = make_trials(rng, noise=1.0, outlier_frac=0.5)
    r_shallow = recall_5cm5deg(
        run_batch(cam, uv, xyz, gn_iters=5, lo_rounds=1), R_gt, t_gt
    )
    r_default = recall_5cm5deg(run_batch(cam, uv, xyz), R_gt, t_gt)
    assert r_shallow == 1.0
    assert r_default == 1.0


def test_schedules_diverge_at_the_edge(rng):
    """The edge where schedule divergence was EXPECTED: 75% outliers +
    2px noise. Measured (scripts/stress_pnp.py): shallow 0.938 = default
    0.938 — the graduated polish, not LO depth, does the recovering, so
    even past the operating envelope the bench schedule gives nothing
    away. The suite pins default >= shallow (a second LO round may only
    help) and a floor under the measured level.
    """
    cam, uv, xyz, R_gt, t_gt = make_trials(rng, noise=2.0, outlier_frac=0.75)
    res_sh = run_batch(cam, uv, xyz, threshold=8.0, gn_iters=5, lo_rounds=1)
    res_df = run_batch(cam, uv, xyz, threshold=8.0)
    r_sh = recall_5cm5deg(res_sh, R_gt, t_gt)
    r_df = recall_5cm5deg(res_df, R_gt, t_gt)
    assert r_df >= r_sh
    assert r_df >= 0.6
