"""On-device batched PnP: P3P minimal solver + RANSAC + Gauss-Newton.

TPU-native replacement for pycolmap.absolute_pose_estimation (reference call
sites: localization/singlemap3d.py:168,324,454, localization/tracker.py:211,
localization/pose_estimator.py:213,338,452). Instead of a sequential CPU
LO-RANSAC, the whole estimator is one fixed-shape compiled program:

- K hypotheses are drawn at once (masked Gumbel top-3 sampling of valid
  correspondences — distinct indices, invalid matches never sampled);
- each hypothesis is solved by Grunert's P3P (quartic via Ferrari's closed
  form + Newton polishing, all in f32 real arithmetic — no eigensolvers,
  TPU-friendly) yielding up to 4 poses;
- all 4K candidate poses are scored against *all* correspondences with one
  batched projection (masked inlier counting, cheirality check);
- the best pose is refined by damped Gauss-Newton on Huber-weighted inliers
  (the "LO" step of LO-RANSAC), re-scoring after refinement.

Everything vmaps over a leading query-batch axis for trajectory streaming.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pram_tpu.geometry.camera import Camera, distort, project
from pram_tpu.geometry.rotations import hat, so3_exp

# ---------------------------------------------------------------------------
# polynomial solvers (real f32 arithmetic + Newton polishing)
# ---------------------------------------------------------------------------


def _cbrt(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def solve_cubic_largest_real(a: jax.Array, b: jax.Array, c: jax.Array):
    """Largest real root of z^3 + a z^2 + b z + c (batched, all-real f32).

    Uses Cardano for the single-real-root case and the trigonometric method
    for the three-real-root case.
    """
    p = b - a * a / 3.0
    q = 2.0 * a**3 / 27.0 - a * b / 3.0 + c
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # one real root (disc > 0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_single = _cbrt(-q / 2.0 + sq) + _cbrt(-q / 2.0 - sq)

    # three real roots (disc <= 0): t_k = 2 sqrt(-p/3) cos(phi/3 - 2 pi k/3)
    m = jnp.sqrt(jnp.maximum(-p / 3.0, 1e-30))
    arg = jnp.clip(3.0 * q / (2.0 * p) / jnp.where(m == 0, 1e-30, m), -1.0, 1.0)
    phi = jnp.arccos(arg)
    # largest root is at k = 0
    t_triple = 2.0 * m * jnp.cos(phi / 3.0)

    t = jnp.where(disc > 0, t_single, t_triple)
    return t - a / 3.0


def solve_quartic(coeffs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Real roots of a quartic c4 x^4 + ... + c0 (batched over leading dims).

    Args:
      coeffs: ``[..., 5]`` = (c4, c3, c2, c1, c0).

    Returns:
      roots ``[..., 4]`` (Newton-polished; invalid slots arbitrary) and a bool
      validity mask ``[..., 4]``.
    """
    c4, c3, c2, c1, c0 = (coeffs[..., i] for i in range(5))
    bad_lead = jnp.abs(c4) < 1e-12
    c4s = jnp.where(bad_lead, 1.0, c4)
    p = c3 / c4s
    q = c2 / c4s
    r = c1 / c4s
    s = c0 / c4s

    # depressed quartic y^4 + A y^2 + B y + C, x = y - p/4
    A = q - 3.0 * p * p / 8.0
    B = r - p * q / 2.0 + p**3 / 8.0
    C = s - p * r / 4.0 + p * p * q / 16.0 - 3.0 * p**4 / 256.0

    # resolvent cubic U^3 + 2A U^2 + (A^2 - 4C) U - B^2 = 0; U = u^2
    U = solve_cubic_largest_real(2.0 * A, A * A - 4.0 * C, -B * B)
    U = jnp.maximum(U, 0.0)
    u = jnp.sqrt(U)
    usafe = jnp.where(u < 1e-8, 1e-8, u)
    v = (A + U - B / usafe) / 2.0
    w = (A + U + B / usafe) / 2.0

    # y^2 + u y + v = 0 and y^2 - u y + w = 0
    d1 = u * u - 4.0 * v
    d2 = u * u - 4.0 * w
    s1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    s2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    y = jnp.stack(
        [
            (-u + s1) / 2.0,
            (-u - s1) / 2.0,
            (u + s2) / 2.0,
            (u - s2) / 2.0,
        ],
        axis=-1,
    )
    valid = jnp.stack([d1 >= 0, d1 >= 0, d2 >= 0, d2 >= 0], axis=-1)
    valid &= ~bad_lead[..., None]
    x = y - (p / 4.0)[..., None]

    # Newton-polish on the original quartic (f32 accuracy recovery)
    def body(x, _):
        f = (((c4[..., None] * x + c3[..., None]) * x + c2[..., None]) * x
             + c1[..., None]) * x + c0[..., None]
        df = ((4.0 * c4[..., None] * x + 3.0 * c3[..., None]) * x
              + 2.0 * c2[..., None]) * x + c1[..., None]
        step = f / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
        return x - jnp.clip(step, -1e3, 1e3), None

    x, _ = jax.lax.scan(body, x, None, length=3)
    return x, valid


# ---------------------------------------------------------------------------
# P3P (Grunert / Haralick) + Horn alignment
# ---------------------------------------------------------------------------


def _poly_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Multiply polynomials given as coefficient arrays (highest degree first)."""
    la, lb = a.shape[-1], b.shape[-1]
    out = jnp.zeros(a.shape[:-1] + (la + lb - 1,), a.dtype)
    for i in range(la):
        for j in range(lb):
            out = out.at[..., i + j].add(a[..., i] * b[..., j])
    return out


def _pad_poly(a: jax.Array, length: int) -> jax.Array:
    pad = length - a.shape[-1]
    return jnp.concatenate(
        [jnp.zeros(a.shape[:-1] + (pad,), a.dtype), a], axis=-1
    )


def p3p_grunert(
    bearings: jax.Array, points: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Grunert's P3P: 3 bearings + 3 world points -> up to 4 poses.

    Args:
      bearings: ``[..., 3, 3]`` unit bearing vectors f1, f2, f3.
      points: ``[..., 3, 3]`` world points P1, P2, P3.

    Returns:
      (R ``[..., 4, 3, 3]``, t ``[..., 4, 3]``, valid ``[..., 4]``) with
      x_cam = R x_world + t.
    """
    f1, f2, f3 = bearings[..., 0, :], bearings[..., 1, :], bearings[..., 2, :]
    P1, P2, P3 = points[..., 0, :], points[..., 1, :], points[..., 2, :]

    a2 = jnp.sum((P2 - P3) ** 2, -1)
    b2 = jnp.sum((P1 - P3) ** 2, -1)
    c2 = jnp.sum((P1 - P2) ** 2, -1)
    b2s = jnp.where(b2 < 1e-12, 1e-12, b2)

    cos_a = jnp.sum(f2 * f3, -1)
    cos_b = jnp.sum(f1 * f3, -1)
    cos_g = jnp.sum(f1 * f2, -1)

    A = (a2 - c2) / b2s
    Q = c2 / b2s

    # u = N(v) / D(v):
    #   N(v) = (A-1) v^2 - 2 A cos_b v + (A+1)
    #   D(v) = 2 (cos_g - v cos_a)
    # quartic: N^2 - 2 cos_g N D + D^2 (1 - Q(v)) = 0,
    #   Q(v) = (c^2/b^2)(v^2 - 2 cos_b v + 1)
    N = jnp.stack([A - 1.0, -2.0 * A * cos_b, A + 1.0], axis=-1)
    D = jnp.stack([-2.0 * cos_a, 2.0 * cos_g], axis=-1)
    Qp = jnp.stack([Q, -2.0 * Q * cos_b, Q], axis=-1)

    NN = _poly_mul(N, N)  # deg 4 -> 5 coeffs
    ND = _poly_mul(N, D)  # deg 3 -> 4 coeffs
    one_minus_Q = jnp.stack(
        [-Qp[..., 0], -Qp[..., 1], 1.0 - Qp[..., 2]], axis=-1
    )
    DD1mQ = _poly_mul(_poly_mul(D, D), one_minus_Q)  # deg 4 -> 5

    quartic = (
        NN
        - 2.0 * cos_g[..., None] * _pad_poly(ND, 5)
        + DD1mQ
    )

    v, v_valid = solve_quartic(quartic)  # [..., 4]

    # recover u, depths
    Nv = (N[..., 0:1] * v + N[..., 1:2]) * v + N[..., 2:3]
    Dv = D[..., 0:1] * v + D[..., 1:2]
    u = Nv / jnp.where(jnp.abs(Dv) < 1e-8, 1e-8, Dv)

    denom = 1.0 + v * v - 2.0 * v * cos_b[..., None]
    s1 = jnp.sqrt(
        b2[..., None] / jnp.where(denom < 1e-12, 1e-12, denom)
    )
    s2 = u * s1
    s3 = v * s1
    valid = v_valid & (s1 > 0) & (s2 > 0) & (s3 > 0) & (denom > 1e-12)

    # camera-frame points per solution: [..., 4, 3, 3]
    Xc = jnp.stack(
        [
            s1[..., None] * f1[..., None, :],
            s2[..., None] * f2[..., None, :],
            s3[..., None] * f3[..., None, :],
        ],
        axis=-2,
    )
    Pw = jnp.broadcast_to(points[..., None, :, :], Xc.shape)

    # exact rigid alignment of a minimal (noise-free by construction) point
    # triple via orthonormal triads — no SVD/eig (those are slow batched on
    # TPU); degenerate (collinear) triples are masked out
    R, t, tri_ok = _triad_align(Pw, Xc)
    return R, t, valid & tri_ok


def _triad_align(
    src: jax.Array, dst: jax.Array, eps: float = 1e-9
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact rigid transform aligning 3-point sets via orthonormal triads.

    Builds a Gram-Schmidt frame from (P2-P1, P3-P1) in both coordinate
    systems; R maps the source frame onto the destination frame. Exact when
    the point sets are congruent (P3P solutions are, by construction).

    Args:
      src, dst: ``[..., 3, 3]`` (three points, row-wise).

    Returns:
      (R ``[..., 3, 3]``, t ``[..., 3]``, valid ``[...]`` — False for
      (near-)collinear triples).
    """

    def frame(p):
        u1 = p[..., 1, :] - p[..., 0, :]
        u2 = p[..., 2, :] - p[..., 0, :]
        n1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
        e1 = u1 / jnp.maximum(n1, eps)
        u2p = u2 - jnp.sum(u2 * e1, axis=-1, keepdims=True) * e1
        n2 = jnp.linalg.norm(u2p, axis=-1, keepdims=True)
        e2 = u2p / jnp.maximum(n2, eps)
        e3 = jnp.cross(e1, e2)
        E = jnp.stack([e1, e2, e3], axis=-1)  # columns
        ok = (n1[..., 0] > eps) & (n2[..., 0] > eps)
        return E, ok

    Ew, ok_w = frame(src)
    Ec, ok_c = frame(dst)
    R = Ec @ jnp.swapaxes(Ew, -1, -2)
    t = dst[..., 0, :] - jnp.einsum("...ij,...j->...i", R, src[..., 0, :])
    return R, t, ok_w & ok_c


def horn_align(src: jax.Array, dst: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Rigid transform (R, t) minimizing ||R src + t - dst|| (SVD Procrustes).

    Args:
      src, dst: ``[..., N, 3]`` corresponding point sets.
    """
    cs = jnp.mean(src, axis=-2, keepdims=True)
    cd = jnp.mean(dst, axis=-2, keepdims=True)
    H = jnp.einsum("...ni,...nj->...ij", src - cs, dst - cd)
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(V @ Ut)
    S = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), H.shape).copy()
    S = S.at[..., 2, 2].set(det)
    R = V @ S @ Ut
    t = cd[..., 0, :] - jnp.einsum("...ij,...j->...i", R, cs[..., 0, :])
    return R, t


def solve_spd_6x6(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for symmetric positive-definite 6x6 A (batched).

    Fully unrolled Cholesky + triangular solves: ~100 scalar ops that XLA
    vectorizes across the batch. (jnp.linalg.solve's pivoted LU takes minutes
    to *compile* on TPU for this use inside scans — this is the fast path for
    the Gauss-Newton normal equations.)
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


# ---------------------------------------------------------------------------
# RANSAC + Gauss-Newton
# ---------------------------------------------------------------------------


class PnPResult(NamedTuple):
    """Estimated world-to-camera pose with inlier statistics.

    Attributes:
      R: ``[..., 3, 3]``; t: ``[..., 3]``;
      num_inliers: ``[...]`` int32; inliers: ``[..., N]`` bool;
      success: ``[...]`` bool (enough inliers found).
    """

    R: jax.Array
    t: jax.Array
    num_inliers: jax.Array
    inliers: jax.Array
    success: jax.Array


def _sample_triplets(key, mask, num_hyps):
    """Gumbel top-3 sampling of distinct valid indices, ``[num_hyps, 3]``."""
    n = mask.shape[-1]
    g = jax.random.gumbel(key, (num_hyps, n))
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, 3)
    return idx


def _count_inliers(camera, R, t, xyz, uv, mask, threshold):
    """Masked inlier count + mask for poses ``[..., 3, 3]`` over all points."""
    proj, z = project(camera, R, t, xyz)
    err2 = jnp.sum((proj - uv) ** 2, axis=-1)
    ok = (err2 < threshold**2) & (z > 1e-6) & mask
    return jnp.sum(ok.astype(jnp.int32), axis=-1), ok


def gauss_newton_pose(
    camera: Camera,
    R0: jax.Array,
    t0: jax.Array,
    xyz: jax.Array,
    uv: jax.Array,
    weights: jax.Array,
    num_iters: int = 8,
    huber_delta: float = 3.0,
    damping: float = 1e-4,
) -> Tuple[jax.Array, jax.Array]:
    """Damped Gauss-Newton refinement of a world-to-camera pose.

    Minimizes Huber-weighted reprojection error over ``xyz``/``uv`` with
    per-point ``weights`` (0 excludes a point). Left-multiplicative se(3)
    parametrization: R <- exp(w) R, t <- exp(w) t + dt.
    """
    fx = camera.params[..., 0]
    fy = camera.params[..., 1]

    def step(carry, _):
        R, t = carry
        xc = jnp.einsum("...ij,...nj->...ni", R, xyz) + t[..., None, :]
        z = xc[..., 2]
        zsafe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        xyn = xc[..., :2] / zsafe[..., None]
        xyd = distort(camera, xyn)
        proj = jnp.stack(
            [
                xyd[..., 0] * fx[..., None] + camera.params[..., 2][..., None],
                xyd[..., 1] * fy[..., None] + camera.params[..., 3][..., None],
            ],
            axis=-1,
        )
        r = proj - uv  # [..., N, 2]

        # Huber + validity weights (distortion Jacobian approximated by the
        # pinhole term — exact for the pinhole models, near-exact for the
        # mild radial distortion of the supported models)
        rn = jnp.linalg.norm(r, axis=-1)
        huber = jnp.where(rn <= huber_delta, 1.0, huber_delta / jnp.maximum(rn, 1e-9))
        wgt = weights * huber * (z > 1e-6)

        # d proj / d xc
        x, y = xc[..., 0], xc[..., 1]
        fxz = fx[..., None] / zsafe
        fyz = fy[..., None] / zsafe
        J_pc = jnp.stack(
            [
                jnp.stack([fxz, jnp.zeros_like(fxz), -fxz * x / zsafe], -1),
                jnp.stack([jnp.zeros_like(fyz), fyz, -fyz * y / zsafe], -1),
            ],
            axis=-2,
        )  # [..., N, 2, 3]
        # d xc / d [w, dt] = [-hat(xc), I]
        J_w = -hat(xc)  # [..., N, 3, 3]
        J = jnp.concatenate(
            [
                jnp.einsum("...nij,...njk->...nik", J_pc, J_w),
                J_pc,
            ],
            axis=-1,
        )  # [..., N, 2, 6]

        w2 = wgt[..., None]
        JtJ = jnp.einsum("...nik,...nil->...kl", J * w2[..., None], J)
        Jtr = jnp.einsum("...nik,...ni->...k", J * w2[..., None], r)
        JtJ = JtJ + damping * jnp.eye(6, dtype=JtJ.dtype)
        delta = -solve_spd_6x6(JtJ, Jtr)
        dw, dt = delta[..., :3], delta[..., 3:]
        Rd = so3_exp(dw)
        Rn = Rd @ R
        tn = jnp.einsum("...ij,...j->...i", Rd, t) + dt
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=num_iters)
    return R, t


@partial(
    jax.jit,
    static_argnames=("num_hypotheses", "gn_iters", "lo_rounds"),
)
def ransac_pnp(
    key: jax.Array,
    camera: Camera,
    uv: jax.Array,
    xyz: jax.Array,
    mask: jax.Array,
    *,
    inlier_threshold: float = 12.0,
    num_hypotheses: int = 256,
    min_inliers: int = 8,
    gn_iters: int = 8,
    lo_rounds: int = 2,
) -> PnPResult:
    """Fixed-shape LO-RANSAC PnP for one query (vmap for a batch).

    Args:
      key: PRNG key.
      camera: packed camera (no batch dims here).
      uv: ``[N, 2]`` observed pixels.
      xyz: ``[N, 3]`` corresponding world points.
      mask: ``[N]`` bool validity of correspondences.
      inlier_threshold: reprojection inlier radius in pixels (the reference
        uses pycolmap's default 12px, sfm_scripts/reconstruct_7scenes.sh).
      num_hypotheses: minimal samples drawn (all solved & scored in parallel).
      min_inliers: success gate (reference verify_and_update uses
        localization config min_inliers, multimap3d.py:294).
    """
    n = uv.shape[0]
    from pram_tpu.geometry.camera import pixel_to_bearing

    bearings = pixel_to_bearing(camera, uv)  # [N, 3]

    idx = _sample_triplets(key, mask, num_hypotheses)  # [K, 3]
    f = bearings[idx]  # [K, 3, 3]
    P = xyz[idx]
    R_all, t_all, valid = p3p_grunert(f, P)  # [K, 4, ...]

    Rf = R_all.reshape(-1, 3, 3)  # [4K, 3, 3]
    tf = t_all.reshape(-1, 3)
    vf = valid.reshape(-1)

    # hypothesis scoring: fused VMEM kernel on TPU (the XLA broadcast
    # materializes [4K, N, 3] intermediates in HBM — ops/pnp_pallas.py)
    from pram_tpu.ops.pnp_pallas import ransac_score_pallas, score_supported
    from pram_tpu.utils.pallas_gate import tpu_pallas_ok

    if tpu_pallas_ok() and score_supported(
        Rf.shape[0], n
    ):
        counts = ransac_score_pallas(
            camera.params, Rf, tf, xyz, uv, mask, inlier_threshold
        )
    else:
        counts, _ = _count_inliers(
            camera, Rf, tf, xyz[None], uv[None], mask[None],
            inlier_threshold,
        )
    counts = jnp.where(vf, counts, -1)
    best = jnp.argmax(counts)
    R_best = Rf[best]
    t_best = tf[best]

    # LO + graduated polish: one fused kernel on TPU (the XLA chain below
    # is ~20 GN iterations of tiny ops with HBM round trips between them)
    if tpu_pallas_ok():
        from pram_tpu.ops.pnp_pallas import gn_polish_pallas

        R_p, t_p, num_inl, inliers = gn_polish_pallas(
            camera.params, R_best, t_best, xyz, uv, mask,
            inlier_threshold, min_inliers,
            gn_iters=gn_iters, lo_rounds=lo_rounds,
        )
        return PnPResult(R_p, t_p, num_inl, inliers, num_inl >= min_inliers)

    # local optimization: GN on current inliers, recount, repeat
    def lo_round(carry, _):
        R, t = carry
        cnt, inl = _count_inliers(
            camera, R, t, xyz, uv, mask, inlier_threshold
        )
        w = inl.astype(uv.dtype)
        Rn, tn = gauss_newton_pose(
            camera, R, t, xyz, uv, w, num_iters=gn_iters
        )
        cn, _ = _count_inliers(camera, Rn, tn, xyz, uv, mask, inlier_threshold)
        better = cn >= cnt
        R = jnp.where(better, Rn, R)
        t = jnp.where(better, tn, t)
        return (R, t), None

    (R_best, t_best), _ = jax.lax.scan(
        lo_round, (R_best, t_best), None, length=lo_rounds
    )

    # polish: graduated threshold shrink (full -> 1/2 -> 1/4, floored at
    # 2px), re-fitting on each round's inliers. Correspondences that are
    # merely inside the loose gate scatter; the true consensus has sub-pixel
    # residuals, so each shrink drops more contaminants and the fit walks
    # back onto the true pose — the fixed-shape analogue of pycolmap's
    # converged LM refinement of its final inlier set (the reference's
    # refinement_options at singlemap3d.py:454-460).
    # acceptance is judged at the round's OWN (tighter) threshold: a pose
    # dragged by loose-gate contaminants keeps slightly more loose inliers
    # than the true pose (it splits the difference), so a loose-count gate
    # would lock the drag in; the tight count strictly prefers the true
    # consensus (sub-pixel residuals).
    for s in (1.0, 0.5, 0.25):
        th_r = jnp.maximum(inlier_threshold * s, 2.0)
        cnt_r, inl_r = _count_inliers(
            camera, R_best, t_best, xyz, uv, mask, th_r
        )
        Rp, tp = gauss_newton_pose(
            camera, R_best, t_best, xyz, uv, inl_r.astype(uv.dtype),
            num_iters=gn_iters,
            huber_delta=jnp.maximum(th_r / 2.0, 1.0),
        )
        cnt_new, _ = _count_inliers(camera, Rp, tp, xyz, uv, mask, th_r)
        ok_polish = (cnt_r >= min_inliers) & (cnt_new >= cnt_r)
        R_best = jnp.where(ok_polish, Rp, R_best)
        t_best = jnp.where(ok_polish, tp, t_best)

    num_inl, inliers = _count_inliers(
        camera, R_best, t_best, xyz, uv, mask, inlier_threshold
    )
    success = num_inl >= min_inliers
    return PnPResult(R_best, t_best, num_inl, inliers, success)
