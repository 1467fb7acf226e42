"""Fused RANSAC hypothesis scoring (Pallas, TPU).

ransac_pnp (geometry/pnp.py) scores all 4K P3P candidate poses against all N
correspondences. The XLA formulation broadcasts to ``[4K, N, 3]``
intermediates (camera-frame points, projections, residuals) — at the bench
shape (512 poses x 512 points x batch 32) that is >100 MB of HBM round trips
per stage of the projection chain. This kernel keeps everything in VMEM:

- the pose set is packed as three ``[K, 4]`` matrices (rows of [R | t]), so
  camera-frame coordinates come from three tiny MXU matmuls against the
  homogeneous point matrix ``[4, N]``;
- projection, distortion, thresholding and the per-pose inlier popcount run
  on the ``[K, N]`` tile without ever leaving VMEM;
- the point axis is tiled when K*N*4 bytes would crowd VMEM, with counts
  accumulated across the sequential grid axis.

Numerics match geometry/pnp.py:_count_inliers exactly (same zsafe guard,
same distortion polynomial, same cheirality test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block [K, n_blk] f32 working tile budget
_TILE_BYTES = 4 << 20


def _pick_nblock(k: int, n: int):
    for nb in (4096, 2048, 1024, 512, 256, 128):
        if n % nb == 0 and k * nb * 4 <= _TILE_BYTES:
            return nb
    return None


def score_supported(k: int, n: int) -> bool:
    """Whether the fused scorer can handle this (poses, points) shape
    within the per-block tile budget.

    ADVICE r3: a blockable-N shape whose K makes every ``_pick_nblock``
    tile over budget must NOT silently take the single-[K, N]-block path —
    it is gated to the XLA fallback instead.
    """
    if k % 8 != 0:
        return False
    return _pick_nblock(k, n) is not None or (
        n % 8 == 0 and n * k * 4 <= _TILE_BYTES
    )


def _score_kernel(a_ref, pts_ref, cam_ref, th_ref, out_ref, *, nblocks):
    """One grid step: poses [3, K, 4] x point block [8, nb] -> counts [K, 1].

    pts rows: X, Y, Z, 1, U, V, mask, pad. cam_ref (SMEM): the 8 packed
    camera params (fx, fy, cx, cy, k1, k2, p1, p2).
    """
    j = pl.program_id(0) if nblocks > 1 else 0
    P4 = pts_ref[0, 0:4, :]  # [4, nb]
    xc = jnp.dot(a_ref[0, 0], P4, preferred_element_type=jnp.float32)
    yc = jnp.dot(a_ref[0, 1], P4, preferred_element_type=jnp.float32)
    zc = jnp.dot(a_ref[0, 2], P4, preferred_element_type=jnp.float32)

    zsafe = jnp.where(jnp.abs(zc) < 1e-6, 1e-6, zc)
    x = xc / zsafe
    y = yc / zsafe
    k1 = cam_ref[0, 4]
    k2 = cam_ref[0, 5]
    p1 = cam_ref[0, 6]
    p2 = cam_ref[0, 7]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    u = xd * cam_ref[0, 0] + cam_ref[0, 2]
    v = yd * cam_ref[0, 1] + cam_ref[0, 3]

    du = u - pts_ref[0, 4:5, :]  # broadcast [1, nb]
    dv = v - pts_ref[0, 5:6, :]
    err2 = du * du + dv * dv
    th2 = th_ref[0, 0] * th_ref[0, 0]
    ok = (err2 < th2) & (zc > 1e-6) & (pts_ref[0, 6:7, :] > 0.5)
    cnt = jnp.sum(ok.astype(jnp.int32), axis=1, keepdims=True)  # [K, 1]

    if nblocks == 1:
        out_ref[0] = cnt
    else:
        @pl.when(j == 0)
        def _init():
            out_ref[0] = cnt

        @pl.when(j != 0)
        def _acc():
            out_ref[0] += cnt


def ransac_score_pallas(
    cam_params: jax.Array,  # [8]
    R: jax.Array,  # [K, 3, 3]
    t: jax.Array,  # [K, 3]
    xyz: jax.Array,  # [N, 3]
    uv: jax.Array,  # [N, 2]
    mask: jax.Array,  # [N] bool
    threshold: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Inlier counts ``[K]`` int32 for every pose (vmap for a batch)."""
    k = R.shape[0]
    n = xyz.shape[0]

    # poses as three [K, 4] row matrices [R_i | t_i]
    A = jnp.concatenate([R, t[:, :, None]], axis=-1)  # [K, 3, 4]
    A = jnp.moveaxis(A, 1, 0)  # [3, K, 4]

    # planar homogeneous point matrix [8, N]
    pts = jnp.stack(
        [
            xyz[:, 0], xyz[:, 1], xyz[:, 2], jnp.ones_like(xyz[:, 0]),
            uv[:, 0], uv[:, 1], mask.astype(xyz.dtype),
            jnp.zeros_like(xyz[:, 0]),
        ],
        axis=0,
    )

    nb = _pick_nblock(k, n)
    if nb is None or n % (nb or 1) != 0:
        nb = n  # single block (small-N case)
    nblocks = n // nb

    out = pl.pallas_call(
        functools.partial(_score_kernel, nblocks=nblocks),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 3, k, 4), lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nb), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, k, 1), lambda j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k, 1), jnp.int32),
        interpret=interpret,
    )(
        A[None],
        pts[None],
        cam_params[None].astype(jnp.float32),
        jnp.asarray(threshold, jnp.float32).reshape(1, 1),
    )
    return out[0, :, 0]


# ---------------------------------------------------------------------------
# fused LO/polish chain (lo_rounds x [count+GN+count] + 3 graduated polish
# rounds + final count) — geometry/pnp.py's post-RANSAC refinement collapsed
# into one kernel: ~20 GN iterations of tiny [N]-row math that XLA runs as
# hundreds of separate HBM-visiting ops stay VMEM-resident here.
# ---------------------------------------------------------------------------


def _chol_solve6(A, b):
    """Cholesky solve for a 6x6 system of [1, 1] scalars (unrolled)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _polish_kernel(pose_ref, pts_ref, cam_ref, sc_ref, out_ref, inl_ref,
                   *, gn_iters, lo_rounds, damping):
    """One frame: pose row [1, 16] + points [8, N] -> polished pose row.

    pts rows: X, Y, Z, 1, U, V, mask, pad. sc_ref (SMEM): [threshold,
    min_inliers, 0, 0]. Scalars live as [1, 1] tiles; the 6x6 normal
    equations and the SO(3) update are fully unrolled.
    """
    row = pose_ref[0]  # [1, 16]

    def sc(k):
        return row[0:1, k : k + 1]

    R = [[sc(3 * i + j) for j in range(3)] for i in range(3)]
    t = [sc(9 + i) for i in range(3)]

    X = pts_ref[0, 0:1, :]
    Y = pts_ref[0, 1:2, :]
    Z = pts_ref[0, 2:3, :]
    U = pts_ref[0, 4:5, :]
    V = pts_ref[0, 5:6, :]
    M = pts_ref[0, 6:7, :]

    fx = cam_ref[0, 0]
    fy = cam_ref[0, 1]
    cx = cam_ref[0, 2]
    cy = cam_ref[0, 3]
    k1 = cam_ref[0, 4]
    k2 = cam_ref[0, 5]
    p1 = cam_ref[0, 6]
    p2 = cam_ref[0, 7]
    th_full = sc_ref[0, 0]
    min_inl = sc_ref[0, 1]

    def residuals(R, t):
        xc = R[0][0] * X + R[0][1] * Y + R[0][2] * Z + t[0]
        yc = R[1][0] * X + R[1][1] * Y + R[1][2] * Z + t[1]
        zc = R[2][0] * X + R[2][1] * Y + R[2][2] * Z + t[2]
        zsafe = jnp.where(jnp.abs(zc) < 1e-6, 1e-6, zc)
        xn = xc / zsafe
        yn = yc / zsafe
        r2 = xn * xn + yn * yn
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
        yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
        du = xd * fx + cx - U
        dv = yd * fy + cy - V
        return xc, yc, zc, zsafe, du, dv

    def count(R, t, th):
        _, _, zc, _, du, dv = residuals(R, t)
        ok = ((du * du + dv * dv) < th * th) & (zc > 1e-6) & (M > 0.5)
        return jnp.sum(ok.astype(jnp.float32), axis=1, keepdims=True), ok

    def gn(R, t, w_row, huber_delta):
        for _ in range(gn_iters):
            xc, yc, zc, zsafe, du, dv = residuals(R, t)
            rn = jnp.sqrt(du * du + dv * dv)
            huber = jnp.where(
                rn <= huber_delta, 1.0,
                huber_delta / jnp.maximum(rn, 1e-9),
            )
            wgt = w_row * huber * (zc > 1e-6).astype(jnp.float32)

            fxz = fx / zsafe
            fyz = fy / zsafe
            pu0, pu2 = fxz, -fxz * xc / zsafe
            pv1, pv2 = fyz, -fyz * yc / zsafe
            # J_w = -hat(xc) columns; Ju/Jv = [J_pc @ J_w | J_pc]
            # -hat = [[0, zc, -yc], [-zc, 0, xc], [yc, -xc, 0]]
            Ju = [
                pu2 * yc,
                pu0 * zc - pu2 * xc,
                -pu0 * yc,
                pu0,
                jnp.zeros_like(pu0),
                pu2,
            ]
            Jv = [
                -pv1 * zc + pv2 * yc,
                -pv2 * xc,
                pv1 * xc,
                jnp.zeros_like(pv1),
                pv1,
                pv2,
            ]
            A = [[None] * 6 for _ in range(6)]
            b = [None] * 6
            for a_i in range(6):
                for b_i in range(a_i + 1):
                    v = jnp.sum(
                        wgt * (Ju[a_i] * Ju[b_i] + Jv[a_i] * Jv[b_i]),
                        axis=1, keepdims=True,
                    )
                    if a_i == b_i:
                        v = v + damping
                    A[a_i][b_i] = v
                    A[b_i][a_i] = v
                b[a_i] = jnp.sum(
                    wgt * (Ju[a_i] * du + Jv[a_i] * dv),
                    axis=1, keepdims=True,
                )
            d = _chol_solve6(A, b)
            dw = [-d[0], -d[1], -d[2]]
            dt = [-d[3], -d[4], -d[5]]

            theta2 = dw[0] * dw[0] + dw[1] * dw[1] + dw[2] * dw[2]
            theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
            small = theta2 < 1e-12
            ca = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
            cb = jnp.where(
                small, 0.5 - theta2 / 24.0,
                (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24),
            )
            W = [
                [jnp.zeros_like(theta), -dw[2], dw[1]],
                [dw[2], jnp.zeros_like(theta), -dw[0]],
                [-dw[1], dw[0], jnp.zeros_like(theta)],
            ]
            WW = [
                [
                    sum(W[i][m] * W[m][j] for m in range(3))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            eye = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
            Rd = [
                [eye[i][j] + ca * W[i][j] + cb * WW[i][j] for j in range(3)]
                for i in range(3)
            ]
            R = [
                [
                    sum(Rd[i][m] * R[m][j] for m in range(3))
                    for j in range(3)
                ]
                for i in range(3)
            ]
            t_rot = [sum(Rd[i][m] * t[m] for m in range(3)) for i in range(3)]
            t = [t_rot[i] + dt[i] for i in range(3)]
        return R, t

    def select(cond, new_R, new_t, R, t):
        Rs = [
            [jnp.where(cond, new_R[i][j], R[i][j]) for j in range(3)]
            for i in range(3)
        ]
        ts = [jnp.where(cond, new_t[i], t[i]) for i in range(3)]
        return Rs, ts

    # LO rounds: GN on current inliers, keep if the count doesn't drop
    for _ in range(lo_rounds):
        cnt, ok = count(R, t, th_full)
        Rn, tn = gn(R, t, ok.astype(jnp.float32) * M, 3.0)
        cn, _ = count(Rn, tn, th_full)
        R, t = select(cn >= cnt, Rn, tn, R, t)

    # graduated polish: shrink the gate, accept at the round's OWN threshold
    for s in (1.0, 0.5, 0.25):
        th_r = jnp.maximum(th_full * s, 2.0)
        cnt_r, inl_r = count(R, t, th_r)
        Rp, tp = gn(
            R, t, inl_r.astype(jnp.float32) * M,
            jnp.maximum(th_r / 2.0, 1.0),
        )
        cnt_new, _ = count(Rp, tp, th_r)
        ok_polish = (cnt_r >= min_inl) & (cnt_new >= cnt_r)
        R, t = select(ok_polish, Rp, tp, R, t)

    num_inl, inl = count(R, t, th_full)
    out_row = jnp.concatenate(
        [R[0][0], R[0][1], R[0][2], R[1][0], R[1][1], R[1][2],
         R[2][0], R[2][1], R[2][2], t[0], t[1], t[2], num_inl,
         jnp.zeros_like(num_inl), jnp.zeros_like(num_inl),
         jnp.zeros_like(num_inl)],
        axis=1,
    )
    out_ref[0] = out_row
    inl_ref[0] = inl.astype(jnp.float32)


def gn_polish_pallas(
    cam_params: jax.Array,  # [8]
    R0: jax.Array,  # [3, 3]
    t0: jax.Array,  # [3]
    xyz: jax.Array,  # [N, 3]
    uv: jax.Array,  # [N, 2]
    mask: jax.Array,  # [N] bool
    threshold,
    min_inliers,
    *,
    gn_iters: int = 8,
    lo_rounds: int = 2,
    damping: float = 1e-4,
    interpret: bool = False,
):
    """Fused LO + graduated polish; returns (R, t, num_inliers, inliers).

    Drop-in for the refinement tail of geometry/pnp.py:ransac_pnp (same
    rounds, same acceptance logic; JtJ reduction order differs from the XLA
    einsum so results agree to f32 tolerance, not bit-exactly).
    """
    n = xyz.shape[0]
    pose_row = jnp.concatenate(
        [R0.reshape(9), t0.reshape(3), jnp.zeros((4,), R0.dtype)]
    ).reshape(1, 16)
    pts = jnp.stack(
        [
            xyz[:, 0], xyz[:, 1], xyz[:, 2], jnp.ones_like(xyz[:, 0]),
            uv[:, 0], uv[:, 1], mask.astype(xyz.dtype),
            jnp.zeros_like(xyz[:, 0]),
        ],
        axis=0,
    )
    sc = jnp.stack(
        [
            jnp.asarray(threshold, jnp.float32),
            jnp.asarray(min_inliers, jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        ]
    ).reshape(1, 4)

    out, inl = pl.pallas_call(
        functools.partial(
            _polish_kernel, gn_iters=gn_iters, lo_rounds=lo_rounds,
            damping=damping,
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 16), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1, 16), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, n), jnp.float32),
        ),
        interpret=interpret,
    )(
        pose_row[None].astype(jnp.float32),
        pts[None].astype(jnp.float32),
        cam_params[None].astype(jnp.float32),
        sc,
    )
    row = out[0, 0]
    R = row[:9].reshape(3, 3)
    t = row[9:12]
    num_inl = row[12].astype(jnp.int32)
    inliers = inl[0, 0] > 0.5
    return R, t, num_inl, inliers
