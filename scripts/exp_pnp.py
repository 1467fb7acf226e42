"""Decompose ransac_pnp's per-stage cost on the real chip (b32 vmapped)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pram_tpu.geometry.camera import Camera, pixel_to_bearing
    from pram_tpu.geometry.pnp import (
        _count_inliers, _sample_triplets, gauss_newton_pose, p3p_grunert,
        ransac_pnp,
    )

    rng = np.random.RandomState(0)
    b, n, k = 32, 512, 128
    cam_p = jnp.broadcast_to(
        jnp.asarray([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0], jnp.float32),
        (b, 8))
    cam_s = jnp.broadcast_to(jnp.asarray([640.0, 480.0], jnp.float32), (b, 2))
    camera = Camera(cam_p, cam_s)
    uv = jnp.asarray(rng.rand(b, n, 2) * [640, 480], jnp.float32)
    xyz = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    mask = jnp.ones((b, n), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), b)

    samp = jax.jit(jax.vmap(lambda key, m: _sample_triplets(key, m, k)))
    print(f"sample_triplets      : {timeit(samp, keys, mask):7.2f} ms/b{b}")

    idx = samp(keys, mask)
    bear = jax.jit(jax.vmap(pixel_to_bearing))(camera, uv)
    f = jnp.take_along_axis(bear[:, :, None, :], idx[..., None], axis=1)
    f = jax.vmap(lambda bb, ii: bb[ii])(bear, idx)  # [b, k, 3, 3]
    P = jax.vmap(lambda xx, ii: xx[ii])(xyz, idx)
    p3p = jax.jit(jax.vmap(p3p_grunert))
    print(f"p3p_grunert (128 hyp): {timeit(p3p, f, P):7.2f} ms/b{b}")

    R_all, t_all, valid = p3p(f, P)
    Rf = R_all.reshape(b, -1, 3, 3)
    tf = t_all.reshape(b, -1, 3)
    cnt = jax.jit(jax.vmap(
        lambda c_p, c_s, R, t, x, u, m: _count_inliers(
            Camera(c_p, c_s), R, t, x[None], u[None], m[None], 8.0)[0]
    ))
    print(f"count_inliers (512p) : {timeit(cnt, cam_p, cam_s, Rf, tf, xyz, uv, mask):7.2f} ms/b{b}")

    R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
    t0 = jnp.zeros((b, 3), jnp.float32)
    w = mask.astype(jnp.float32)
    gn = jax.jit(jax.vmap(
        lambda c_p, c_s, R, t, x, u, ww: gauss_newton_pose(
            Camera(c_p, c_s), R, t, x, u, ww, num_iters=8)[0]
    ))
    print(f"gauss_newton (8 it)  : {timeit(gn, cam_p, cam_s, R0, t0, xyz, uv, w):7.2f} ms/b{b}")

    full = jax.jit(jax.vmap(
        lambda key, c_p, c_s, u, x, m: ransac_pnp(
            key, Camera(c_p, c_s), u, x, m, inlier_threshold=8.0,
            num_hypotheses=k, min_inliers=32).num_inliers
    ))
    print(f"ransac_pnp full      : {timeit(full, keys, cam_p, cam_s, uv, xyz, mask):7.2f} ms/b{b}")


if __name__ == "__main__":
    main()
