"""Per-stage timing on the real chip (run: python scripts/profile_stages.py).

Times each pipeline stage of the bench workload separately (b32, bf16,
480x640, 512 tokens) so optimization work targets the real bottleneck.
Each stage is jitted alone; numbers include one HBM roundtrip per stage
boundary that the fused bench pipeline does not pay, so the sum slightly
overestimates the fused total.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
    from pram_tpu.models.sfd2 import ResNet4x, extract
    from pram_tpu.models.gml import GML, GMLConfig
    from pram_tpu.ops.nms import simple_nms

    rng = np.random.RandomState(0)
    batch = 32
    dt = jnp.bfloat16
    n_kpts = 512
    h, w = 480, 640

    def cast_tree(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            t,
        )

    sfd2 = ResNet4x()
    img0 = jnp.zeros((batch, h, w, 3), jnp.float32)
    sfd2_vars = cast_tree(sfd2.init(jax.random.PRNGKey(0), img0))
    images = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32)).astype(dt)

    fwd = jax.jit(lambda im: sfd2.apply(sfd2_vars, im))
    print(f"sfd2 dense fwd       : {timeit(fwd, images):8.2f} ms/b{batch}")

    ex = jax.jit(
        lambda im: extract(
            sfd2, sfd2_vars, im, max_keypoints=n_kpts, conf_th=1e-4
        )["descriptors"]
    )
    print(f"sfd2 extract (fused) : {timeit(ex, images):8.2f} ms/b{batch}")

    from pram_tpu.models.sfd2_int8 import cast_stem, quantize_extractor

    q_model, q_vars = quantize_extractor(
        sfd2, sfd2.init(jax.random.PRNGKey(0), img0), images[:4].astype(jnp.float32)
    )
    q_vars = cast_stem(q_vars, dt)
    ex8 = jax.jit(
        lambda im: extract(
            q_model, q_vars, im, max_keypoints=n_kpts, conf_th=1e-4
        )["descriptors"]
    )
    print(f"sfd2 extract (int8)  : {timeit(ex8, images):8.2f} ms/b{batch}")

    out = fwd(images)
    sm = out["score_map"]
    nmsj = jax.jit(lambda s: simple_nms(s, 4))
    print(f"  nms alone          : {timeit(nmsj, sm):8.2f} ms/b{batch}")

    rec = SegNetViT(SegNetViTConfig(n_class=113))
    d0 = jnp.asarray(rng.rand(batch, n_kpts, 256), dt)
    k0 = jnp.asarray(rng.rand(batch, n_kpts, 2), jnp.float32)
    m0 = jnp.ones((batch, n_kpts), bool)
    rec_vars = cast_tree(rec.init(jax.random.PRNGKey(1), d0, k0))
    recj = jax.jit(lambda d, k, m: rec.apply(rec_vars, d, k, m)["prediction"])
    print(f"segnetvit (15L)      : {timeit(recj, d0, k0, m0):8.2f} ms/b{batch}")

    gml = GML(GMLConfig(use_pallas_sinkhorn=True))
    da = jnp.asarray(rng.rand(batch, n_kpts, 128), dt)
    db = jnp.asarray(rng.rand(batch, 1024, 128), dt)
    ka = jnp.asarray(rng.rand(batch, n_kpts, 2), jnp.float32)
    kb = jnp.asarray(rng.rand(batch, 1024, 2), jnp.float32)
    gvars = cast_tree(gml.init(jax.random.PRNGKey(2), da[:1, :8], db[:1, :8],
                               ka[:1, :8], kb[:1, :8]))
    gj = jax.jit(lambda a, b, x, y: gml.apply(gvars, a, b, x, y)["plan"])
    print(f"gml 512x1024 (9L)    : {timeit(gj, da, db, ka, kb):8.2f} ms/b{batch}")

    # ---- back end: PnP + projection refinement + full localize step
    from pram_tpu.engine.localizer import (
        LocConfig, Localizer, _refine_by_projection,
    )
    from pram_tpu.engine.matching import make_gml_match_fn
    from pram_tpu.geometry.camera import Camera
    from pram_tpu.geometry.pnp import ransac_pnp
    from pram_tpu.maps.device import to_device
    from pram_tpu.maps.synthetic import make_synthetic_scene

    scene = make_synthetic_scene(
        rng, n_cluster=16, points_per_cluster=400, n_ref_frames=12,
        desc_dim=128, width=w, height=h,
        max_kp_per_frame=1024, max_ref_points=2048,
    )
    dmap = to_device(scene.map)
    dmap = dmap._replace(point_desc=dmap.point_desc.astype(dt))
    cam_p = jnp.broadcast_to(
        jnp.asarray([500.0, 500.0, w / 2, h / 2, 0, 0, 0, 0], jnp.float32),
        (batch, 8),
    )
    cam_s = jnp.broadcast_to(jnp.asarray([w, h], jnp.float32), (batch, 2))
    camera = Camera(cam_p, cam_s)
    kpts = jnp.asarray(rng.rand(batch, n_kpts, 2) * [w, h], jnp.float32)
    xyz = jnp.asarray(rng.randn(batch, n_kpts, 3), jnp.float32)
    valid = jnp.ones((batch, n_kpts), bool)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, batch)

    pnpj = jax.jit(
        jax.vmap(
            lambda k, c, kp, x, v: ransac_pnp(
                k, c, kp, x, v, inlier_threshold=8.0, num_hypotheses=128,
                min_inliers=32,
            ).num_inliers
        )
    )
    print(f"ransac_pnp (128 hyp) : {timeit(pnpj, keys, camera, kpts, xyz, valid):8.2f} ms/b{batch}")

    cfg = LocConfig(seg_k=1, min_inliers=32, threshold=8.0,
                    num_hypotheses=128, do_refinement=True)
    qd = jnp.asarray(rng.rand(batch, n_kpts, 128), dt)
    R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (batch, 3, 3))
    t0 = jnp.zeros((batch, 3), jnp.float32)
    slots = jnp.zeros((batch,), jnp.int32)
    refj = jax.jit(
        jax.vmap(
            lambda k, c, kp, d, m, s, R, t: _refine_by_projection(
                k, dmap, c, kp, d, m, s, R, t, cfg
            )[2]
        )
    )
    print(f"refine_by_projection : {timeit(refj, keys, camera, kpts, qd, valid, slots, R0, t0):8.2f} ms/b{batch}")

    logits = jnp.asarray(rng.rand(batch, n_kpts, 17), jnp.float32)
    scores = jnp.asarray(rng.rand(batch, n_kpts), jnp.float32)

    import dataclasses as _dc

    from pram_tpu.engine.matching import make_nn_match_fn

    variants = [
        ("full localize step  ", Localizer(dmap, make_gml_match_fn(gml, gvars), cfg)),
        ("step no-refine      ", Localizer(dmap, make_gml_match_fn(gml, gvars),
                                           _dc.replace(cfg, do_refinement=False))),
        ("step NN matcher     ", Localizer(dmap, make_nn_match_fn(), cfg)),
        ("step NN no-refine   ", Localizer(dmap, make_nn_match_fn(),
                                           _dc.replace(cfg, do_refinement=False))),
        ("step NN nr hyp=16   ", Localizer(dmap, make_nn_match_fn(),
                                           _dc.replace(cfg, do_refinement=False,
                                                       num_hypotheses=16))),
    ]
    for name, l in variants:
        lj = jax.jit(
            lambda k, c, kp, s, d, m, lg, _l=l: _l._step(
                k, c, kp, s, d, m, lg).qvec
        )
        print(f"{name} : {timeit(lj, key, camera, kpts, scores, qd, valid, logits):8.2f} ms/b{batch}")


if __name__ == "__main__":
    main()
