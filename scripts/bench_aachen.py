"""Aachen-scale operating-point benchmark (VERDICT r2 #2 / BASELINE config #4).

The reference's largest configuration (configs/config_train_aachen_sfd2.yaml:
72-74): n_class 513 recognition, 4096 eval keypoints, AdaGML matcher — run
here end-to-end on one chip: SFD2 extraction at 1024x768 -> SegNetViT nc513
over 4096 tokens (query-tiled fused attention) -> AdaGML vs a row-sharded
map's VRF tables (2048-kpt frames, tiled cross attention + in-kernel pooling
stats) -> PnP/RANSAC -> projection refinement.

Prints ONE JSON line with fps and per-device HBM, for ROUND_NOTES.
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pram_tpu.engine.localizer import LocConfig, Localizer
    from pram_tpu.engine.matching import make_adagml_match_fn
    from pram_tpu.geometry.camera import Camera
    from pram_tpu.maps.device import to_device
    from pram_tpu.maps.sharded import shard_map_tables
    from pram_tpu.maps.synthetic import make_synthetic_scene
    from pram_tpu.models.adagml import AdaGML, AdaGMLConfig
    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
    from pram_tpu.models.sfd2 import ResNet4x, extract

    rng = np.random.RandomState(0)
    batch = 8  # 4096 tokens/frame: b8 keeps the working set HBM-friendly
    compute_dtype = jnp.bfloat16
    n_kpts = 4096
    height, width = 768, 1024
    n_cluster = 512  # -> n_class 513 (the Aachen head)

    def cast_tree(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            t,
        )

    sfd2 = ResNet4x()
    img0 = jnp.zeros((1, height, width, 3), jnp.float32)
    sfd2_vars = cast_tree(sfd2.init(jax.random.PRNGKey(0), img0))

    rec = SegNetViT(SegNetViTConfig(n_class=n_cluster + 1))
    rec_vars = cast_tree(
        rec.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 8, 256), jnp.float32),
            jnp.zeros((1, 8, 2), jnp.float32),
        )
    )

    ada = AdaGML(AdaGMLConfig())  # 9 layers, 256 hidden, adaptive pooling
    avars = cast_tree(
        ada.init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, 8, 128), jnp.float32),
            jnp.zeros((1, 8, 128), jnp.float32),
            jnp.zeros((1, 8, 2), jnp.float32),
            jnp.zeros((1, 8, 2), jnp.float32),
        )
    )

    # Aachen-shaped synthetic map: 512 landmarks, 2048-kpt VRF frames
    scene = make_synthetic_scene(
        rng, n_cluster=n_cluster, points_per_cluster=40, n_ref_frames=24,
        desc_dim=128, width=width, height=height,
        max_kp_per_frame=2048, max_ref_points=4096,
    )
    dmap = to_device(scene.map)
    dmap = dmap._replace(point_desc=dmap.point_desc.astype(compute_dtype))

    # row-sharded map over the available chips (1 on the bench relay; the
    # same path runs on the 8-dev virtual mesh in dryrun_multichip)
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("data",))
    smap = shard_map_tables(dmap, mesh)

    cfg = LocConfig(
        seg_k=1, min_inliers=32, threshold=8.0, num_hypotheses=128,
        do_refinement=True, gn_iters=5, lo_rounds=1,
    )
    loc = Localizer(smap, make_adagml_match_fn(ada, avars), cfg)

    @jax.jit
    def front(images):
        feats = extract(
            sfd2, sfd2_vars, images.astype(compute_dtype),
            max_keypoints=n_kpts, conf_th=1e-4,
        )
        kps = feats["keypoints"]
        logits = rec.apply(
            rec_vars,
            feats["seg_descriptors"],
            kps.xy / jnp.asarray([width, height], jnp.float32) - 0.5,
            kps.mask,
        )["prediction"]
        return (
            kps.xy,
            kps.scores.astype(jnp.float32),
            feats["descriptors"].astype(compute_dtype),
            kps.mask,
            logits.astype(jnp.float32),
        )

    camera = Camera(
        jnp.broadcast_to(
            jnp.asarray(
                [900.0, 900.0, width / 2, height / 2, 0, 0, 0, 0],
                jnp.float32,
            ),
            (batch, 8),
        ),
        jnp.broadcast_to(
            jnp.asarray([width, height], jnp.float32), (batch, 2)
        ),
    )
    images = jnp.asarray(
        rng.rand(batch, height, width, 3).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)

    def pipeline(k, images):
        return loc.localize_batch(k, camera, *front(images))

    t_c0 = time.perf_counter()
    res = pipeline(key, images)
    jax.block_until_ready(res.qvec)
    compile_s = time.perf_counter() - t_c0

    iters = 4
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            res = pipeline(jax.random.fold_in(key, i), images)
        jax.block_until_ready(res.qvec)
        runs.append(round(batch * iters / (time.perf_counter() - t0), 2))

    stats = jax.devices()[0].memory_stats() or {}
    hbm_gb = round(stats.get("peak_bytes_in_use", 0) / 2**30, 3)
    print(
        json.dumps(
            {
                "metric": "aachen_shape_relocalization_throughput",
                "value": float(np.median(runs)),
                "unit": "frames/sec",
                "runs": runs,
                "batch": batch,
                "n_kpts": n_kpts,
                "n_class": n_cluster + 1,
                "matcher": "adagml",
                "map": "row-sharded",
                "peak_hbm_gb": hbm_gb,
                "first_call_s": round(compile_s, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
