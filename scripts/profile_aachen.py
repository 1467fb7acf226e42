"""Per-stage timing at the Aachen operating point (bench_aachen's shapes).

bench_aachen.py measures 37-38 fps at mfu 0.208 (xla_twin basis) — well
below the 7Scenes pipeline's 0.366. This script times each stage alone
(b8, 1024x768, 4096 query / 2048 ref tokens, nc513) so the gap can be
attributed: extraction, recognition, the AdaGML matcher (fused vs XLA
attention), and the full localize step. Per-stage MFU uses the same
composite speed-of-light as pram_tpu.utils.flops (s8 split for the int8
extractor, bf16 for everything else), with XLA-twin flop counts for the
Pallas-fused stages (Pallas custom calls are opaque to cost_analysis).

Run: python scripts/profile_aachen.py   (needs the relay chip)

Reference surface: the reference prints per-query stage seconds
(localization/loc_by_rec_eval.py:259-268) but publishes no Aachen-scale
profile; this is the TPU-native equivalent for the AdaGML path.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=6):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms/batch


def main():
    from pram_tpu.utils.chip import wait_for_chip

    wait_for_chip(max_wait_s=int(os.environ.get("BENCH_CHIP_WAIT_S", 540)))

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pram_tpu.engine.localizer import LocConfig, Localizer
    from pram_tpu.engine.matching import make_adagml_match_fn
    from pram_tpu.geometry.camera import Camera
    from pram_tpu.maps.device import to_device
    from pram_tpu.maps.rendered import make_world, query_pose
    from pram_tpu.maps.sharded import shard_map_tables
    from pram_tpu.maps.synthetic import make_synthetic_scene
    from pram_tpu.models.adagml import AdaGML, AdaGMLConfig
    from pram_tpu.models.common import fused_attention_disabled
    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
    from pram_tpu.models.sfd2 import ResNet4x, extract, preprocess_image
    from pram_tpu.models.sfd2_int8 import cast_stem, quantize_extractor
    from pram_tpu.utils.flops import (
        V5E_BF16_PEAK,
        V5E_S8_PEAK,
        compiled_flops,
        extractor_issued_flops,
    )

    rng = np.random.RandomState(0)
    batch = 8
    dt = jnp.bfloat16
    n_kpts = 4096
    height, width = 768, 1024
    n_cluster = 512

    def cast_tree(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            t,
        )

    # --- same model setup as bench_aachen.py ---
    sfd2_f = ResNet4x()
    img0 = jnp.zeros((1, height, width, 3), jnp.float32)
    sfd2_vars_f32 = sfd2_f.init(jax.random.PRNGKey(0), img0)
    world = make_world(np.random.RandomState(0))
    crng = np.random.RandomState(99)
    calib = np.stack(
        [
            world.render(
                *query_pose(crng),
                (500.0, 500.0, width / 2, height / 2),
                width, height,
            )
            for _ in range(2)
        ]
    ).astype(np.float32)
    sfd2, sfd2_vars = quantize_extractor(
        sfd2_f, sfd2_vars_f32, preprocess_image(jnp.asarray(calib))
    )
    sfd2_vars = cast_stem(sfd2_vars, dt)

    rec = SegNetViT(SegNetViTConfig(n_class=n_cluster + 1))
    rec_vars = cast_tree(
        rec.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 8, 256), jnp.float32),
            jnp.zeros((1, 8, 2), jnp.float32),
        )
    )

    ada = AdaGML(AdaGMLConfig())
    avars = cast_tree(
        {
            "params": ada.init(
                jax.random.PRNGKey(2),
                jnp.zeros((1, 8, 128), jnp.float32),
                jnp.zeros((1, 8, 128), jnp.float32),
                jnp.zeros((1, 8, 2), jnp.float32),
                jnp.zeros((1, 8, 2), jnp.float32),
            )["params"]
        }
    )

    scene = make_synthetic_scene(
        rng, n_cluster=n_cluster, points_per_cluster=40, n_ref_frames=24,
        desc_dim=128, width=width, height=height,
        max_kp_per_frame=2048, max_ref_points=4096,
    )
    dmap = to_device(scene.map)
    dmap = dmap._replace(point_desc=dmap.point_desc.astype(dt))
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("data",))
    smap = shard_map_tables(dmap, mesh)
    cfg = LocConfig(
        seg_k=1, min_inliers=32, threshold=8.0, num_hypotheses=128,
        do_refinement=True, gn_iters=5, lo_rounds=1,
    )
    loc = Localizer(smap, make_adagml_match_fn(ada, avars), cfg)

    images = jnp.asarray(rng.rand(batch, height, width, 3).astype(np.float32))
    camera = Camera(
        jnp.broadcast_to(
            jnp.asarray(
                [500.0, 500.0, width / 2, height / 2, 0, 0, 0, 0], jnp.float32
            ),
            (batch, 8),
        ),
        jnp.broadcast_to(jnp.asarray([width, height], jnp.float32), (batch, 2)),
    )
    key = jax.random.PRNGKey(0)

    rows = []  # (name, ms_per_batch, flops_per_batch_or_None, s8_frac)

    def add(name, ms, flops=None, s8_frac=0.0):
        mfu = None
        if flops:
            pf = flops / batch
            t_sol = (pf * (1 - s8_frac)) / V5E_BF16_PEAK + (
                pf * s8_frac
            ) / V5E_S8_PEAK
            mfu = t_sol / (ms / 1e3 / batch)
        rows.append((name, ms, flops, mfu))
        print(
            f"{name:34s} {ms:9.2f} ms/b{batch}"
            + (f"  {flops / batch / 1e9:8.1f} GF/frame" if flops else "")
            + (f"  mfu {mfu:.3f}" if mfu else "")
        )

    # --- 1. extraction (int8 stack, the bench default) ---
    @jax.jit
    def ex(images):
        f = extract(
            sfd2, sfd2_vars, images.astype(dt),
            max_keypoints=n_kpts, conf_th=1e-4,
        )
        k = f["keypoints"]
        return k.xy, k.scores, k.mask, f["descriptors"], f["seg_descriptors"]

    xy, scores, mask, desc, segd = ex(images)
    bf, s8 = extractor_issued_flops(height, width)
    add(
        "extract int8 (fused stem+NMS)",
        timeit(ex, images),
        (bf + s8) * batch,
        s8 / (bf + s8),
    )

    # --- 2. recognition: SegNetViT nc513 over 4096 tokens ---
    nxy = xy / jnp.asarray([width, height], jnp.float32) - 0.5

    def rec_plain(segd, nxy, mask):
        return rec.apply(rec_vars, segd, nxy, mask)["prediction"]

    rec_fn = jax.jit(rec_plain)
    logits = rec_fn(segd, nxy, mask)
    with fused_attention_disabled():
        rec_twin = compiled_flops(jax.jit(rec_plain), segd, nxy, mask)
    add("segnetvit nc513 4096tok", timeit(rec_fn, segd, nxy, mask), rec_twin)

    # --- 3. AdaGML matcher alone: 4096 query x 2048 ref tokens ---
    d0 = desc.astype(dt)
    d1 = jnp.asarray(
        rng.rand(batch, 2048, 128).astype(np.float32), dtype=dt
    )
    k0 = nxy
    k1 = jnp.asarray(rng.rand(batch, 2048, 2).astype(np.float32) - 0.5)
    m0 = mask
    m1 = jnp.ones((batch, 2048), bool)

    def match_plain(d0, d1, k0, k1, m0, m1):
        return ada.apply(avars, d0, d1, k0, k1, m0, m1)["plan"]

    match_fused = jax.jit(match_plain)
    match_fused(d0, d1, k0, k1, m0, m1)
    with fused_attention_disabled():
        ada_twin = compiled_flops(
            jax.jit(match_plain), d0, d1, k0, k1, m0, m1
        )
    add(
        "adagml 4096x2048 (fused)",
        timeit(match_fused, d0, d1, k0, k1, m0, m1),
        ada_twin,
    )

    # --- 4. same matcher, XLA attention (A/B the fused kernels on-chip) ---
    if os.environ.get("PROFILE_XLA_AB", "1") == "1":
        with fused_attention_disabled():

            @jax.jit
            def match_xla(d0, d1, k0, k1, m0, m1):
                return ada.apply(avars, d0, d1, k0, k1, m0, m1)["plan"]

            match_xla(d0, d1, k0, k1, m0, m1)
            add(
                "adagml 4096x2048 (XLA attn)",
                timeit(match_xla, d0, d1, k0, k1, m0, m1),
                ada_twin,
            )

    # --- 5. full localize step (matcher + PnP + refinement vs sharded map) ---
    @jax.jit
    def loc_fn(k, xy, scores, desc, mask, logits):
        return loc.localize_batch(
            k, camera, xy, scores.astype(jnp.float32), desc, mask,
            logits.astype(jnp.float32),
        ).qvec

    logits32 = logits.astype(jnp.float32)
    loc_fn(key, xy, scores, d0, mask, logits32)
    add(
        "localize step (adagml+pnp+ref)",
        timeit(loc_fn, key, xy, scores, d0, mask, logits32),
    )

    print(
        "\nnote: stage boundaries add one HBM roundtrip each vs the fused "
        "bench pipeline; matcher twin flops via fused_attention_disabled "
        "(Pallas kernels are cost_analysis-opaque)."
    )


if __name__ == "__main__":
    main()
