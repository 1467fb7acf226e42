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


def main_sp(sp: int):
    """--sp N: the sequence-parallel matcher at the Aachen operating point
    (VERDICT r4 #5 — SP reachable from a real surface, not only tests).

    Runs the SP-GML formulation (parallel/tp.py:make_sp_gml_fn: token-
    sharded attention, ONE stacked-KV gather per layer, row-sharded
    Sinkhorn) at the 4096-query/2048-ref token shape on an N-way 'seq'
    virtual CPU mesh (the bench relay exposes a single chip; SPMD layout
    and collective schedule are device-count properties, not backend
    properties). Prints ONE JSON line with the compiled HLO collective
    counts against the analytic schedule and exact parity vs the
    replicated GML at the same shape.

    AdaGML itself stays replicated here: its adaptive pooling changes
    token counts mid-stack, which conflicts with a static 'seq' shard
    (ROUND_NOTES r4); GML is the SP-covered matcher family member.
    """
    import time

    from __graft_entry__ import _provision_virtual_devices

    _provision_virtual_devices(max(sp, 1))

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pram_tpu.models.gml import GML, GMLConfig
    from pram_tpu.parallel.tp import make_sp_gml_fn

    n0, n1 = 4096, 2048  # the Aachen eval shape (query kpts / VRF frame)
    if n0 % sp or n1 % sp:
        raise SystemExit(f"--sp {sp}: {n0}/{n1} tokens must divide it")
    rng = np.random.RandomState(0)
    cfg = GMLConfig()  # 9 layers / 256 hidden — the reference GML scale
    model = GML(cfg)
    d0 = jnp.asarray(rng.randn(1, n0, 128).astype(np.float32))
    d1 = jnp.asarray(rng.randn(1, n1, 128).astype(np.float32))
    k0 = jnp.asarray((rng.rand(1, n0, 2) - 0.5).astype(np.float32))
    k1 = jnp.asarray((rng.rand(1, n1, 2) - 0.5).astype(np.float32))
    m0 = jnp.ones((1, n0), bool)
    m1 = jnp.ones((1, n1), bool)
    variables = model.init(jax.random.PRNGKey(0), d0, d1, k0, k1)

    mesh = Mesh(
        np.asarray(jax.devices()[:sp]).reshape(1, sp),
        axis_names=("data", "seq"),
    )
    fn = jax.jit(make_sp_gml_fn(mesh, cfg))
    compiled = fn.lower(variables, d0, d1, k0, k1, m0, m1).compile()
    hlo = compiled.as_text()
    got = {
        "all-gather": hlo.count(" all-gather("),
        "all-reduce": hlo.count(" all-reduce("),
        "collective-permute": hlo.count(" collective-permute("),
    }
    expected_gathers = 2 * cfg.n_layers + 1  # self+cross KV + readout

    t0 = time.perf_counter()
    rows, dust = fn(variables, d0, d1, k0, k1, m0, m1)
    sp_plan = jnp.concatenate([rows, dust[:, None, :]], axis=1)
    jax.block_until_ready(sp_plan)
    sp_s = time.perf_counter() - t0

    ref_plan = jax.jit(
        lambda v: model.apply(v, d0, d1, k0, k1, m0, m1)["plan"]
    )(variables)
    max_diff = float(
        jnp.max(jnp.abs(sp_plan.astype(jnp.float32)
                        - ref_plan.astype(jnp.float32)))
    )
    print(json.dumps({
        "metric": "aachen_shape_sp_gml",
        "sp": sp,
        "n_tokens": [n0, n1],
        "n_layers": cfg.n_layers,
        "collectives": got,
        "expected": {"all-gather": expected_gathers, "all-reduce": 1},
        "schedule_ok": (
            got["all-gather"] == expected_gathers
            and got["all-reduce"] == 1
        ),
        "plan_max_abs_diff_vs_replicated": round(max_diff, 6),
        "parity_ok": max_diff < 2e-4,
        "step_s": round(sp_s, 2),
        "backend": jax.default_backend(),
    }))


def main():
    from pram_tpu.utils.chip import wait_for_chip

    # 540 s default: stay far under any driver/battery kill budget so a
    # relay outage yields a fast failure, not a silent rc:124 (VERDICT r4)
    wait_for_chip(max_wait_s=int(os.environ.get("BENCH_CHIP_WAIT_S", 540)))

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
    sfd2_vars_f32 = sfd2.init(jax.random.PRNGKey(0), img0)
    sfd2_vars = cast_tree(sfd2_vars_f32)

    # int8 conv stack by default, like bench.py (BENCH_INT8=0 for bf16).
    # The quantized configuration is recall-certified on hardware by the
    # image-level guard (engine/rendered_guard.py) and exp_int8.py's A/B;
    # this bench reuses it at the 1024x768 operating point.
    use_int8 = os.environ.get("BENCH_INT8", "1") == "1"
    if use_int8:
        from pram_tpu.maps.rendered import make_world, query_pose
        from pram_tpu.models.sfd2 import preprocess_image
        from pram_tpu.models.sfd2_int8 import cast_stem, quantize_extractor

        # rendered-world frames at THIS bench's resolution (ADVICE r4:
        # calibrate the timed configuration the way the recall-certified
        # one is calibrated, not on random noise)
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
            sfd2, sfd2_vars_f32, preprocess_image(jnp.asarray(calib))
        )
        sfd2_vars = cast_stem(sfd2_vars, compute_dtype)

    rec = SegNetViT(SegNetViTConfig(n_class=n_cluster + 1))
    rec_vars = cast_tree(
        rec.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 8, 256), jnp.float32),
            jnp.zeros((1, 8, 2), jnp.float32),
        )
    )

    ada = AdaGML(AdaGMLConfig())  # 9 layers, 256 hidden, adaptive pooling
    atmpl = ada.init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 8, 128), jnp.float32),
        jnp.zeros((1, 8, 128), jnp.float32),
        jnp.zeros((1, 8, 2), jnp.float32),
        jnp.zeros((1, 8, 2), jnp.float32),
    )["params"]
    ada_weights = os.path.join(_REPO, "weights", "adagml_aachen.msgpack")
    ada_trained = os.path.exists(ada_weights)
    if ada_trained:
        from flax import serialization

        with open(ada_weights, "rb") as f:
            atmpl = serialization.from_bytes(atmpl, f.read())
    avars = cast_tree({"params": atmpl})

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
                [500.0, 500.0, width / 2, height / 2, 0, 0, 0, 0],
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

    # MFU (VERDICT r4 #3): issued flops against the composite v5e
    # speed-of-light. FLOP BASIS (r5, matches bench.py): the fused Pallas
    # kernels are opaque to XLA cost_analysis, so the basis is an all-XLA
    # twin of the same math (fused_attention_disabled + XLA stem/NMS),
    # traced but never executed; the compiled program's own figure is the
    # guarded fallback.
    from pram_tpu.utils.flops import (
        compiled_flops,
        extractor_issued_flops,
        mfu_fields,
    )

    flops_batch = compiled_flops(jax.jit(pipeline), key, images)
    flop_basis = "compiled"
    try:
        from pram_tpu.models.common import fused_attention_disabled
        from pram_tpu.models.sfd2 import ResNet4x as _F32Net
        from pram_tpu.models.sfd2_int8 import Int8ResNet4x as _I8Net

        t_sfd2 = (
            _I8Net(outdim=sfd2.outdim, use_pallas_stem=False)
            if use_int8
            else _F32Net(use_pallas_stem=False)
        )
        # twin localizes against the UNSHARDED map: identical math minus
        # the shard_map collectives (flop-free), and a mesh of chip
        # devices cannot be lowered for the CPU counting backend
        # (utils/flops.compiled_flops counts on a CPU lowering)
        t_loc = Localizer(dmap, make_adagml_match_fn(ada, avars), cfg)

        def t_pipe(k, imgs):
            feats = extract(
                t_sfd2, sfd2_vars, imgs.astype(compute_dtype),
                max_keypoints=n_kpts, conf_th=1e-4, use_pallas_nms=False,
            )
            kps = feats["keypoints"]
            logits = rec.apply(
                rec_vars,
                feats["seg_descriptors"],
                kps.xy / jnp.asarray([width, height], jnp.float32) - 0.5,
                kps.mask,
            )["prediction"]
            return t_loc.localize_batch(
                k, camera, kps.xy, kps.scores.astype(jnp.float32),
                feats["descriptors"].astype(compute_dtype), kps.mask,
                logits.astype(jnp.float32),
            )

        saved = {
            k: os.environ.pop(k, None)
            for k in ("PRAM_INT8_CONV", "PRAM_INT8_MLP", "PRAM_INT8_PROJ")
        }
        try:
            with fused_attention_disabled():
                twin = compiled_flops(jax.jit(t_pipe), key, images)
        finally:
            for k, v in saved.items():
                if v is not None:
                    os.environ[k] = v
        if twin:
            flops_batch = twin
            flop_basis = "xla_twin"
    except Exception:
        pass  # keep the compiled-program figure; never block the bench
    s8_pf = extractor_issued_flops(height, width)[1] if use_int8 else 0.0
    mfu_out = mfu_fields(
        flops_batch / batch if flops_batch else None,
        float(np.median(runs)), s8_pf,
    )
    mfu_out["flop_basis"] = flop_basis

    out = {
        "metric": "aachen_shape_relocalization_throughput",
        "value": float(np.median(runs)),
        "unit": "frames/sec",
        "runs": runs,
        "batch": batch,
        "n_kpts": n_kpts,
        "n_class": n_cluster + 1,
        "matcher": "adagml",
        "extractor_int8": use_int8,
        "adagml_trained_weights": ada_trained,
        "map": "row-sharded",
        "first_call_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        **mfu_out,
    }
    stats = jax.devices()[0].memory_stats() or {}
    if stats:
        out["peak_hbm_gb"] = round(
            stats.get("peak_bytes_in_use", 0) / 2**30, 3
        )

    # ---- correctness at the Aachen shape (VERDICT r3 #2): recall + match
    # precision through the SAME compiled localize path as the fps number,
    # with the TRAINED AdaGML (scripts/train_aachen_adagml.py) and eval-time
    # keypoint + descriptor noise. Candidate routing uses ground-truth
    # logits: the witness targeted here is the 4096-token matcher stack
    # (tiled attention + in-kernel pooling stats) and PnP at scale.
    if ada_trained:
        from pram_tpu.geometry.rotations import compute_pose_error
        from pram_tpu.maps.synthetic import _qvec2rotmat_np

        qrng = np.random.RandomState(11)
        queries = [
            scene.render_query(
                qrng, noise_px=0.5, desc_noise=0.05, max_kpts=n_kpts
            )
            for _ in range(batch * 4)
        ]
        n_ok = n_tot = prec_num = prec_den = 0
        t_list, q_list, e_list = [], [], []
        for s0 in range(0, len(queries), batch):
            qs = queries[s0 : s0 + batch]
            q_kpts = jnp.asarray(np.stack([q["keypoints"] for q in qs]))
            q_descs = jnp.asarray(
                np.stack([q["descriptors"] for q in qs])
            ).astype(compute_dtype)
            q_scores = jnp.asarray(np.stack([q["scores"] for q in qs]))
            q_mask = jnp.asarray(np.stack([q["mask"] for q in qs]))
            gt_seg = np.stack([q["gt_seg"] for q in qs])
            cls = np.where(gt_seg >= 0, gt_seg + 1, 0)
            logits = np.full(
                (batch, n_kpts, n_cluster + 1), -10.0, np.float32
            )
            np.put_along_axis(logits, cls[..., None], 10.0, axis=2)
            res = loc.localize_batch(
                jax.random.fold_in(jax.random.PRNGKey(7), s0), camera,
                q_kpts, q_scores, q_descs, q_mask, jnp.asarray(logits),
            )
            qe, te = compute_pose_error(
                res.qvec, res.tvec,
                jnp.asarray(np.stack([q["qvec"] for q in qs])),
                jnp.asarray(np.stack([q["tvec"] for q in qs])),
            )
            qe, te = np.asarray(qe), np.asarray(te)
            ok = np.asarray(res.success) & (te < 0.25) & (qe < 2.0)
            n_ok += int(ok.sum())
            n_tot += batch
            t_list.extend(te.tolist())
            q_list.extend(qe.tolist())
            # precision: assigned 3D points must reproject near the kpt
            kpi = np.asarray(res.kpt_point_idx)
            kxyz = np.asarray(res.kpt_xyz, np.float64)
            kxy = np.asarray(q_kpts, np.float64)
            km = np.asarray(q_mask)
            for i, q in enumerate(qs):
                R = _qvec2rotmat_np(q["qvec"])
                t = np.asarray(q["tvec"], np.float64)
                matched = (kpi[i] >= 0) & km[i]
                if not matched.any():
                    continue
                xc = kxyz[i][matched] @ R.T + t
                z = np.clip(xc[:, 2], 1e-6, None)
                uv = np.stack(
                    [
                        xc[:, 0] / z * 500.0 + width / 2,
                        xc[:, 1] / z * 500.0 + height / 2,
                    ],
                    -1,
                )
                err = np.linalg.norm(uv - kxy[i][matched], axis=-1)
                prec_num += int((err < 4.0).sum())
                prec_den += int(matched.sum())
                e_list.append(np.median(err))
        out["recall_25cm2deg"] = round(n_ok / max(n_tot, 1), 4)
        out["n_queries"] = n_tot
        out["match_precision"] = round(prec_num / max(prec_den, 1), 4)
        out["matches_per_query"] = round(prec_den / max(n_tot, 1), 1)
        out["median_t_err"] = round(float(np.median(t_list)), 4)
        out["median_reproj_px"] = round(float(np.median(e_list)), 2)
        out["median_q_err"] = round(float(np.median(q_list)), 4)

        # ---- fused-vs-XLA matcher agreement at the 4096/2048 shape: the
        # tiled attention + stats kernels against the einsum path, ON THIS
        # backend (the on-chip witness interpret-mode tests can't give)
        from pram_tpu.engine.localizer import normalize_kpts_like_reference
        from pram_tpu.models.common import fused_attention_disabled
        from pram_tpu.ops.matching import mutual_matches

        q = queries[0]
        fi = 0
        f_mask = jnp.asarray(scene.map.frame_kp_mask[fi].astype(bool))[None]
        f_desc = jnp.asarray(
            scene.map.point_desc[
                np.clip(scene.map.frame_point_idx[fi], 0, None)
            ]
        ).astype(compute_dtype)[None]
        f_uv = jnp.asarray(scene.map.frame_kp_uv[fi])[None]
        w_arr = jnp.asarray(float(width))
        h_arr = jnp.asarray(float(height))
        margs = (
            jnp.asarray(q["descriptors"]).astype(compute_dtype)[None],
            f_desc,
            normalize_kpts_like_reference(
                jnp.asarray(q["keypoints"])[None], w_arr, h_arr
            ),
            normalize_kpts_like_reference(f_uv, w_arr, h_arr),
            jnp.asarray(q["mask"])[None],
            f_mask,
        )
        out_fused = jax.jit(
            lambda *a: ada.apply(avars, *a)["plan"]
        )(*margs)
        with fused_attention_disabled():
            out_xla = jax.jit(
                lambda *a: ada.apply(avars, *a)["plan"]
            )(*margs)
        m_f = np.asarray(mutual_matches(out_fused, 0.2).matches0[0])
        m_x = np.asarray(mutual_matches(out_xla, 0.2).matches0[0])
        valid = np.asarray(q["mask"])
        out["matcher_ab_4096"] = {
            "match_agreement": round(
                float((m_f[valid] == m_x[valid]).mean()), 4
            ),
            "n_matches_fused": int((m_f[valid] >= 0).sum()),
            "n_matches_xla": int((m_x[valid] >= 0).sum()),
            "plan_max_abs_diff": round(
                float(
                    jnp.max(
                        jnp.abs(
                            out_fused.astype(jnp.float32)
                            - out_xla.astype(jnp.float32)
                        )
                    )
                ),
                4,
            ),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sp", type=int, default=0, metavar="N",
        help="run the sequence-parallel GML matcher at the Aachen token "
        "shape on an N-way virtual 'seq' mesh (HLO collective counts + "
        "parity) instead of the on-chip throughput bench",
    )
    args = ap.parse_args()
    if args.sp > 1:
        main_sp(args.sp)
    else:
        main()
