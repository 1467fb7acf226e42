"""End-to-end relocalization throughput benchmark (one chip).

Measures query frames/sec through the full pipeline at 7Scenes scale:
SFD2 extraction (480x640, int8 conv stack by default — BENCH_INT8=0 for
bf16; the image-level guard below certifies the quantized path on
hardware) -> SegNetViT nc113 recognition (512 tokens)
-> candidate matching (GML, 9 layers; seg_k=1 = the reference candidate
loop's common early-exit case, with the adaptive two-phase engine handling
failures) -> batched PnP/RANSAC -> projection refinement.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N,
   "runs": [...], "recall_5cm5deg_gml": R, "value_full_sweep": N,
   "value_adaptive": N}

- value: MEDIAN of 3 timed runs (relay-chip variance is real: round-2
  measured 301 vs 360 for the same build); all runs are in "runs".
- recall_5cm5deg_gml: descriptor-injected synthetic queries with known
  ground-truth poses localized through the SAME compiled engine and the
  SAME GML matcher (fused Pallas attention/Sinkhorn/MLP kernels) that
  produce the fps number — the matcher weights are fitted to the synthetic
  scene by scripts/train_synthetic_gml.py (weights/gml_synthetic.msgpack).
  Certifies the matcher/recognition/PnP/refinement kernels on hardware;
  extraction is bypassed (descriptors injected).
- recall_5cm5deg_image: rendered query IMAGES through the full pipeline
  (SFD2 Pallas stem/NMS -> SegNetViT -> GML -> PnP) with every model
  fitted to the rendered world (scripts/train_rendered.py) — this is the
  guard that certifies the EXTRACTION kernels on hardware (VERDICT r3 #1):
  128 queries, eval-time photometric noise, match precision alongside
  (image_guard dict), and extraction_ab = fused-vs-XLA keypoint/descriptor
  parity on the current backend.
- value_full_sweep: the seg_k=10 worst case (every candidate landmark
  matched + PnP-solved, reference multimap3d.py:114-239) so regressions in
  the full sweep are tracked.
- value_adaptive: the two-phase adaptive API (phase-2 behind an on-device
  lax.cond) on the all-success workload — must stay within ~10% of the
  plain step (VERDICT r2 #6).
- mfu / tflops / flops_per_frame_g / s8_flop_fraction: issued-FLOP
  accounting of the compiled pipeline (XLA cost_analysis) against the
  composite v5e speed-of-light — bf16 ops at 197 TFLOP/s, s8 ops at 394
  TOPS (pram_tpu/utils/flops.py).
- Relay-outage behavior: if the chip probe fails for BENCH_CHIP_WAIT_S
  (default 540 s — deliberately far under any driver kill budget), ONE
  parseable JSON line is still printed with value=null,
  chip_unavailable=true and the last successful on-chip line under
  "last_good" (never as the headline fields — a replay must not be
  mistakable for a measurement). BENCH_SIM_OUTAGE=1 forces this path
  (tested by tests/test_bench_outage.py).

vs_baseline divides by 250 frames/sec/chip: BASELINE.json's north star is
">=2000 query frames/sec on v5e-8" — a POD target, i.e. 250/chip x 8-chip
data-parallel scaling. Pod-level numbers quoted anywhere in this repo are
PROJECTIONS: per-chip fps is measured on real hardware; the x8 factor
comes from virtual-mesh SPMD scaling + HLO collective accounting
(scripts/exp_dist_take.py) — ICI itself is unmeasured in this
single-chip environment. The
per-chip reading (2000/chip) is physically impossible for this workload:
SFD2 at 480x640 is ~125 GFLOP/frame dense-equivalent, so 2000 fps/chip
would need ~250 TFLOP/s, above v5e's ~197 TFLOP/s bf16 peak, before the
matcher/PnP stages spend a single FLOP.
"""

import dataclasses
import json
import os
import time

import numpy as np

WEIGHTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "weights",
    "gml_synthetic.msgpack",
)
REC_WEIGHTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "weights",
    "segnetvit_synthetic.msgpack",
)


def main():
    # the relay tunnel can drop for 1h+ and a device access then HANGS;
    # convert that into a bounded wait so driver-run benches survive flaps
    from pram_tpu.utils.chip import wait_for_chip

    lastgood_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "weights",
        "last_bench.json",
    )
    # Default wait 540 s: MUST stay well under any plausible driver budget.
    # Round 4's lesson: the driver killed the bench at ~29 min while the
    # bench was still inside its own 30-min wait, so the outage fallback
    # below never fired and the round recorded NOTHING (BENCH_r04 rc:124).
    # A short wait + an always-emitted parseable line beats a long wait.
    sim_outage = os.environ.get("BENCH_SIM_OUTAGE") == "1"
    if sim_outage or not wait_for_chip(
        max_wait_s=int(os.environ.get("BENCH_CHIP_WAIT_S", 540))
    ):
        # relay outages of 5h+ observed (ROUND_NOTES r4): rather than hang
        # or crash with no output, emit a parseable line that carries the
        # last successful ON-CHIP result under "last_good". The headline
        # fields are NULLED so a field-unaware consumer can never mistake
        # a replay for a fresh measurement (ADVICE r4).
        last_good = None
        try:
            with open(lastgood_path) as f:
                last_good = json.load(f)
        except (OSError, ValueError):
            pass  # missing or truncated cache: emit the line without it
        line = {
            "metric": "7scenes_relocalization_throughput",
            "value": None,
            "unit": "frames/sec",
            "vs_baseline": None,
            "runs": None,
            "chip_unavailable": True,
            "stale": (
                "relay outage at bench time; no measurement this run — "
                "last_good holds the most recent successful on-chip line "
                "of this bench verbatim (its own env_flags inside)"
            ),
            "requested_env_flags": _bench_env_flags(),
            "last_good": last_good,
        }
        print(json.dumps(line), flush=True)
        return

    import jax

    # persistent compilation cache: the tunnel-attached TPU backend has very
    # slow first compiles; cache compiled executables across processes
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from pram_tpu.engine.localizer import LocConfig, Localizer
    from pram_tpu.engine.matching import make_gml_match_fn
    from pram_tpu.geometry.camera import Camera
    from pram_tpu.geometry.rotations import compute_pose_error
    from pram_tpu.maps.device import to_device
    from pram_tpu.maps.synthetic import make_synthetic_scene
    from pram_tpu.models.gml import GML, GMLConfig
    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
    from pram_tpu.models.sfd2 import ResNet4x, extract

    rng = np.random.RandomState(0)
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    compute_dtype = jnp.bfloat16  # MXU-native; coords/Sinkhorn/PnP stay f32
    n_kpts = 512
    height, width = 480, 640
    n_class = 113

    # ---- models
    def cast_tree(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            t,
        )

    sfd2 = ResNet4x()
    img0 = jnp.zeros((batch, height, width, 3), jnp.float32)
    sfd2_vars_f32 = sfd2.init(jax.random.PRNGKey(0), img0)
    sfd2_vars = cast_tree(sfd2_vars_f32)

    rec = SegNetViT(SegNetViTConfig(n_class=n_class))
    d0 = jnp.zeros((batch, n_kpts, 256), jnp.float32)
    k0 = jnp.zeros((batch, n_kpts, 2), jnp.float32)
    rec_vars = cast_tree(rec.init(jax.random.PRNGKey(1), d0, k0))

    # GML weights: fitted to the synthetic scene (train_synthetic_gml.py)
    # so the recall guard below runs through the real matcher; throughput
    # is weight-independent
    gml = GML(GMLConfig(use_pallas_sinkhorn=True))
    gvars_rand = gml.init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 8, 128), jnp.float32),
        jnp.zeros((1, 8, 128), jnp.float32),
        jnp.zeros((1, 8, 2), jnp.float32),
        jnp.zeros((1, 8, 2), jnp.float32),
    )
    if os.path.exists(WEIGHTS):
        from flax import serialization

        with open(WEIGHTS, "rb") as f:
            params = serialization.from_bytes(
                gvars_rand["params"], f.read()
            )
        gvars = cast_tree({"params": params})
        gml_trained = True
    else:
        gvars = cast_tree(gvars_rand)
        gml_trained = False

    # ---- synthetic 7Scenes-scale map (descriptor dim must match matcher).
    # Per-frame keypoint tables are capped at 1024 (the reference's VRF
    # frames carry ~1k labeled keypoints after compression) — uncapped
    # synthetic frames see most of the cloud and blow up matcher attention.
    scene = make_synthetic_scene(
        rng, n_cluster=16, points_per_cluster=400, n_ref_frames=12,
        desc_dim=128, width=width, height=height,
        max_kp_per_frame=1024, max_ref_points=2048,
    )
    dmap = to_device(scene.map)
    # map descriptors in the compute dtype: the matcher and the refinement
    # NN run on them (similarities still accumulate in f32)
    dmap = dmap._replace(
        point_desc=dmap.point_desc.astype(compute_dtype)
    )

    # seg_k=1 measures the steady-state cost: the reference's candidate loop
    # early-exits after the first landmark in the common case
    # (multimap3d.py:234-239); the adaptive two-phase engine reruns the full
    # sweep only for failed frames (timed separately below).
    # gn_iters/lo_rounds: the bench opts into the shallow refinement
    # schedule explicitly (library default is the pycolmap-depth 8/2);
    # recall is measured under the SAME schedule.
    cfg = LocConfig(
        seg_k=1, min_inliers=32, threshold=8.0, num_hypotheses=128,
        do_refinement=True, gn_iters=5, lo_rounds=1,
    )
    match_fn = make_gml_match_fn(gml, gvars)
    loc = Localizer(dmap, match_fn, cfg)

    # ---- extractor: int8 inference path by default (VERDICT r3 #3 —
    # weights-static per-channel int8 with calibrated activation scales;
    # the MXU runs s8xs8 at 2x the bf16 rate). Correctness is gated by the
    # image-level guard below, which runs map build AND queries through the
    # SAME quantized path (recall_5cm5deg_image + match precision), plus
    # exp_int8.py's float-vs-int8 A/B. BENCH_INT8=0 measures the bf16 path.
    use_int8 = os.environ.get("BENCH_INT8", "1") == "1"
    if use_int8:
        from pram_tpu.maps.rendered import make_world, query_pose
        from pram_tpu.models.sfd2 import preprocess_image
        from pram_tpu.models.sfd2_int8 import cast_stem, quantize_extractor

        # calibrate on rendered-world frames — the SAME calibration the
        # image guard certifies (ADVICE r4: the timed int8 configuration
        # must match the recall-certified one, not random noise)
        world = make_world(np.random.RandomState(0))
        crng = np.random.RandomState(99)
        calib = np.stack(
            [
                world.render(
                    *query_pose(crng),
                    (500.0, 500.0, width / 2, height / 2),
                    width, height,
                )
                for _ in range(4)
            ]
        ).astype(np.float32)
        sfd2, sfd2_vars = quantize_extractor(
            sfd2, sfd2_vars_f32, preprocess_image(jnp.asarray(calib))
        )
        sfd2_vars = cast_stem(sfd2_vars, compute_dtype)

    # ---- stage 1+2: extraction + recognition (one jit)
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

    cam_p = jnp.broadcast_to(
        jnp.asarray(
            [500.0, 500.0, width / 2, height / 2, 0, 0, 0, 0], jnp.float32
        ),
        (batch, 8),
    )
    cam_s = jnp.broadcast_to(
        jnp.asarray([width, height], jnp.float32), (batch, 2)
    )
    camera = Camera(cam_p, cam_s)
    images = jnp.asarray(rng.rand(batch, height, width, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)

    # single-dispatch pipeline: the relay-attached device pays ~30 ms per
    # execute command, so front+localize fuse into one jit
    @jax.jit
    def pipeline(k, images):
        return loc._step(k, camera, *front(images))

    def time_fps(fn, args_fn, iters):
        res = None
        t0 = time.perf_counter()
        for i in range(iters):
            res = fn(*args_fn(i))
        jax.block_until_ready(jax.tree_util.tree_leaves(res)[0])
        return batch * iters / (time.perf_counter() - t0)

    # warmup / compile
    res = pipeline(key, images)
    jax.block_until_ready(res.qvec)

    iters = 8
    runs = [
        round(
            time_fps(
                pipeline,
                lambda i: (jax.random.fold_in(key, i), images),
                iters,
            ),
            2,
        )
        for _ in range(3)
    ]
    fps = float(np.median(runs))

    # ---- MFU (VERDICT r4 #3): issued flops from XLA cost analysis, split
    # into s8/bf16 fractions via the analytic extractor conv table;
    # mfu = fraction of the composite speed-of-light (pram_tpu/utils/flops.py).
    #
    # FLOP BASIS (r5): Pallas kernels are custom calls OPAQUE to XLA
    # cost_analysis, so the real pipeline's issued count undercounts
    # whenever fused kernels are active — which is the DEFAULT (attention/
    # MLP/Sinkhorn/stem run fused on TPU). The basis is therefore an
    # all-XLA twin of the SAME math (fused_attention_disabled + XLA
    # sinkhorn/stem/NMS), traced but never executed: its issued flops are
    # what the hardware must do for this pipeline regardless of which
    # kernel implements each stage. The PnP Pallas kernels stay fused in
    # the twin (MFLOP-scale per frame, negligible at GFLOP totals). The
    # compiled program's own (undercounted) figure is kept in
    # flops_visible_g for transparency.
    from pram_tpu.utils.flops import (
        compiled_flops,
        extractor_issued_flops,
        mfu_fields,
    )

    # twin flop counts are deterministic in (config, shapes) — cache the
    # VALUES so cold containers skip the twins' two extra traces. v2 keys:
    # compiled_flops now counts on a CPU lowering (client-side, no
    # compile) because the chip plugin's cost analysis drops attention
    # matmuls (utils/flops.py); v1 chip-counted values are stale.
    twin_cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "weights",
        "twin_flops.json",
    )
    try:
        with open(twin_cache_path) as f:
            _twin_cache = json.load(f)
    except (OSError, ValueError):
        _twin_cache = {}

    def xla_twin_flops(seg_k):
        """Issued flops of the all-XLA formulation at the given seg_k."""
        import jax as _jax

        ck = (
            f"v2cpu-{_jax.__version__}-int8={int(use_int8)}-k={seg_k}"
            f"-b={batch}-n={n_kpts}-{height}x{width}"
        )
        if ck in _twin_cache:
            return _twin_cache[ck]
        from pram_tpu.models.common import fused_attention_disabled

        if use_int8:
            from pram_tpu.models.sfd2_int8 import Int8ResNet4x

            t_sfd2 = Int8ResNet4x(
                outdim=sfd2.outdim, use_pallas_stem=False
            )
        else:
            t_sfd2 = ResNet4x(use_pallas_stem=False)
        t_gml = GML(GMLConfig(use_pallas_sinkhorn=False))
        t_loc = Localizer(
            dmap,
            make_gml_match_fn(t_gml, gvars),
            dataclasses.replace(cfg, seg_k=seg_k),
        )

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
            return t_loc._step(
                k, camera, kps.xy, kps.scores.astype(jnp.float32),
                feats["descriptors"].astype(compute_dtype), kps.mask,
                logits.astype(jnp.float32),
            )

        # trace-time env kernel flags must not leak into the twin
        saved = {
            k: os.environ.pop(k, None)
            for k in ("PRAM_INT8_CONV", "PRAM_INT8_MLP", "PRAM_INT8_PROJ")
        }
        try:
            with fused_attention_disabled():
                val = compiled_flops(jax.jit(t_pipe), key, images)
        finally:
            for k, v in saved.items():
                if v is not None:
                    os.environ[k] = v
        if val:
            _twin_cache[ck] = val
            try:
                tmp = twin_cache_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(_twin_cache, f)
                os.replace(tmp, twin_cache_path)
            except OSError:
                pass
        return val

    flops_batch = compiled_flops(pipeline, key, images)
    flops_visible = flops_batch
    try:
        twin = xla_twin_flops(cfg.seg_k)
        if twin:
            flops_batch = twin
    except Exception:
        pass  # keep the compiled-program figure; never block the bench
    s8_pf = (
        extractor_issued_flops(height, width)[1] if use_int8 else 0.0
    )
    mfu_out = mfu_fields(
        flops_batch / batch if flops_batch else None, fps, s8_pf
    )

    # ---- recall guard through the SAME GML path: rendered queries with
    # known gt poses; matcher = the fitted GML through the fused kernels
    queries = [scene.render_query(rng, noise_px=0.3) for _ in range(batch)]
    q_kpts = jnp.asarray(np.stack([q["keypoints"] for q in queries]))
    q_descs = jnp.asarray(
        np.stack([q["descriptors"] for q in queries])
    ).astype(compute_dtype)
    q_scores = jnp.asarray(np.stack([q["scores"] for q in queries]))
    q_mask = jnp.asarray(np.stack([q["mask"] for q in queries]))
    # recognition logits: a SegNetViT FITTED to the synthetic scene
    # (scripts/train_synthetic_gml.py --recognizer) when available —
    # candidate routing then comes from a trained model through the same
    # fused kernels as the fps path; gt one-hot logits as fallback
    rec_trained = os.path.exists(REC_WEIGHTS)
    if rec_trained:
        from flax import serialization

        rec_s = SegNetViT(
            SegNetViTConfig(descriptor_dim=128, n_class=n_class)
        )
        rtmpl = rec_s.init(
            jax.random.PRNGKey(3),
            jnp.zeros((1, 8, 128), jnp.float32),
            jnp.zeros((1, 8, 2), jnp.float32),
        )["params"]
        with open(REC_WEIGHTS, "rb") as f:
            rparams = serialization.from_bytes(rtmpl, f.read())
        nk_q = q_kpts / jnp.asarray([width, height], jnp.float32) - 0.5
        logits_j = jax.jit(
            lambda d, k, m: rec_s.apply(
                {"params": cast_tree(rparams)}, d, k, m
            )["prediction"].astype(jnp.float32)
        )(q_descs, nk_q, q_mask)
        # the nc113 head is trained with only the scene's classes in the
        # targets; slice to the map's class range for candidate routing
        logits_j = logits_j[:, :, : scene.map.n_class]
    else:
        gt_seg = np.stack([q["gt_seg"] for q in queries])
        cls = np.where(gt_seg >= 0, gt_seg + 1, 0)  # class 0 = background
        logits = np.full(
            (batch, gt_seg.shape[1], scene.map.n_class), -10.0, np.float32
        )
        np.put_along_axis(logits, cls[..., None], 10.0, axis=2)
        logits_j = jnp.asarray(logits)
    res_acc = loc.localize_batch(
        jax.random.PRNGKey(7), camera, q_kpts, q_scores, q_descs, q_mask,
        logits_j,
    )
    q_err, t_err = compute_pose_error(
        res_acc.qvec,
        res_acc.tvec,
        jnp.asarray(np.stack([q["qvec"] for q in queries])),
        jnp.asarray(np.stack([q["tvec"] for q in queries])),
    )
    ok = (
        np.asarray(res_acc.success)
        & (np.asarray(t_err) < 0.05)
        & (np.asarray(q_err) < 5.0)
    )
    recall = float(ok.mean())

    # ---- full-sweep worst case (every seg_k=10 candidate matched+solved)
    loc_k10 = Localizer(
        dmap, match_fn, dataclasses.replace(cfg, seg_k=10)
    )

    @jax.jit
    def pipeline_k10(k, images):
        return loc_k10._step(k, camera, *front(images))

    r10 = pipeline_k10(key, images)
    jax.block_until_ready(r10.qvec)
    fps_k10 = round(
        time_fps(
            pipeline_k10,
            lambda i: (jax.random.fold_in(key, 100 + i), images),
            4,
        ),
        2,
    )
    # full-sweep MFU: the roofline evidence for the k10 worst case
    # (VERDICT r4 #4) — if mfu_full_sweep ~ mfu, the sweep is running the
    # 10x matcher+PnP work at the same hardware efficiency as the
    # headline path and the gap is FLOPs, not scheduling
    flops_k10 = compiled_flops(pipeline_k10, key, images)
    try:
        twin10 = xla_twin_flops(10)
        if twin10:
            flops_k10 = twin10
    except Exception:
        pass
    mfu_k10 = mfu_fields(
        flops_k10 / batch if flops_k10 else None, fps_k10, s8_pf
    )

    # ---- adaptive two-phase API on the all-success workload (on-device
    # lax.cond phase 2): overhead vs the plain k1 step must stay small
    acc_args = (camera, q_kpts, q_scores, q_descs, q_mask, logits_j)
    r_ad = loc_k10.localize_batch_adaptive(jax.random.PRNGKey(7), *acc_args)
    jax.block_until_ready(r_ad.qvec)
    assert bool(np.all(np.asarray(r_ad.success))), "adaptive phase-1 failed"
    fps_adaptive = round(
        time_fps(
            lambda k: loc_k10.localize_batch_adaptive(k, *acc_args),
            lambda i: (jax.random.fold_in(key, 200 + i),),
            8,
        ),
        2,
    )
    # the plain 1-candidate step on the same inputs, for the ratio
    r_k1 = loc._step(jax.random.PRNGKey(7), *acc_args)
    jax.block_until_ready(r_k1.qvec)
    fps_k1_loc = round(
        time_fps(
            lambda k: loc._step(k, *acc_args),
            lambda i: (jax.random.fold_in(key, 300 + i),),
            8,
        ),
        2,
    )

    out = {
        "metric": "7scenes_relocalization_throughput",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 250.0, 4),
        "runs": runs,
        "recall_5cm5deg_gml": round(recall, 4),
        "extractor_int8": use_int8,
        "gml_trained_weights": gml_trained,
        "rec_trained_weights": rec_trained,
        "value_full_sweep": fps_k10,
        "value_adaptive": fps_adaptive,
        "value_loc_only_k1": fps_k1_loc,
        **mfu_out,
        "flops_visible_g": (
            round(flops_visible / batch / 1e9, 2) if flops_visible else None
        ),
        "flop_basis": (
            "xla_twin" if flops_batch is not flops_visible else "compiled"
        ),
        "full_sweep_flops_per_frame_g": mfu_k10.get("flops_per_frame_g"),
        "mfu_full_sweep": mfu_k10.get("mfu"),
    }

    # ---- image-level guard (VERDICT r3 #1/#7): rendered query IMAGES
    # through the full pipeline — the SFD2 extraction kernels (Pallas
    # stem/convpair/NMS) run ON HARDWARE inside the recall path, with the
    # whole stack (SFD2-lite, GML, SegNetViT nc113 at the benched 256-d
    # config) fitted to the rendered world by scripts/train_rendered.py.
    # 128 queries, eval-time photometric noise, match precision reported;
    # plus the fused-vs-XLA extraction A/B parity check.
    from pram_tpu.engine import rendered_guard

    if rendered_guard.weights_present():
        # the guard runs the SAME extractor configuration as the fps number
        # (int8 quantized path when the headline is int8): map build AND
        # queries go through the quantized extractor, so recall certifies
        # the quantization on hardware, not just the float kernels
        guard = rendered_guard.RenderedGuard(batch=batch, int8=use_int8)
        img_metrics = guard.recall(n_queries=128, noise=True)
        out["recall_5cm5deg_image"] = img_metrics.pop("recall")
        out["image_guard"] = img_metrics
        out["extraction_ab"] = rendered_guard.extraction_ab_check()
    else:
        out["recall_5cm5deg_image"] = None

    out["env_flags"] = _bench_env_flags()
    print(json.dumps(out))
    try:
        tmp = lastgood_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f)
        os.replace(tmp, lastgood_path)  # atomic: no truncated cache
    except OSError:
        pass


def _bench_env_flags():
    """The env knobs that change what this bench measures."""
    return {
        k: os.environ.get(k, "")
        for k in (
            "BENCH_INT8", "BENCH_BATCH", "PRAM_INT8_MLP",
            "PRAM_INT8_PROJ", "PRAM_INT8_CONV", "PRAM_ATTN_BWD",
            "PRAM_MLP_BWD",
        )
        if os.environ.get(k)
    }


if __name__ == "__main__":
    main()
