"""Online localization: raw images -> tracking / relocalization stream.

Rebuild of inference.py --online + localization/loc_by_rec_online.py:24-225:
read query images from disk in trajectory order, extract (SFD2), recognize
(SegNetViT), then either track frame-to-frame or relocalize against the map;
fall back to full relocalization whenever tracking is lost
(loc_by_rec_online.py:181-189). The pangolin 3D viewer is replaced by
optional frame dumps (utils/visualization.py) — GL windows have no place in
a TPU serving host.

Usage:
  python -m pram_tpu.cli.online_localization --config C --image_dir D \
      --queries queries_with_intrinsics.txt [--save_vis DIR]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--queries", required=True,
                    help="queries_with_intrinsics.txt (trajectory order)")
    ap.add_argument("--rec_weight_path", default=None)
    ap.add_argument("--feat_weight_path", default=None)
    ap.add_argument("--matcher_weight_path", default=None)
    ap.add_argument("--max_keypoints", type=int, default=1024)
    ap.add_argument("--save_vis", default=None)
    ap.add_argument("--no_tracking", action="store_true")
    ap.add_argument(
        "--viewer_port", type=int, default=None,
        help="serve the interactive 3D viewer (pram_tpu/viz) on this port "
        "(0 = ephemeral); the browser replacement for the reference's "
        "pangolin window (localization/viewer.py)",
    )
    ap.add_argument(
        "--viewer_host", default="127.0.0.1",
        help="viewer bind address (default loopback; 0.0.0.0 exposes the "
        "map + pose stream to the network)",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pram_tpu.cli.extract_features import load_image, _pad_to_multiple
    from pram_tpu.cli.inference import main as _  # noqa: F401 (shared deps)
    from pram_tpu.cli.match_features import build_match_fn
    from pram_tpu.core.config import load_config, load_dataset_config
    from pram_tpu.data.scenes import DATASET_SHORTHAND
    from pram_tpu.engine.localizer import Localizer, localize_frame
    from pram_tpu.engine.tracker import Tracker
    from pram_tpu.geometry.camera import Camera, make_camera
    from pram_tpu.maps.device import to_device
    from pram_tpu.maps.loader import load_multi_map
    from pram_tpu.maps.parsers import parse_image_list_with_intrinsics
    from pram_tpu.models.registry import build_recognizer
    from pram_tpu.models.sfd2 import ResNet4x, extract, preprocess_image

    cfg = load_config(args.config)

    # ---- map
    scene_cfgs = []
    for name in cfg.dataset:
        ds = DATASET_SHORTHAND.get(name, name)
        _, scenes = load_dataset_config(osp.join(cfg.config_path, f"{ds}.yaml"))
        for scene, sc in scenes.items():
            scene_cfgs.append({
                "landmark_path": osp.join(cfg.landmark_path, ds, scene),
                "n_cluster": sc.n_cluster,
                "cluster_mode": sc.cluster_mode,
                "cluster_method": sc.cluster_method,
                "scene_name": f"{ds}/{scene}",
            })
    pmap = load_multi_map(scene_cfgs, with_compress=cfg.with_compress)
    dmap = to_device(pmap)

    # ---- models
    sfd2 = ResNet4x()
    if args.feat_weight_path:
        from pram_tpu.models.convert import convert_sfd2, load_torch_state_dict

        sfd2_vars = convert_sfd2(load_torch_state_dict(args.feat_weight_path))
    else:
        sfd2_vars = sfd2.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    rec = build_recognizer(cfg.network, {
        "descriptor_dim": 256, "output_dim": cfg.output_dim,
        "n_class": pmap.n_class, "n_layers": cfg.layers,
    })
    if args.rec_weight_path:
        from pram_tpu.models.convert import convert_segnetvit, load_torch_state_dict

        rec_vars = convert_segnetvit(
            load_torch_state_dict(args.rec_weight_path), n_layers=cfg.layers
        )
    else:
        rec_vars = rec.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, 256)), jnp.zeros((1, 8, 2))
        )
    rec_apply = jax.jit(lambda d, k, m: rec.apply(rec_vars, d, k, m)["prediction"])

    match_fn = build_match_fn(cfg.matching_method, args.matcher_weight_path)
    localizer = Localizer(dmap, match_fn, cfg.localization)
    tracker = Tracker(dmap, match_fn, cfg.localization)

    viewer = None
    if args.viewer_port is not None:
        from pram_tpu.viz import ViewerServer

        viewer = ViewerServer(
            pmap, port=args.viewer_port, host=args.viewer_host
        )
        print(f"viewer: http://{args.viewer_host}:{viewer.port}/")

    queries = parse_image_list_with_intrinsics(args.queries)
    key = jax.random.PRNGKey(0)
    times = {"feat": [], "rec": [], "loc": [], "total": []}
    n_ok = 0

    for qi, (qname, qinfo) in enumerate(queries):
        model_name, width, height, params = qinfo
        cam = make_camera(model_name, params, width, height)
        t0 = time.time()
        img, _, scale = load_image(osp.join(args.image_dir, qname), False, None)
        img = _pad_to_multiple(img)
        feats = extract(
            sfd2, sfd2_vars, preprocess_image(jnp.asarray(img)[None]),
            max_keypoints=args.max_keypoints, conf_th=0.005,
        )
        kps = feats["keypoints"]
        t1 = time.time()
        logits = rec_apply(
            feats["seg_descriptors"],
            kps.xy / jnp.asarray([width, height], jnp.float32) - 0.5,
            kps.mask,
        )
        t2 = time.time()

        res = None
        if not args.no_tracking and not tracker.lost:
            res = tracker.track(
                jax.random.fold_in(key, qi), Camera(cam.params, cam.size),
                kps.xy[0], kps.scores[0], feats["descriptors"][0], kps.mask[0],
            )
        if res is None or not bool(res.success):
            # full relocalization
            batch_cam = Camera(cam.params[None], cam.size[None])
            loc = localizer.localize_batch(
                jax.random.fold_in(key, 100000 + qi), batch_cam,
                kps.xy, kps.scores, feats["descriptors"], kps.mask, logits,
            )
            ok = bool(loc.success[0])

            class _R:  # uniform record
                success = ok
                qvec = np.asarray(loc.qvec[0])
                tvec = np.asarray(loc.tvec[0])
                num_inliers = int(loc.num_inliers[0])

            res = _R()
            if ok:
                from pram_tpu.engine.localizer import LocResult

                tracker.update_from_localization(
                    kps.xy[0], kps.scores[0], feats["descriptors"][0],
                    kps.mask[0],
                    LocResult(*[x[0] for x in loc]),
                    int(
                        np.asarray(dmap.seg_vrf_slot)[
                            max(int(loc.matched_sid[0]), 0)
                        ]
                    ),
                )
        t3 = time.time()
        n_ok += bool(res.success)
        times["feat"].append(t1 - t0)
        times["rec"].append(t2 - t1)
        times["loc"].append(t3 - t2)
        times["total"].append(t3 - t0)
        if viewer is not None:
            from pram_tpu.geometry.rotations import qvec2rotmat

            viewer.update(
                R=np.asarray(qvec2rotmat(jnp.asarray(res.qvec))),
                tvec=np.asarray(res.tvec),
                success=bool(res.success),
                tracking=bool(not args.no_tracking and not tracker.lost),
                matched_sid=int(getattr(res, "matched_sid", -1))
                if not np.isscalar(getattr(res, "matched_sid", -1))
                else int(getattr(res, "matched_sid", -1)),
                num_inliers=int(res.num_inliers),
                times={
                    "feat": t1 - t0, "rec": t2 - t1, "loc": t3 - t2,
                    "total": t3 - t0,
                },
                name=qname,
            )
        print(
            f"[{qi+1}/{len(queries)}] {qname}: "
            f"{'ok' if res.success else 'FAIL'} inliers={res.num_inliers} "
            f"t={1000*(t3-t0):.1f}ms"
        )

    print(
        "success {}/{}; mean times (ms): ".format(n_ok, len(queries))
        + ", ".join(
            f"{k}={1000*np.mean(v):.1f}" for k, v in times.items() if v
        )
    )


if __name__ == "__main__":
    main()
