"""Relocalization inference/eval CLI.

Rebuild of inference.py:16-45 + loc_by_rec_eval (localization/
loc_by_rec_eval.py:25-299): load the recognition model + maps, stream query
frames (pre-extracted features) through the compiled engine in batches, and
report pose-recall buckets, seg metrics and stage timings.

Usage:
  python -m pram_tpu.cli.inference --config configs/config_train_7scenes_sfd2.yaml \
      [--rec_weight_path ckpt] [--matcher_weight_path gml.pth] [--batch 16]
"""

from __future__ import annotations

import argparse
import os.path as osp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--rec_weight_path", default=None,
                    help="torch SegNetViT checkpoint to convert")
    ap.add_argument("--matcher_weight_path", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mesh", action="store_true",
                    help="shard the query batch over all devices ('data')")
    ap.add_argument("--shard_map", action="store_true",
                    help="also row-shard the map tables over the mesh "
                         "(Aachen-scale maps that don't fit replicated)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pram_tpu.core.config import load_config, load_dataset_config
    from pram_tpu.data.loader import BatchLoader
    from pram_tpu.data.scenes import DATASET_SHORTHAND, compose_scenes
    from pram_tpu.engine.evaluator import evaluate_queries
    from pram_tpu.engine.localizer import Localizer
    from pram_tpu.cli.match_features import build_match_fn
    from pram_tpu.maps.device import to_device
    from pram_tpu.maps.loader import load_multi_map
    from pram_tpu.models.registry import build_recognizer

    cfg = load_config(args.config)

    # ---- multi-scene map
    scene_cfgs = []
    for name in cfg.dataset:
        ds = DATASET_SHORTHAND.get(name, name)
        _, scenes = load_dataset_config(
            osp.join(cfg.config_path, f"{ds}.yaml")
        )
        for scene, sc in scenes.items():
            scene_cfgs.append(
                {
                    "landmark_path": osp.join(cfg.landmark_path, ds, scene),
                    "n_cluster": sc.n_cluster,
                    "cluster_mode": sc.cluster_mode,
                    "cluster_method": sc.cluster_method,
                    "scene_name": f"{ds}/{scene}",
                }
            )
    pmap = load_multi_map(scene_cfgs, with_compress=cfg.with_compress)
    dmap = to_device(pmap)

    # ---- models
    rec = build_recognizer(
        cfg.network,
        {
            "descriptor_dim": 256 if cfg.use_mid_feature else cfg.feat_dim,
            "output_dim": cfg.output_dim,
            "n_class": pmap.n_class,
            "n_layers": cfg.layers,
        },
    )
    if args.rec_weight_path:
        from pram_tpu.models.convert import (
            convert_segnetvit,
            load_torch_state_dict,
        )

        rec_vars = convert_segnetvit(
            load_torch_state_dict(args.rec_weight_path), n_layers=cfg.layers
        )
    else:
        z = jnp.zeros((1, 8, 256 if cfg.use_mid_feature else cfg.feat_dim))
        rec_vars = rec.init(jax.random.PRNGKey(0), z, jnp.zeros((1, 8, 2)))

    match_fn = build_match_fn(cfg.matching_method, args.matcher_weight_path)
    if args.shard_map:
        from pram_tpu.maps.sharded import shard_map_tables
        from pram_tpu.parallel.mesh import make_mesh

        smap = shard_map_tables(dmap, make_mesh())
        print(f"map sharded: {smap.hbm_bytes_per_device() / 1e6:.1f} "
              f"MB/device over {smap.mesh.devices.size} devices")
        localizer = Localizer(smap, match_fn, cfg.localization)
    elif args.mesh:
        from pram_tpu.parallel.mesh import make_mesh

        localizer = Localizer(dmap, match_fn, cfg.localization,
                              mesh=make_mesh())
    else:
        localizer = Localizer(dmap, match_fn, cfg.localization)

    rec_apply = jax.jit(
        lambda d, k, m: rec.apply(rec_vars, d, k, m)["prediction"]
    )

    # ---- eval data: pre-extracted query features
    dataset = compose_scenes(
        cfg.dataset,
        {
            "landmark_path": cfg.landmark_path,
            "dataset_path": cfg.dataset_path,
            "config_path": cfg.config_path,
            "max_keypoints": cfg.max_keypoints,
            "eval_max_keypoints": cfg.eval_max_keypoints,
        },
        train=False,
    )
    loader = BatchLoader(
        dataset, batch_size=args.batch, train=False, drop_last=False
    )

    from pram_tpu.core.profiling import StageTimer

    timer = StageTimer()

    def batches():
        for b in loader.epoch(0):
            with timer.stage("rec"):
                logits = rec_apply(
                    jnp.asarray(b["descriptors"]),
                    jnp.asarray(b["norm_keypoints"]),
                    jnp.asarray(b["mask"]),
                )
            gt_P = b.get("gt_P")
            yield {
                "camera_params": b.get(
                    "camera_params",
                    np.tile(
                        np.array(
                            [500, 500, 320, 240, 0, 0, 0, 0], np.float32
                        ),
                        (len(b["mask"]), 1),
                    ),
                ),
                "camera_size": np.stack(
                    [b["image_size"][:, 1], b["image_size"][:, 0]], -1
                ),
                "keypoints": b["keypoints"],
                "scores": b["scores"],
                "descriptors": b["descriptors"],
                "mask": b["mask"],
                "seg_logits": np.asarray(logits),
                "gt_qvec": b.get(
                    "gt_qvec", np.zeros((len(b["mask"]), 4), np.float32)
                ),
                "gt_tvec": b.get(
                    "gt_tvec", np.zeros((len(b["mask"]), 3), np.float32)
                ),
                "names": b.get("file_name"),
            }

    report = evaluate_queries(localizer, batches())
    print(report.summary())
    print("stage times:", timer.summary())


if __name__ == "__main__":
    main()
