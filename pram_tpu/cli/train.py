"""Recognition training CLI.

Rebuild of train.py:28-170: load the experiment YAML, compose the multi-scene
dataset, build the recognition model, train data-parallel. Instead of
mp.spawn + NCCL DDP (train.py:64-108), one process drives a pjit'd step over
the local device mesh; multi-host runs shard the input pipeline by host id
(data/loader.py).

Usage:
  python -m pram_tpu.cli.train --config configs/config_train_7scenes_sfd2.yaml
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--save_dir", default=None)
    ap.add_argument("--no_mesh", action="store_true",
                    help="single-device (debug)")
    ap.add_argument(
        "--tp", type=int, default=1, metavar="N",
        help="model-axis size: shard attention heads, the seg head, and "
        "the optimizer state N-ways over a ('data','model') mesh "
        "(parallel/tp.py); heads too large to replicate train with 1/N "
        "of params+moments per device",
    )
    ap.add_argument(
        "--sp", type=int, default=1, metavar="N",
        help="sequence-axis size: shard the token axis N-ways over a "
        "('data','seq') mesh (parallel/tp.py sequence parallelism — one "
        "stacked-KV all-gather per layer); N must divide max_keypoints",
    )
    ap.add_argument(
        "--pp", type=int, default=1, metavar="N",
        help="pipeline-axis size: split the transformer stack into N "
        "GPipe stages over a ('data','pipe') mesh (parallel/tp.py); "
        "each device holds 1/N of the layer params + Adam moments",
    )
    ap.add_argument(
        "--pp_micro", type=int, default=2, metavar="M",
        help="microbatches per pipeline step (with --pp); the per-data-"
        "shard batch must divide M",
    )
    ap.add_argument(
        "--packs", default=None, metavar="DIR",
        help="feature-pack directory: batches come from the native C++ "
        "sampler (data/pack_loader.py) instead of the per-item Python "
        "path; packs are built (once) from the composed scenes and cached "
        "as DIR/<idx>_<scene>.npz",
    )
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from pram_tpu.core.config import load_config
    from pram_tpu.data.loader import BatchLoader
    from pram_tpu.data.scene import normalize_size
    from pram_tpu.data.scenes import compose_scenes
    from pram_tpu.models.registry import build_recognizer
    from pram_tpu.train.trainer import Trainer, make_data_mesh

    cfg = load_config(args.config)
    tcfg = cfg.train_config()

    dataset = compose_scenes(
        cfg.dataset,
        {
            "landmark_path": cfg.landmark_path,
            "dataset_path": cfg.dataset_path,
            "config_path": cfg.config_path,
            "max_keypoints": cfg.max_keypoints,
            "eval_max_keypoints": cfg.eval_max_keypoints,
            "min_inliers": cfg.min_inliers,
            "max_inliers": cfg.max_inliers,
        },
        train=True,
    )
    n_class = dataset.n_class
    print(f"composed {len(dataset)} samples, {n_class} classes")

    model = build_recognizer(
        cfg.network,
        {
            "descriptor_dim": 256 if cfg.use_mid_feature else cfg.feat_dim,
            "output_dim": cfg.output_dim,
            "n_class": n_class,
            "n_layers": cfg.layers,
        },
    )

    if args.packs:
        from pram_tpu.data.feature_pack import FeaturePack
        from pram_tpu.data.pack_loader import PackLoader

        os.makedirs(args.packs, exist_ok=True)
        packs = []
        for si, sub in enumerate(dataset.sub_sets):
            fn = osp.join(args.packs, f"{si:02d}_{sub.dataset}.npz")
            if not osp.exists(fn):
                print(f"building feature pack {fn} ...")
                FeaturePack.build(sub, with_descriptors=True).save(fn)
            packs.append(FeaturePack.load(fn))
        if not all(p.desc_dim for p in packs):
            raise SystemExit(
                "--packs training needs descriptors in the packs; re-export "
                "features with descriptors and delete the stale .npz files"
            )
        loader = PackLoader(
            packs,
            [s.n_class - 1 for s in dataset.sub_sets],
            batch_size=cfg.batch_size,
            nfeatures=cfg.max_keypoints,
            min_inliers=cfg.min_inliers,
            max_inliers=cfg.max_inliers,
            num_hosts=jax.process_count(),
            host_id=jax.process_index(),
        )
    else:
        # example batch for init (loader emits fixed shapes)
        loader = BatchLoader(
            dataset,
            batch_size=cfg.batch_size,
            train=True,
            num_workers=cfg.workers,
            its_per_epoch=cfg.its_per_epoch,
            num_hosts=jax.process_count(),
            host_id=jax.process_index(),
        )
    example = next(iter(loader.epoch(0)))
    # descriptors must come from the cached features (export with
    # descriptors) — the with_aug in-step extraction path is
    # pram_tpu.train.augmented
    if "seg_descriptors" not in example:
        raise SystemExit(
            "training from cached features requires the feature export to "
            "include descriptors (RecMap.export_features_to_directory with "
            "with_descriptors=True); for on-the-fly augmentation see "
            "pram_tpu.train.augmented"
        )

    param_specs = None
    apply_fn = None
    params_transform = None
    if sum(x > 1 for x in (args.tp, args.sp, args.pp)) > 1:
        raise SystemExit(
            "--tp/--sp/--pp are separate layouts here; pick one "
            "(the composed TP x SP forward is parallel/tp.py:"
            "make_tp_sp_segnetvit_fn, demo scripts/exp_parallel.py)"
        )
    if args.no_mesh:
        mesh = None
    elif args.sp > 1 or args.pp > 1:
        from pram_tpu.parallel.tp import trainer_parallel_setup

        try:
            mesh, hooks = trainer_parallel_setup(
                cfg.network, model.config,
                sp=args.sp, pp=args.pp, n_micro=args.pp_micro,
                n_tokens=cfg.max_keypoints, batch_size=cfg.batch_size,
            )
        except ValueError as e:
            raise SystemExit(str(e))
        apply_fn = hooks["apply_fn"]
        params_transform = hooks["params_transform"]
        param_specs = hooks["param_specs"]
        kind = "sp" if args.sp > 1 else "pp"
        print(f"{kind}={max(args.sp, args.pp)}: mesh "
              f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")
    elif args.tp > 1:
        from pram_tpu.parallel.mesh import make_mesh
        from pram_tpu.parallel.tp import segnetvit_tp_specs

        mesh = make_mesh(model=args.tp)
        abs_vars = jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            example["seg_descriptors"],
            example["norm_keypoints"],
            example.get("mask"),
        )
        param_specs = segnetvit_tp_specs(abs_vars["params"], args.tp)
        n_sharded = sum(
            1
            for s in jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(
                    lambda sp: sp != jax.sharding.PartitionSpec(),
                    param_specs,
                    is_leaf=lambda x: isinstance(
                        x, jax.sharding.PartitionSpec
                    ),
                )
            )
            if s
        )
        if not n_sharded:
            raise SystemExit(
                f"--tp {args.tp}: no parameter of '{cfg.network}' matches "
                "the tensor-parallel layout (parallel/tp.py is defined for "
                "the attention recognizers, e.g. segnetvit)"
            )
        print(f"tp={args.tp}: {n_sharded} parameters model-axis-sharded")
    else:
        mesh = make_data_mesh()
    save_dir = args.save_dir or osp.join(
        cfg.save_path,
        time.strftime("%Y%m%d_%H%M%S")
        + f"_{cfg.network}_L{cfg.layers}_nc{n_class}",
    )
    trainer = Trainer(
        model, tcfg, example, save_dir=save_dir, mesh=mesh,
        param_specs=param_specs, apply_fn=apply_fn,
        params_transform=params_transform,
    )
    if cfg.resume_path:
        trainer.restore_checkpoint(cfg.resume_path)
    trainer.train(lambda epoch: loader.epoch(epoch))


if __name__ == "__main__":
    main()
