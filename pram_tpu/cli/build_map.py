"""Landmark-map build CLI (reference: python -m recognition.recmap).

Runs the full offline landmark pipeline over one scene
(recognition/recmap.py:926-1118 process_dataset): outlier removal,
clustering, per-point descriptors, VRF selection, compression, feature
export. Per-dataset hyperparameters follow the reference's process_dataset
table (min_obs 150/250, birch threshold 0.01 indoor / 0.2 outdoor,
compression radius 15-64).

Usage:
  python -m pram_tpu.cli.build_map --model M --features F.h5 --output OUT \
      --n_cluster 16 [--cluster_mode xz] [--cluster_method birch]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="triangulated COLMAP model")
    ap.add_argument("--features", required=True, help="features h5")
    ap.add_argument("--output", required=True, help="landmark output dir")
    ap.add_argument("--n_cluster", type=int, default=16)
    ap.add_argument("--cluster_mode", default="xz")
    ap.add_argument("--cluster_method", default="birch",
                    choices=["birch", "kmeans"])
    ap.add_argument("--birch_threshold", type=float, default=0.01)
    ap.add_argument("--min_obs", type=int, default=3)
    ap.add_argument("--vrf_min_obs", type=int, default=120)
    ap.add_argument("--compress_radius", type=float, default=20.0)
    ap.add_argument("--covisible_frame", type=int, default=20)
    ap.add_argument("--outlier_neighbors", type=int, default=20)
    ap.add_argument("--outlier_std", type=float, default=2.0)
    ap.add_argument("--export_descriptors", action="store_true")
    args = ap.parse_args(argv)

    from pram_tpu.mapping.recmap import FeatureSource, RecMap

    os.makedirs(args.output, exist_ok=True)
    tag = f"n{args.n_cluster}_{args.cluster_mode}_{args.cluster_method}"

    m = RecMap()
    m.load_sfm_model(args.model)
    print(f"loaded {len(m.points3D)} points, {len(m.images)} images")
    m.remove_statics_outlier(args.outlier_neighbors, args.outlier_std)
    print(f"after outlier removal: {len(m.points3D)} points")

    m.cluster(
        k=args.n_cluster,
        mode=args.cluster_mode,
        min_obs=args.min_obs,
        method=args.cluster_method,
        birch_threshold=args.birch_threshold,
        save_fn=osp.join(args.output, f"point3D_cluster_{tag}.npy"),
    )
    features = FeatureSource(args.features)
    descs = m.assign_point3D_descriptors(
        features, save_fn=osp.join(args.output, "point3D_desc.npy")
    )
    vrf = m.create_virtual_frames(
        save_fn=osp.join(args.output, f"point3D_vrf_{tag}.npy"),
        min_obs=args.vrf_min_obs,
        covisible_frame=args.covisible_frame,
    )
    m.compress_map_by_projection(
        vrf,
        descs,
        radius=args.compress_radius,
        covisible_frames=args.covisible_frame,
        save_dir=osp.join(args.output, f"compress_model_{args.cluster_method}"),
    )
    m.export_features_to_directory(
        args.features,
        osp.join(args.output, "feats"),
        with_descriptors=args.export_descriptors,
    )
    print(f"landmark map written to {args.output}")


if __name__ == "__main__":
    main()
