"""Pair-list feature matching CLI: features h5 + pairs -> matches h5.

Rebuild of localization/match_features_batch.py:132-242: for every image
pair, run the configured matcher and store matches0/matching_scores0 under
the hloc pair naming. TPU formulation: pairs are bucketed into fixed-shape
padded batches and matched in one compiled call per bucket (instead of the
reference's one-GPU-call-per-pair + threaded h5 writer).

Usage:
  python -m pram_tpu.cli.match_features --pairs pairs.txt \
      --features feats.h5 --export_fn matches.h5 --conf gml [--weight_path W]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from typing import Dict, List, Optional, Tuple

import numpy as np

from pram_tpu.maps.parsers import names_to_pair

CONFS = {
    "gml": {"output": "gml", "model": {"name": "gml", "sinkhorn_iterations": 20}},
    "adagml": {
        "output": "adagml",
        "model": {"name": "adagml", "sinkhorn_iterations": 20},
    },
    "gm": {"output": "gm", "model": {"name": "gm", "sinkhorn_iterations": 20}},
    "NNM": {
        "output": "NNM",
        "model": {"name": "nearest_neighbor", "do_mutual_check": True},
    },
}


def build_match_fn(conf_name: str, weight_path: Optional[str] = None):
    """Create the engine match_fn for a matcher config."""
    import jax
    import jax.numpy as jnp

    name = CONFS[conf_name]["model"]["name"]
    if name == "nearest_neighbor":
        from pram_tpu.engine.matching import nn_with_scores

        return nn_with_scores()
    if name == "gml":
        from pram_tpu.engine.matching import with_scores
        from pram_tpu.models.gml import GML, GMLConfig

        model = GML(GMLConfig())
        if weight_path:
            from pram_tpu.models.convert import convert_gml, load_torch_state_dict

            variables = jax.tree_util.tree_map(
                np.asarray, convert_gml(load_torch_state_dict(weight_path))
            )
        else:
            z = jnp.zeros((1, 8, 128))
            k = jnp.zeros((1, 8, 2))
            variables = model.init(jax.random.PRNGKey(0), z, z, k, k)
        return with_scores(model, variables)
    if name == "adagml":
        from pram_tpu.engine.matching import with_scores
        from pram_tpu.models.adagml import AdaGML, AdaGMLConfig

        model = AdaGML(AdaGMLConfig())
        if weight_path:
            from pram_tpu.models.convert import (
                convert_adagml,
                load_torch_state_dict,
            )

            variables = jax.tree_util.tree_map(
                np.asarray, convert_adagml(load_torch_state_dict(weight_path))
            )
        else:
            z = jnp.zeros((1, 8, 128))
            k = jnp.zeros((1, 8, 2))
            variables = model.init(jax.random.PRNGKey(0), z, z, k, k)
        return with_scores(model, variables)
    if name == "gm":
        from pram_tpu.engine.matching import with_scores
        from pram_tpu.models.gm import GM, GMConfig

        model = GM(GMConfig())
        z = jnp.zeros((1, 8, 128))
        k = jnp.zeros((1, 8, 2))
        s = jnp.zeros((1, 8))
        variables = model.init(jax.random.PRNGKey(0), z, z, k, k, s, s)
        return with_scores(model, variables, uses_scores=True)
    raise ValueError(f"unknown matcher {conf_name}")


def read_pairs(path: str) -> List[Tuple[str, str]]:
    pairs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                a, b = line.split(" ")
                pairs.append((a, b))
    return pairs


def match_from_paths(
    pairs: List[Tuple[str, str]],
    features_path: str,
    export_fn: str,
    conf_name: str = "gml",
    weight_path: Optional[str] = None,
    batch_size: int = 8,
    pad_to: int = 4096,
):
    import h5py
    import jax.numpy as jnp

    from pram_tpu.engine.localizer import normalize_kpts_like_reference

    match_fn = build_match_fn(conf_name, weight_path)
    feats = h5py.File(features_path, "r")
    cache: Dict[str, Dict[str, np.ndarray]] = {}

    def get(name):
        if name not in cache:
            g = feats[name]
            cache[name] = {
                "keypoints": g["keypoints"][()].astype(np.float32),
                "scores": g["scores"][()].astype(np.float32).reshape(-1),
                "descriptors": g["descriptors"][()].T.astype(np.float32),
                "image_size": g["image_size"][()]
                if "image_size" in g
                else np.array([640, 480]),
            }
        return cache[name]

    # skip already-done pairs (match_features_batch.py behavior)
    done = set()
    if osp.exists(export_fn):
        with h5py.File(export_fn, "r") as f:
            done = {p for p in (names_to_pair(*pr) for pr in pairs) if p in f}
    todo = [p for p in pairs if names_to_pair(*p) not in done]

    with h5py.File(export_fn, "a") as out:
        for start in range(0, len(todo), batch_size):
            chunk = todo[start : start + batch_size]
            b = len(chunk)
            dim = get(chunk[0][0])["descriptors"].shape[1]
            d0 = np.zeros((b, pad_to, dim), np.float32)
            d1 = np.zeros((b, pad_to, dim), np.float32)
            k0 = np.zeros((b, pad_to, 2), np.float32)
            k1 = np.zeros((b, pad_to, 2), np.float32)
            s0 = np.zeros((b, pad_to), np.float32)
            s1 = np.zeros((b, pad_to), np.float32)
            m0 = np.zeros((b, pad_to), bool)
            m1 = np.zeros((b, pad_to), bool)
            n0s = []
            for i, (a, c) in enumerate(chunk):
                fa, fc = get(a), get(c)
                na = min(len(fa["keypoints"]), pad_to)
                nc = min(len(fc["keypoints"]), pad_to)
                n0s.append(na)
                d0[i, :na] = fa["descriptors"][:na]
                d1[i, :nc] = fc["descriptors"][:nc]
                wa, ha = fa["image_size"][:2]
                wc, hc = fc["image_size"][:2]
                k0[i, :na] = np.asarray(
                    normalize_kpts_like_reference(
                        jnp.asarray(fa["keypoints"][:na, :2]),
                        jnp.asarray(float(wa)), jnp.asarray(float(ha)),
                    )
                )
                k1[i, :nc] = np.asarray(
                    normalize_kpts_like_reference(
                        jnp.asarray(fc["keypoints"][:nc, :2]),
                        jnp.asarray(float(wc)), jnp.asarray(float(hc)),
                    )
                )
                s0[i, :na] = fa["scores"][:na]
                s1[i, :nc] = fc["scores"][:nc]
                m0[i, :na] = True
                m1[i, :nc] = True

            matches, mscores = match_fn(
                jnp.asarray(d0), jnp.asarray(k0), jnp.asarray(s0),
                jnp.asarray(m0), jnp.asarray(d1), jnp.asarray(k1),
                jnp.asarray(s1), jnp.asarray(m1),
            )
            matches = np.asarray(matches)
            mscores = np.asarray(mscores)
            for i, (a, c) in enumerate(chunk):
                pair = names_to_pair(a, c)  # nested h5 group (hloc layout)
                g = out.create_group(pair)
                na = n0s[i]
                g.create_dataset("matches0", data=matches[i, :na].astype(np.int32))
                g.create_dataset(
                    "matching_scores0", data=mscores[i, :na].astype(np.float32)
                )
    feats.close()
    return export_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", required=True)
    ap.add_argument("--features", required=True)
    ap.add_argument("--export_fn", required=True)
    ap.add_argument("--conf", default="gml", choices=list(CONFS))
    ap.add_argument("--weight_path", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()
    match_from_paths(
        read_pairs(args.pairs),
        args.features,
        args.export_fn,
        args.conf,
        args.weight_path,
        args.batch_size,
    )


if __name__ == "__main__":
    main()
