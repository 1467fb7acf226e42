"""Retrieval-driven (hloc-style) localization over a COLMAP model.

Rebuild of localization/localizer.py:28-217 + localization/pose_estimator.py
(find_2D_3D_matches:89, pose_estimator_iterative:380, pose_refinement:273):
for each query, loop over retrieved database candidates, match query
keypoints to db keypoints that have 3D points, solve PnP, early-exit when the
inlier count clears ``inlier_th``, then optionally refine against stacked
matches from covisible frames.

TPU formulation: all candidates of a query are padded into one batch and
matched + PnP-solved in a single compiled call (geometry/pnp.py), replacing
the per-candidate pycolmap loop; the covisibility refinement is one more
batched match + one big RANSAC.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.engine.localizer import normalize_kpts_like_reference
from pram_tpu.geometry.camera import Camera, make_camera
from pram_tpu.geometry.pnp import ransac_pnp
from pram_tpu.geometry.rotations import compute_pose_error, rotmat2qvec
from pram_tpu.maps.parsers import parse_image_list_with_intrinsics, parse_retrieval

ERROR_THRESHOLDS = ((0.25, 2.0), (0.5, 5.0), (5.0, 10.0))  # localizer.py:80


class H5Features:
    """Reader over an hloc feature h5 (descriptors stored [D, N])."""

    def __init__(self, path: str):
        import h5py

        self.f = h5py.File(path, "r")

    def get(self, name: str) -> Dict[str, np.ndarray]:
        g = self.f[name]
        return {
            "keypoints": g["keypoints"][()],
            "scores": g["scores"][()],
            "descriptors": g["descriptors"][()].T,
            "image_size": g["image_size"][()] if "image_size" in g else None,
        }


def db_3d_keypoints(db_image, points3D, features, obs_th: int = 0):
    """Db keypoints that observe a 3D point with track length > obs_th
    (pose_estimator.py:89-137 semantics)."""
    feat = features.get(db_image.name)
    kpts = np.asarray(feat["keypoints"], np.float32)[:, :2]
    descs = np.asarray(feat["descriptors"], np.float32)
    scores = np.asarray(feat["scores"], np.float32).reshape(-1)
    p3d_ids = np.asarray(db_image.point3D_ids)
    n = min(len(kpts), len(p3d_ids))
    valid = np.zeros(len(kpts), bool)
    xyz = np.zeros((len(kpts), 3), np.float32)
    pids = np.full(len(kpts), -1, np.int64)
    for i in range(n):
        pid = int(p3d_ids[i])
        if pid < 0 or pid not in points3D:
            continue
        if len(points3D[pid].image_ids) <= obs_th:
            continue
        valid[i] = True
        xyz[i] = points3D[pid].xyz
        pids[i] = pid
    return kpts, descs, scores, valid, xyz, pids


class HlocLocalizer:
    """Per-query candidate-loop localization (pose_estimator_iterative)."""

    def __init__(
        self,
        db_images: Dict,
        points3D: Dict,
        features: H5Features,
        match_fn,
        ransac_thresh: float = 12.0,
        inlier_th: int = 50,
        obs_th: int = 3,
        covisibility_frame: int = 50,
        do_covisibility_opt: bool = True,
        max_db_kpts: int = 4096,
        num_hypotheses: int = 256,
    ):
        self.db_images = db_images
        self.points3D = points3D
        self.features = features
        self.match_fn = match_fn
        self.ransac_thresh = ransac_thresh
        self.inlier_th = inlier_th
        self.obs_th = obs_th
        self.covisibility_frame = covisibility_frame
        self.do_covisibility_opt = do_covisibility_opt
        self.max_db_kpts = max_db_kpts
        self.num_hypotheses = num_hypotheses
        self.db_name_to_id = {im.name: i for i, im in db_images.items()}
        self._db_cache: Dict[int, tuple] = {}

    def _db(self, db_id: int):
        if db_id not in self._db_cache:
            self._db_cache[db_id] = db_3d_keypoints(
                self.db_images[db_id], self.points3D, self.features,
                self.obs_th,
            )
        return self._db_cache[db_id]

    def _match_and_lift(self, qdata, db_ids: List[int]):
        """Match the query against a batch of db frames -> 2D-3D sets."""
        K = self.max_db_kpts
        b = len(db_ids)
        d = qdata["descriptors"].shape[-1]
        dd = np.zeros((b, K, d), np.float32)
        dk = np.zeros((b, K, 2), np.float32)
        ds = np.zeros((b, K), np.float32)
        dm = np.zeros((b, K), bool)
        dxyz = np.zeros((b, K, 3), np.float32)
        dpid = np.full((b, K), -1, np.int64)
        sizes = np.zeros((b, 2), np.float32)
        for i, db_id in enumerate(db_ids):
            kpts, descs, scores, valid, xyz, pids = self._db(db_id)
            idx = np.nonzero(valid)[0][:K]
            n = len(idx)
            dd[i, :n] = descs[idx]
            dk[i, :n] = kpts[idx]
            ds[i, :n] = scores[idx]
            dm[i, :n] = True
            dxyz[i, :n] = xyz[idx]
            dpid[i, :n] = pids[idx]
            sizes[i] = 640, 480  # db sizes only affect kpt normalization

        nq = qdata["keypoints"].shape[0]
        q_sz = qdata["image_size"]
        qw = float(q_sz[0]) if q_sz is not None else 640.0
        qh = float(q_sz[1]) if q_sz is not None else 480.0
        nk0 = np.asarray(
            normalize_kpts_like_reference(
                jnp.asarray(qdata["keypoints"][:, :2]),
                jnp.asarray(qw),
                jnp.asarray(qh),
            )
        )
        nk1 = np.stack(
            [
                np.asarray(
                    normalize_kpts_like_reference(
                        jnp.asarray(dk[i]),
                        jnp.asarray(sizes[i, 0]),
                        jnp.asarray(sizes[i, 1]),
                    )
                )
                for i in range(b)
            ]
        )
        matches = np.asarray(
            self.match_fn(
                jnp.asarray(np.broadcast_to(qdata["descriptors"][None], (b, nq, d))),
                jnp.asarray(np.broadcast_to(nk0[None], (b, nq, 2))),
                jnp.asarray(
                    np.broadcast_to(
                        qdata["scores"].reshape(1, nq), (b, nq)
                    ).astype(np.float32)
                ),
                jnp.ones((b, nq), bool),
                jnp.asarray(dd),
                jnp.asarray(nk1),
                jnp.asarray(ds),
                jnp.asarray(dm),
            )
        )  # [b, nq]
        return matches, dxyz, dpid

    def localize(self, qname: str, qinfo, db_ids: List[int], key) -> Dict:
        """pose_estimator_iterative for one query (early-exit semantics)."""
        camera_model, width, height, params = qinfo
        cam = make_camera(camera_model, params, width, height)
        qdata = self.features.get(qname)
        kpq = np.asarray(qdata["keypoints"], np.float32)[:, :2]
        nq = len(kpq)

        matches, dxyz, dpid = self._match_and_lift(qdata, db_ids)
        best = None
        n_kpts = nq
        for order, db_id in enumerate(db_ids):
            m = matches[order]
            sel = m >= 0
            if sel.sum() < 8:
                continue
            xyz = dxyz[order][np.clip(m, 0, None)]
            res = ransac_pnp(
                jax.random.fold_in(key, order),
                cam,
                jnp.asarray(kpq + 0.5),
                jnp.asarray(xyz),
                jnp.asarray(sel),
                inlier_threshold=self.ransac_thresh,
                num_hypotheses=self.num_hypotheses,
                min_inliers=8,
            )
            ninl = int(res.num_inliers)
            rec = {
                "qvec": np.asarray(rotmat2qvec(res.R)),
                "tvec": np.asarray(res.t),
                "num_inliers": ninl,
                "db_id": db_id,
                "order": order,
                "inliers": np.asarray(res.inliers),
                "keypoints_query": kpq[sel & np.asarray(res.inliers)],
                "points3D_ids": dpid[order][np.clip(m, 0, None)][
                    sel & np.asarray(res.inliers)
                ],
                "success": bool(res.success),
            }
            if best is None or ninl > best["num_inliers"]:
                best = rec
            rec["n_kpts"] = n_kpts
            if ninl >= self.inlier_th:
                break

        if best is None or not best["success"]:
            # fall back to retrieved-db pose (pose_estimator.py:188-208)
            db0 = self.db_images[db_ids[0]]
            return {
                "qvec": np.asarray(db0.qvec),
                "tvec": np.asarray(db0.tvec),
                "num_inliers": 0,
                "success": False,
                "db_id": db_ids[0],
                "order": -1,
                "keypoints_query": np.zeros((0, 2)),
                "points3D_ids": np.zeros((0,), np.int64),
            }

        if self.do_covisibility_opt:
            best = self._covisibility_refine(qname, qdata, cam, best, key)
        return best

    def _covisibility_refine(self, qname, qdata, cam, best, key):
        """pose_refinement (pose_estimator.py:273-378): stack matches from
        covisible frames and run one large RANSAC."""
        db_id = best["db_id"]
        covis = defaultdict(int)
        for pid in self.db_images[db_id].point3D_ids:
            if pid < 0 or pid not in self.points3D:
                continue
            for iid in self.points3D[pid].image_ids:
                covis[iid] += 1
        ids = [
            i
            for i, _ in sorted(covis.items(), key=lambda kv: -kv[1])
        ][: self.covisibility_frame]
        if db_id not in ids:
            ids = [db_id] + ids

        matches, dxyz, dpid = self._match_and_lift(qdata, ids)
        kpq = np.asarray(qdata["keypoints"], np.float32)[:, :2]
        all_uv, all_xyz, all_pid = [], [], []
        for i in range(len(ids)):
            m = matches[i]
            sel = m >= 0
            all_uv.append(kpq[sel])
            all_xyz.append(dxyz[i][m[sel]])
            all_pid.append(dpid[i][m[sel]])
        uv = np.concatenate(all_uv) if all_uv else np.zeros((0, 2))
        xyz = np.concatenate(all_xyz) if all_xyz else np.zeros((0, 3))
        if len(uv) < 8:
            return best
        res = ransac_pnp(
            jax.random.fold_in(key, 10007),
            cam,
            jnp.asarray(uv + 0.5),
            jnp.asarray(xyz),
            jnp.ones((len(uv),), bool),
            inlier_threshold=self.ransac_thresh,
            num_hypotheses=self.num_hypotheses * 2,
            min_inliers=8,
        )
        if bool(res.success) and int(res.num_inliers) >= best["num_inliers"]:
            best = dict(best)
            best["qvec"] = np.asarray(rotmat2qvec(res.R))
            best["tvec"] = np.asarray(res.t)
            best["num_inliers"] = int(res.num_inliers)
            best["optimize"] = True
        return best


def run_localizer(
    model_path: str,
    features_path: str,
    retrieval_path: str,
    queries_path: str,
    match_fn,
    output_dir: str,
    gt_poses: Optional[Dict] = None,
    **kwargs,
) -> Dict:
    """Full eval loop (localizer.py:28-217): per-query localization, pose
    file + failure list + success tallies at the Aachen thresholds."""
    from pram_tpu.maps.colmap_io import read_model

    cameras, db_images, points3D = read_model(model_path, ".bin")
    features = H5Features(features_path)
    retrievals = parse_retrieval(retrieval_path)
    queries = parse_image_list_with_intrinsics(queries_path)

    loc = HlocLocalizer(db_images, points3D, features, match_fn, **kwargs)
    key = jax.random.PRNGKey(0)

    os.makedirs(output_dir, exist_ok=True)
    poses = {}
    failed = []
    tallies = [0] * len(ERROR_THRESHOLDS)
    loc_log = {}
    times = []
    full_log = ""
    n_total = 0
    n_failed = 0
    for qi, (qname, qinfo) in enumerate(queries):
        n_total += 1
        if qname not in retrievals:
            failed.append(qname)
            n_failed += 1
            continue
        db_ids = [
            loc.db_name_to_id[n]
            for n in retrievals[qname]
            if n in loc.db_name_to_id
        ]
        if not db_ids:
            failed.append(qname)
            n_failed += 1
            continue
        t0 = time.time()
        out = loc.localize(qname, qinfo, db_ids, jax.random.fold_in(key, qi))
        loc_time = time.time() - t0
        times.append(loc_time)
        poses[qname] = (out["qvec"], out["tvec"])
        # _loc.npy record schema = the reference's (localizer.py:161-165)
        loc_log[qname] = {
            "keypoints_query": out.get("keypoints_query", np.zeros((0, 2))),
            "points3D_ids": out.get("points3D_ids", np.zeros(0, np.int64)),
        }
        # failure criterion and per-query log line match localizer.py:138-167
        if out["num_inliers"] == 0:
            failed.append(qname)
            n_failed += 1
        print_text = (
            "All {:d}/{:d} failed cases, time[cs/fn]: {:.2f}/{:.2f}".format(
                n_failed, n_total, 0.0, loc_time
            )
        )
        if gt_poses and qname in gt_poses:
            qe, te = compute_pose_error(
                jnp.asarray(out["qvec"], jnp.float32),
                jnp.asarray(out["tvec"], jnp.float32),
                jnp.asarray(gt_poses[qname]["qvec"], jnp.float32),
                jnp.asarray(gt_poses[qname]["tvec"], jnp.float32),
            )
            for i, (t_th, q_th) in enumerate(ERROR_THRESHOLDS):
                if float(te) <= t_th and float(qe) <= q_th:
                    tallies[i] += 1
            print_text += (
                ", q_error:{:.2f} t_error:{:.2f} {:d}/{:d}/{:d}/{:d}, "
                "time: {:.2f}, {:d}pts".format(
                    float(qe), float(te), tallies[0], tallies[1], tallies[2],
                    n_total, loc_time, int(out.get("n_kpts", 0)),
                )
            )
        full_log += out.get("log_info", "") + print_text + "\n"

    # artifact set mirrors the reference writers (localizer.py:169-192):
    # poses (full query name + qvec + tvec), <poses>.failed, _full.log,
    # _loc.npy
    results = osp.join(output_dir, "poses.txt")
    with open(results, "w") as f:
        for qname, (q, t) in poses.items():
            qvec = " ".join(map(str, np.asarray(q)))
            tvec = " ".join(map(str, np.asarray(t)))
            f.write(f"{qname} {qvec} {tvec}\n")
    with open(results + ".failed", "w") as f:
        for v in failed:
            f.write(v + "\n")
    with open(osp.join(output_dir, "poses_full.log"), "w") as f:
        f.write(full_log)
    np.save(osp.join(output_dir, "loc_log.npy"), loc_log)

    n = max(len(queries), 1)
    return {
        "poses": poses,
        "failed": failed,
        "recall": {
            f"{t}m/{q}deg": c / n
            for (t, q), c in zip(ERROR_THRESHOLDS, tallies)
        },
        "mean_time": float(np.mean(times)) if times else 0.0,
    }
