"""Frame-to-frame tracker: temporal localization without recognition.

TPU-native rebuild of localization/tracker.py:21-338: match the current
frame's keypoints against the previous frame, lift matches through the
previous frame's per-keypoint 3D associations, solve PnP; if inliers fall
below the refinement trigger (256, tracker.py:85), refine against the map by
projection. The ``lost`` flag falls back to full relocalization
(loc_by_rec_online.py:181-189) — orchestrated by the host Tracker class, with
all array work in one jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.engine.localizer import (
    LocConfig,
    MatchFn,
    _refine_by_projection,
    normalize_kpts_like_reference,
)
from pram_tpu.geometry.camera import Camera
from pram_tpu.geometry.pnp import ransac_pnp
from pram_tpu.geometry.rotations import rotmat2qvec
from pram_tpu.maps.device import DeviceMap


class TrackResult(NamedTuple):
    qvec: jax.Array
    tvec: jax.Array
    R: jax.Array
    success: jax.Array
    num_inliers: jax.Array
    kpt_point_idx: jax.Array  # [N] updated 3D associations for the new frame
    kpt_xyz: jax.Array


def track_frame(
    key: jax.Array,
    dmap: DeviceMap,
    match_fn: MatchFn,
    camera: Camera,
    curr_kpts: jax.Array,  # [N, 2]
    curr_scores: jax.Array,  # [N]
    curr_descs: jax.Array,  # [N, D]
    curr_mask: jax.Array,  # [N]
    last_kpts: jax.Array,  # [M, 2]
    last_scores: jax.Array,
    last_descs: jax.Array,
    last_mask: jax.Array,
    last_point_idx: jax.Array,  # [M] map point index per last kpt (-1 none)
    last_vrf_slot: jax.Array,  # scalar: VRF slot of the last localization
    cfg: LocConfig,
    refine_below: int = 256,
) -> TrackResult:
    """One tracking step (tracker.py:162-233 + the <256-inlier refinement)."""
    keys = jax.random.split(key, 2)
    w = camera.size[0]
    h = camera.size[1]
    nk0 = normalize_kpts_like_reference(curr_kpts, w, h)[None]
    nk1 = normalize_kpts_like_reference(last_kpts, w, h)[None]
    matches = match_fn(
        curr_descs[None], nk0, curr_scores[None], curr_mask[None],
        last_descs[None], nk1, last_scores[None], last_mask[None],
    )[0]  # [N]

    m_valid = matches >= 0
    safe = jnp.clip(matches, 0, last_kpts.shape[0] - 1)
    m_pt = jnp.where(m_valid, last_point_idx[safe], -1)
    has_3d = m_pt >= 0
    safe_pt = jnp.clip(m_pt, 0, dmap.point_xyz.shape[0] - 1)
    m_xyz = dmap.point_xyz[safe_pt]
    corr_mask = m_valid & has_3d & curr_mask

    res = ransac_pnp(
        keys[0],
        camera,
        curr_kpts + 0.5,
        m_xyz,
        corr_mask,
        inlier_threshold=cfg.threshold,
        num_hypotheses=cfg.num_hypotheses,
        min_inliers=cfg.min_inliers,
    )
    kpt_point_idx = jnp.where(res.inliers, m_pt, -1)
    kpt_xyz = m_xyz

    # map refinement when tracking-only inliers are low (tracker.py:85-94)
    need_refine = res.success & (res.num_inliers < refine_below)
    Rr, tr, inl_r, ref_ok, r_pt_idx, r_xyz = _refine_by_projection(
        keys[1], dmap, camera, curr_kpts, curr_descs, curr_mask,
        last_vrf_slot, res.R, res.t, cfg,
    )
    use = need_refine & ref_ok
    R_fin = jnp.where(use, Rr, res.R)
    t_fin = jnp.where(use, tr, res.t)
    inl_fin = jnp.where(use, inl_r, res.num_inliers)
    kpt_point_idx = jnp.where(use, r_pt_idx, kpt_point_idx)
    kpt_xyz = jnp.where(use[..., None], r_xyz, kpt_xyz)

    success = inl_fin >= cfg.min_inliers
    return TrackResult(
        qvec=rotmat2qvec(R_fin),
        tvec=t_fin,
        R=R_fin,
        success=success,
        num_inliers=inl_fin,
        kpt_point_idx=kpt_point_idx,
        kpt_xyz=kpt_xyz,
    )


class Tracker:
    """Host-side tracking state machine (lost flag + last-frame cache).

    Mirrors the reference Tracker's control flow: when ``lost`` the caller
    should run full relocalization (Localizer) and feed the result back via
    ``update_from_localization``; otherwise ``track`` advances frame-to-frame.
    """

    def __init__(self, dmap: DeviceMap, match_fn: MatchFn, cfg: LocConfig):
        self.dmap = dmap
        self.cfg = cfg
        self.match_fn = match_fn
        self.lost = True
        self._last = None  # dict of last-frame arrays
        self._step = jax.jit(
            lambda key, cam_p, cam_s, ck, cs, cd, cm, lk, ls, ld, lm, lp, slot:
            track_frame(
                key, self.dmap, self.match_fn, Camera(cam_p, cam_s),
                ck, cs, cd, cm, lk, ls, ld, lm, lp, slot, self.cfg,
            )
        )

    def update_from_localization(
        self, kpts, scores, descs, mask, loc_result, vrf_slot
    ):
        """Cache the relocalized frame as the tracking reference."""
        self._last = {
            "kpts": kpts,
            "scores": scores,
            "descs": descs,
            "mask": mask,
            "point_idx": loc_result.kpt_point_idx,
            "vrf_slot": jnp.asarray(vrf_slot, jnp.int32),
        }
        self.lost = not bool(loc_result.success)

    def track(self, key, camera: Camera, kpts, scores, descs, mask):
        """Track the current frame against the cached previous frame."""
        if self._last is None or self.lost:
            return None
        res = self._step(
            key, camera.params, camera.size, kpts, scores, descs, mask,
            self._last["kpts"], self._last["scores"], self._last["descs"],
            self._last["mask"], self._last["point_idx"],
            self._last["vrf_slot"],
        )
        if bool(res.success):
            self._last = {
                "kpts": kpts,
                "scores": scores,
                "descs": descs,
                "mask": mask,
                "point_idx": res.kpt_point_idx,
                "vrf_slot": self._last["vrf_slot"],
            }
            self.lost = False
        else:
            self.lost = True
        return res
