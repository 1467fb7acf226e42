"""Fit the full model stack on RENDERED IMAGES of the textured world.

VERDICT r3 #1: the bench recall guard must start from images so the SFD2
extraction kernels (Pallas stem + NMS) are correctness-verified ON HARDWARE,
not just in interpret mode. This script fits, in order:

  sfd2        SFD2-lite detector+descriptor on rendered view pairs
              (detector: SuperPoint-style 65-way cell CE on the known
              texture-dot projections; descriptor: InfoNCE over exact
              cross-view correspondences)        -> weights/sfd2_rendered.msgpack
  matcher     full-size 9L GML on (query extraction vs VRF table) pairs
              with geometric ground truth        -> weights/gml_rendered.msgpack
  recognizer  SegNetViT nc113 (DEFAULT 256-d config — the exact model the
              fps path runs, closing VERDICT r3 weak #2's config mismatch)
              on extracted seg_descriptors        -> weights/segnetvit_rendered.msgpack
  eval        pose recall through the full compiled image pipeline

All stages render the SAME deterministic world (seed 0); bench.py rebuilds
the map with the saved SFD2 at bench time (deterministic on-chip).

Reference being modeled: nets/sfd2.py:269-346 (extraction),
nets/gml.py:193-209 (matcher), nets/segnetvit.py (recognition).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H = 640, 480
CAM = (500.0, 500.0, W / 2, H / 2)
SFD2_OUT = os.path.join(REPO, "weights", "sfd2_rendered.msgpack")
GML_OUT = os.path.join(REPO, "weights", "gml_rendered.msgpack")
REC_OUT = os.path.join(REPO, "weights", "segnetvit_rendered.msgpack")


def _setup_jax():
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def make_world():
    from pram_tpu.maps.rendered import make_world

    return make_world(np.random.RandomState(0))


def render_views(world, poses):
    return np.stack(
        [world.render(R, t, CAM, W, H) for R, t in poses]
    ).astype(np.float32)


def det_cells(uv: np.ndarray) -> np.ndarray:
    """Dot pixel coords -> [H/8, W/8] 65-way cell targets (64 = dustbin).

    Matches pixel_shuffle_score's channel order (models/sfd2.py:266-281):
    channel i*8+j = sub-pixel (row i, col j)."""
    cells = np.full((H // 8, W // 8), 64, np.int64)
    x = np.clip(np.round(uv[:, 0]).astype(int), 0, W - 1)
    y = np.clip(np.round(uv[:, 1]).astype(int), 0, H - 1)
    cells[y // 8, x // 8] = (y % 8) * 8 + (x % 8)
    return cells


# ---------------------------------------------------------------------------
# stage A: SFD2 detector + descriptor
# ---------------------------------------------------------------------------


def fit_sfd2(args):
    jax = _setup_jax()
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from pram_tpu.maps.rendered import query_pose, ref_poses
    from pram_tpu.models.sfd2 import ResNet4x, preprocess_image
    from pram_tpu.ops.sampling import sample_descriptors
    from pram_tpu.train.augmented import photometric_jitter

    world = make_world()
    rng = np.random.RandomState(1)

    # view pool: the reference ring + random query-distribution views
    poses = ref_poses(12, np.random.RandomState(0))
    for i in range(args.pool - 12):
        poses.append(query_pose(rng))
    t0 = time.time()
    images = render_views(world, poses)
    dots = [world.project_dots(R, t, CAM, W, H) for R, t in poses]
    print(
        f"pool: {len(poses)} views in {time.time()-t0:.0f}s, "
        f"{np.mean([len(d[0]) for d in dots]):.0f} visible dots/view",
        flush=True,
    )
    cells = np.stack([det_cells(d[0]) for d in dots])

    # cross-view correspondence pairs (common dot ids)
    m_dots = args.dots_per_pair
    prng = np.random.RandomState(2)
    pair_idx, pair_uva, pair_uvb, pair_mask = [], [], [], []
    tries = 0
    while len(pair_idx) < args.pairs and tries < args.pairs * 20:
        tries += 1
        a, b = prng.randint(len(poses)), prng.randint(len(poses))
        if a == b:
            continue
        uva, _, ida = dots[a]
        uvb, _, idb = dots[b]
        common, ia, ib = np.intersect1d(ida, idb, return_indices=True)
        if len(common) < 96:
            continue
        sel = prng.permutation(len(common))[:m_dots]
        n = len(sel)
        ua = np.zeros((m_dots, 2), np.float32)
        ub = np.zeros((m_dots, 2), np.float32)
        mk = np.zeros((m_dots,), bool)
        ua[:n] = uva[ia[sel]]
        ub[:n] = uvb[ib[sel]]
        mk[:n] = True
        pair_idx.append((a, b))
        pair_uva.append(ua)
        pair_uvb.append(ub)
        pair_mask.append(mk)
    print(f"{len(pair_idx)} training pairs", flush=True)

    d_images = jnp.asarray(images)
    d_cells = jnp.asarray(cells)
    d_pidx = jnp.asarray(np.asarray(pair_idx, np.int32))
    d_uva = jnp.asarray(np.stack(pair_uva))
    d_uvb = jnp.asarray(np.stack(pair_uvb))
    d_pmask = jnp.asarray(np.stack(pair_mask))

    model = ResNet4x(use_pallas_stem=False)  # XLA path: training needs grads
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    tx = optax.adam(args.lr)

    def det_loss(logits, tgt):
        # [B, Hc, Wc, 65] vs [B, Hc, Wc]; dot cells weighted up
        ll = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(ll, tgt[..., None], axis=-1)[..., 0]
        w = jnp.where(tgt == 64, 0.25, 1.0)
        return jnp.sum(nll * w) / jnp.sum(w)

    def info_nce(da, db, mk, tau=0.07):
        sim = (da @ db.T) / tau  # [M, M]
        neg_cols = jnp.where(mk, 0.0, -1e9)
        lab = jnp.arange(da.shape[0])
        l_ab = -jnp.take_along_axis(
            jax.nn.log_softmax(sim + neg_cols[None, :], axis=-1),
            lab[:, None], axis=-1,
        )[:, 0]
        l_ba = -jnp.take_along_axis(
            jax.nn.log_softmax(sim.T + neg_cols[None, :], axis=-1),
            lab[:, None], axis=-1,
        )[:, 0]
        both = jnp.where(mk, l_ab + l_ba, 0.0)
        return 0.5 * jnp.sum(both) / jnp.maximum(jnp.sum(mk), 1)

    def loss_fn(params, key, pi):
        ab = d_pidx[pi]
        imgs = jnp.take(d_images, ab, axis=0)  # [2, H, W, 3]
        imgs = photometric_jitter(key, imgs, 0.25, 0.25)
        out = model.apply(
            {"params": params, "batch_stats": bstats},
            preprocess_image(imgs),
        )
        tgt = jnp.take(d_cells, ab, axis=0)
        l_det = det_loss(out["logits"], tgt)
        dmap = jnp.transpose(out["desc_map"], (0, 3, 1, 2))  # [2, C, Hc, Wc]
        da = sample_descriptors(d_uva[pi], dmap[0], 4)
        db = sample_descriptors(d_uvb[pi], dmap[1], 4)
        l_desc = info_nce(da, db, d_pmask[pi])
        return l_det + args.desc_weight * l_desc, (l_det, l_desc)

    @jax.jit
    def step(params, opt_state, key, pi):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, pi
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    opt_state = tx.init(params)
    key = jax.random.PRNGKey(3)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        pi = jnp.asarray(it % len(pair_idx), jnp.int32)
        params, opt_state, loss, (ld, ldesc) = step(
            params, opt_state, sub, pi
        )
        if it % 50 == 0 or it == args.steps - 1:
            print(
                f"sfd2 step {it}: loss {float(loss):.4f} "
                f"(det {float(ld):.4f} desc {float(ldesc):.4f}) "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )

    os.makedirs(os.path.dirname(SFD2_OUT), exist_ok=True)
    out_vars = {"params": params, "batch_stats": bstats}
    with open(SFD2_OUT, "wb") as f:
        f.write(serialization.to_bytes(out_vars))
    print(f"saved {SFD2_OUT}")
    _report_repeatability(jax, jnp, world, out_vars)


def _report_repeatability(jax, jnp, world, variables):
    """Cross-view detection repeatability + NN-match rate of the fit."""
    from pram_tpu.maps.rendered import query_pose, ref_poses
    from pram_tpu.models.sfd2 import ResNet4x, extract, preprocess_image

    poses = ref_poses(12, np.random.RandomState(0))
    Ra, ta = poses[5]
    Rb, tb = query_pose(np.random.RandomState(42))
    imgs = jnp.asarray(
        render_views(world, [(Ra, ta), (Rb, tb)])
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    v = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables
    )
    model = ResNet4x()
    feats = extract(
        model, v, preprocess_image(imgs).astype(dtype),
        max_keypoints=512, conf_th=1e-4,
    )
    xy = np.asarray(feats["keypoints"].xy, np.float64)
    mask = np.asarray(feats["keypoints"].mask)
    descs = np.asarray(feats["descriptors"], np.float32)
    xyz, _, _, _, ok = world.lift(xy[0][mask[0]], Ra, ta, CAM)
    xc = xyz @ Rb.T + tb
    uvb = np.stack(
        [xc[:, 0] / xc[:, 2] * CAM[0] + CAM[2],
         xc[:, 1] / xc[:, 2] * CAM[1] + CAM[3]], -1
    )
    infov = (
        ok & (xc[:, 2] > 0.2) & (uvb[:, 0] >= 8) & (uvb[:, 0] < W - 8)
        & (uvb[:, 1] >= 8) & (uvb[:, 1] < H - 8)
    )
    b_xy = xy[1][mask[1]]
    d2 = np.linalg.norm(uvb[infov][:, None] - b_xy[None], axis=-1)
    nn_d = d2.min(1)
    nn_j = d2.argmin(1)
    close = nn_d < 2.5
    a_desc = descs[0][mask[0]][infov]
    b_desc = descs[1][mask[1]]
    sim = a_desc[close] @ b_desc.T
    nn_ok = (sim.argmax(1) == nn_j[close]).mean() if close.any() else 0.0
    print(
        json.dumps(
            {
                "repeat_2.5px": round(float(close.mean()), 3),
                "repeat_4px": round(float((nn_d < 4).mean()), 3),
                "nn_match_correct": round(float(nn_ok), 3),
                "n_proj": int(infov.sum()),
            }
        ),
        flush=True,
    )


# ---------------------------------------------------------------------------
# shared: trained extractor + scene build
# ---------------------------------------------------------------------------


def load_sfd2(jax, jnp, dtype):
    from flax import serialization

    from pram_tpu.models.sfd2 import ResNet4x

    model = ResNet4x()
    tmpl = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    with open(SFD2_OUT, "rb") as f:
        variables = serialization.from_bytes(tmpl, f.read())
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        variables,
    )
    return model, variables


def make_extract_np(jax, jnp, model, variables, dtype, max_kpts, conf_th=1e-4):
    from pram_tpu.models.sfd2 import extract, preprocess_image

    def extract_np(images, want_seg=False):
        feats = extract(
            model, variables,
            preprocess_image(jnp.asarray(images)).astype(dtype),
            max_keypoints=max_kpts, conf_th=conf_th,
        )
        kps = feats["keypoints"]
        out = (
            np.asarray(kps.xy, np.float32),
            np.asarray(kps.scores, np.float32),
            np.asarray(feats["descriptors"], np.float32),
            np.asarray(kps.mask),
        )
        if want_seg:
            out = out + (np.asarray(feats["seg_descriptors"], np.float32),)
        return out

    return extract_np


def build_scene(jax, jnp, model, variables, dtype):
    from pram_tpu.maps.rendered import build_rendered_scene

    return build_rendered_scene(
        make_extract_np(jax, jnp, model, variables, dtype, 1024),
        np.random.RandomState(0),
        width=W, height=H, n_ref=12, kp_per_ref=1024, max_ref_points=2048,
    )


def gt_assignment(scene, q_xy, q_mask, R, t, fi, px_th=3.0):
    """gt[i] = VRF-table column of query keypoint i (M = dustbin, -1 pad).

    Projects frame ``fi``'s table points into the query's ground-truth
    view; nearest column within ``px_th`` px wins.
    """
    pmap = scene.map
    m = pmap.frame_point_idx.shape[1]
    f_pt = pmap.frame_point_idx[fi]
    f_mask = pmap.frame_kp_mask[fi].astype(bool)
    xyz = pmap.point_xyz[np.clip(f_pt, 0, None)]
    xc = xyz @ R.T + t
    z = np.clip(xc[:, 2], 1e-6, None)
    uv = np.stack(
        [xc[:, 0] / z * CAM[0] + CAM[2], xc[:, 1] / z * CAM[1] + CAM[3]], -1
    )
    proj_ok = f_mask & (xc[:, 2] > 0.2)
    gt = np.full((q_xy.shape[0],), m, np.int32)
    if proj_ok.any():
        cols = np.nonzero(proj_ok)[0]
        d2 = np.linalg.norm(q_xy[:, None] - uv[cols][None], axis=-1)
        nn = d2.argmin(1)
        ok = d2[np.arange(len(q_xy)), nn] < px_th
        gt[ok] = cols[nn[ok]]
    return np.where(q_mask, gt, -1)


def best_frames(scene, R, t):
    """Rank map frames by how many of their points project into this view."""
    pmap = scene.map
    counts = []
    for fi in range(pmap.frame_point_idx.shape[0]):
        f_pt = pmap.frame_point_idx[fi]
        f_mask = pmap.frame_kp_mask[fi].astype(bool)
        xyz = pmap.point_xyz[np.clip(f_pt, 0, None)]
        xc = xyz @ R.T + t
        z = np.clip(xc[:, 2], 1e-6, None)
        uv = np.stack(
            [xc[:, 0] / z * CAM[0] + CAM[2],
             xc[:, 1] / z * CAM[1] + CAM[3]], -1,
        )
        ok = (
            f_mask & (xc[:, 2] > 0.2) & (uv[:, 0] >= 0) & (uv[:, 0] < W)
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        )
        counts.append(int(ok.sum()))
    return np.argsort(counts)[::-1]


# ---------------------------------------------------------------------------
# stage B: GML matcher on extracted features
# ---------------------------------------------------------------------------


def fit_matcher(args):
    jax = _setup_jax()
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from pram_tpu.engine.localizer import normalize_kpts_like_reference
    from pram_tpu.maps.rendered import query_pose
    from pram_tpu.models.common import fused_attention_disabled
    from pram_tpu.models.gml import GML, GMLConfig
    from pram_tpu.train.losses import matching_nll_loss

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, variables = load_sfd2(jax, jnp, dtype)
    world = make_world()
    scene = build_scene(jax, jnp, model, variables, dtype)
    print(
        f"scene: {scene.map.point_xyz.shape[0]} points, "
        f"{scene.map.frame_point_idx.shape[0]} frames", flush=True,
    )

    # query pool: rendered + extracted once, batched
    rng = np.random.RandomState(3)
    n_pool = args.pool
    t0 = time.time()
    qposes = [query_pose(rng) for _ in range(n_pool)]
    qimgs = render_views(world, qposes)
    extract_np = make_extract_np(jax, jnp, model, variables, dtype, 512)
    kx, ks, kd, km = [], [], [], []
    for i in range(0, n_pool, 16):
        x, s, d, m_ = extract_np(qimgs[i : i + 16])
        kx.append(x), ks.append(s), kd.append(d), km.append(m_)
    kx, ks = np.concatenate(kx), np.concatenate(ks)
    kd, km = np.concatenate(kd), np.concatenate(km)
    print(f"query pool: {n_pool} views in {time.time()-t0:.0f}s", flush=True)

    pmap = scene.map
    mrows = pmap.frame_point_idx.shape[1]

    def make_batch(rs):
        d0, k0, m0, d1, k1, m1, gts = [], [], [], [], [], [], []
        for _ in range(args.batch):
            qi = rs.randint(n_pool)
            Rq, tq = qposes[qi]
            ranked = best_frames(scene, Rq, tq)
            fi = int(ranked[rs.randint(min(3, len(ranked)))])
            gt = gt_assignment(scene, kx[qi], km[qi], Rq, tq, fi)
            d0.append(kd[qi])
            k0.append(kx[qi])
            m0.append(km[qi])
            d1.append(
                pmap.point_desc[np.clip(pmap.frame_point_idx[fi], 0, None)]
            )
            k1.append(pmap.frame_kp_uv[fi])
            m1.append(pmap.frame_kp_mask[fi])
            gts.append(gt)
        return (
            np.stack(d0), np.stack(k0), np.stack(m0).astype(bool),
            np.stack(d1), np.stack(k1), np.stack(m1).astype(bool),
            np.stack(gts),
        )

    rs = np.random.RandomState(4)
    first = make_batch(rs)
    n_matched = (first[-1] >= 0) & (first[-1] < mrows)
    print(
        f"gt matches/query: {n_matched.sum(1).mean():.0f} of "
        f"{first[2].sum(1).mean():.0f} valid kpts", flush=True,
    )

    gml = GML(GMLConfig())
    w_arr, h_arr = jnp.asarray(float(W)), jnp.asarray(float(H))

    def norm(k):
        return normalize_kpts_like_reference(jnp.asarray(k), w_arr, h_arr)

    with fused_attention_disabled():
        gvars = gml.init(
            jax.random.PRNGKey(0),
            jnp.asarray(first[0]), jnp.asarray(first[3]),
            norm(first[1]), norm(first[4]),
            jnp.asarray(first[2]), jnp.asarray(first[5]),
        )

    def loss_fn(params, d0, d1, nk0, nk1, m0, m1, gt):
        out = gml.apply({"params": params}, d0, d1, nk0, nk1, m0, m1)
        return matching_nll_loss(out["plan"], gt, m1)

    tx = optax.adam(args.lr)

    def step(params, opt_state, batch):
        d0, k0, m0, d1, k1, m1, gt = batch
        loss, grads = jax.value_and_grad(loss_fn)(
            params, d0, d1, norm(k0), norm(k1), m0, m1, gt
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    pool = [
        tuple(jnp.asarray(a) for a in (first if i == 0 else make_batch(rs)))
        for i in range(min(args.steps, 48))
    ]
    params = gvars["params"]
    with fused_attention_disabled():
        jstep = jax.jit(step)
        opt_state = tx.init(params)
        t0 = time.time()
        for it in range(args.steps):
            params, opt_state, loss = jstep(
                params, opt_state, pool[it % len(pool)]
            )
            if it % 50 == 0 or it == args.steps - 1:
                print(
                    f"gml step {it}: loss {float(loss):.4f} "
                    f"({time.time()-t0:.0f}s)", flush=True,
                )
    os.makedirs(os.path.dirname(GML_OUT), exist_ok=True)
    with open(GML_OUT, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"saved {GML_OUT}")


# ---------------------------------------------------------------------------
# stage C: SegNetViT recognizer on extracted seg_descriptors
# ---------------------------------------------------------------------------


def fit_recognizer(args):
    jax = _setup_jax()
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from pram_tpu.maps.rendered import query_pose
    from pram_tpu.models.common import fused_attention_disabled
    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
    from pram_tpu.train.losses import seg_accuracy, seg_loss_weighted

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, variables = load_sfd2(jax, jnp, dtype)
    world = make_world()

    rng = np.random.RandomState(5)
    n_pool = args.pool
    qposes = [query_pose(rng) for _ in range(n_pool)]
    qimgs = render_views(world, qposes)
    extract_np = make_extract_np(jax, jnp, model, variables, dtype, 512)
    kx, km, sd, lab = [], [], [], []
    for i in range(0, n_pool, 16):
        x, _, _, m_, s = extract_np(qimgs[i : i + 16], want_seg=True)
        for j in range(x.shape[0]):
            R, t = qposes[i + j]
            _, pid, lu, lv, ok = world.lift(
                x[j].astype(np.float64), R, t, CAM
            )
            cls = np.where(
                ok & m_[j], world.seg_class(pid, lu, lv) + 1, 0
            )
            lab.append(cls)
        kx.append(x), km.append(m_), sd.append(s)
    kx, km = np.concatenate(kx), np.concatenate(km)
    sd, lab = np.concatenate(sd), np.stack(lab)
    print(
        f"rec pool: {n_pool} views, "
        f"{(lab > 0).sum() / max(km.sum(), 1):.2f} labeled frac", flush=True,
    )

    # the DEFAULT fps-path config: 256-d input (SFD2 seg_descriptors), nc113
    rec = SegNetViT(SegNetViTConfig(n_class=113))
    nk = kx / np.asarray([W, H], np.float32) - 0.5

    def batch_of(idx):
        return (
            jnp.asarray(sd[idx]), jnp.asarray(nk[idx]),
            jnp.asarray(lab[idx]), jnp.asarray(km[idx].astype(bool)),
        )

    rs = np.random.RandomState(6)
    rvars = rec.init(
        jax.random.PRNGKey(0), *batch_of(np.arange(args.batch))[:2],
        jnp.asarray(km[: args.batch].astype(bool)),
    )
    params = rvars["params"]
    tx = optax.adam(args.lr)

    def loss_fn(params, d, k, g, m):
        logits = rec.apply({"params": params}, d, k, m)["prediction"]
        loss = seg_loss_weighted(logits, g, m, weight_background=0.1)
        corr, _ = seg_accuracy(logits, g, m)
        return loss, corr

    def step(params, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, *batch
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    pool = [
        batch_of(rs.permutation(n_pool)[: args.batch])
        for _ in range(min(args.steps, 48))
    ]
    with fused_attention_disabled():
        jstep = jax.jit(step)
        opt_state = tx.init(params)
        t0 = time.time()
        for it in range(args.steps):
            params, opt_state, loss, acc = jstep(
                params, opt_state, pool[it % len(pool)]
            )
            if it % 50 == 0 or it == args.steps - 1:
                print(
                    f"rec step {it}: loss {float(loss):.4f} "
                    f"acc {float(acc):.3f} ({time.time()-t0:.0f}s)",
                    flush=True,
                )
    os.makedirs(os.path.dirname(REC_OUT), exist_ok=True)
    with open(REC_OUT, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"saved {REC_OUT} (final acc {float(acc):.3f})")


# ---------------------------------------------------------------------------
# stage D: end-to-end recall through the full image pipeline
# ---------------------------------------------------------------------------


def evaluate(args):
    jax = _setup_jax()

    from pram_tpu.engine.rendered_guard import run_guard

    out = run_guard(
        jax, n_queries=args.queries, batch=32, noise=not args.no_noise
    )
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="stage", required=True)
    a = sub.add_parser("sfd2")
    a.add_argument("--steps", type=int, default=600)
    a.add_argument("--pairs", type=int, default=120)
    a.add_argument("--pool", type=int, default=36)
    a.add_argument("--dots_per_pair", type=int, default=256)
    a.add_argument("--lr", type=float, default=1e-3)
    a.add_argument("--desc_weight", type=float, default=1.0)
    b = sub.add_parser("matcher")
    b.add_argument("--steps", type=int, default=600)
    b.add_argument("--batch", type=int, default=8)
    b.add_argument("--pool", type=int, default=48)
    b.add_argument("--lr", type=float, default=2e-4)
    c = sub.add_parser("recognizer")
    c.add_argument("--steps", type=int, default=400)
    c.add_argument("--batch", type=int, default=8)
    c.add_argument("--pool", type=int, default=48)
    c.add_argument("--lr", type=float, default=3e-4)
    d = sub.add_parser("eval")
    d.add_argument("--queries", type=int, default=128)
    d.add_argument("--no_noise", action="store_true")
    args = ap.parse_args()
    {
        "sfd2": fit_sfd2,
        "matcher": fit_matcher,
        "recognizer": fit_recognizer,
        "eval": evaluate,
    }[args.stage](args)


if __name__ == "__main__":
    main()
