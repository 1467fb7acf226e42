"""Fit AdaGML on the Aachen-shaped synthetic scene (VERDICT r3 #2).

bench_aachen.py's operating point (4096 query kpts, nc513, 2048-kpt VRF
tables, AdaGML with adaptive pooling) previously ran with RANDOM matcher
weights — fps only, no correctness witness. This script fits the full
9-layer AdaGML on descriptor-injected pairs from the SAME scene the bench
uses (seed 0):

- matching supervision: assignment NLL on the Sinkhorn plan
  (train/losses.py matching_nll_loss, the IMP objective);
- pooling supervision: per-layer matchability BCE on the pooling-head
  confidences — the adaptive pruning thresholds are hard selections that
  pass no gradient, so the heads need an explicit target (a token should be
  confident iff it has a ground-truth match), mirroring the reference's
  pooling loss (nets/adagml.py:114-138 heads; IMP training).

Training runs AT THE EVAL SHAPE — 4096 query tokens vs the full 2048-row
VRF tables (XLA attention path with per-layer rematerialization,
AdaGMLConfig.remat; the Pallas kernels are forward-only for cross
attention) — because the pooling statistic (mean attention received) scales
as 1/N: heads trained at 1024 tokens mis-rank at 4096 (measured: recall 0,
2.6 matches/query). Pruning is DISABLED during training (adaptive=False) so
random-init heads can't destroy the matching loss; eval/bench then run the
same weights WITH adaptive pruning. Saves weights/adagml_aachen.msgpack.

Reference: nets/adagml.py:344-374, configs/config_train_aachen_sfd2.yaml:72-74.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "weights", "adagml_aachen.msgpack")

WIDTH, HEIGHT = 1024, 768
N_CLUSTER = 512


def build_scene():
    from pram_tpu.maps.synthetic import make_synthetic_scene

    return make_synthetic_scene(
        np.random.RandomState(0), n_cluster=N_CLUSTER, points_per_cluster=40,
        n_ref_frames=24, desc_dim=128, width=WIDTH, height=HEIGHT,
        max_kp_per_frame=2048, max_ref_points=4096,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--pool", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--conf_weight", type=float, default=0.25)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from pram_tpu.engine.localizer import normalize_kpts_like_reference
    from pram_tpu.models.adagml import AdaGML, AdaGMLConfig
    from pram_tpu.models.common import fused_attention_disabled
    from pram_tpu.train.losses import matching_nll_loss

    scene = build_scene()
    pmap = scene.map
    n_frames, mrows = pmap.frame_point_idx.shape
    ntok = args.tokens
    print(
        f"scene: {pmap.point_xyz.shape[0]} points, {n_frames} frames x "
        f"{mrows} rows", flush=True,
    )

    # per-frame inverse lookup point_id -> column
    n_points = pmap.point_xyz.shape[0]
    inv = np.full((n_frames, n_points), -1, np.int32)
    for fi in range(n_frames):
        cols = pmap.frame_point_idx[fi]
        ok = pmap.frame_kp_mask[fi].astype(bool) & (cols >= 0)
        inv[fi, cols[ok]] = np.nonzero(ok)[0]

    rng = np.random.RandomState(1)

    def make_sample():
        q = scene.render_query(
            rng, noise_px=0.5, desc_noise=0.05, max_kpts=ntok
        )
        pidx = q["point_idx"]
        valid = q["mask"]
        # pick among the 3 frames sharing the most points with the query
        vis = pidx[valid & (pidx >= 0)]
        counts = (inv[:, vis] >= 0).sum(-1)
        fi = int(np.argsort(counts)[::-1][rng.randint(3)])
        # the FULL frame table (the eval shape): gt = column or dustbin M
        gt_cols = np.where(
            valid & (pidx >= 0), inv[fi, np.clip(pidx, 0, None)], -1
        )
        gt = np.where(valid, np.where(gt_cols >= 0, gt_cols, mrows), -1)
        d1 = pmap.point_desc[np.clip(pmap.frame_point_idx[fi], 0, None)]
        k1 = pmap.frame_kp_uv[fi]
        m1 = pmap.frame_kp_mask[fi].astype(bool)
        return (
            q["descriptors"], q["keypoints"], q["mask"],
            d1.astype(np.float32), k1.astype(np.float32), m1,
            gt.astype(np.int32),
        )

    def make_batch():
        cols = [make_sample() for _ in range(args.batch)]
        return tuple(np.stack([c[i] for c in cols]) for i in range(7))

    first = make_batch()
    n_gt = ((first[-1] >= 0) & (first[-1] < mrows)).sum(1)
    print(f"gt matches/query: {n_gt.mean():.0f} of {first[2].sum(1).mean():.0f}",
          flush=True)

    # pruning off during training; pooling heads still run + get supervised;
    # remat keeps the 4096-token backward inside HBM
    ada = AdaGML(AdaGMLConfig(adaptive=False, remat=True))
    w_arr, h_arr = jnp.asarray(float(WIDTH)), jnp.asarray(float(HEIGHT))

    def norm(k):
        return normalize_kpts_like_reference(jnp.asarray(k), w_arr, h_arr)

    with fused_attention_disabled():
        avars = ada.init(
            jax.random.PRNGKey(0),
            jnp.asarray(first[0]), jnp.asarray(first[3]),
            norm(first[1]), norm(first[4]),
            jnp.asarray(first[2]), jnp.asarray(first[5]),
        )

    def conf_bce(conf, target, mask):
        # conf [L, B, N]; matchable tokens should be confident at all layers
        c = jnp.clip(conf, 1e-6, 1 - 1e-6)
        t = target[None].astype(jnp.float32)
        bce = -(t * jnp.log(c) + (1 - t) * jnp.log(1 - c))
        m = mask[None].astype(jnp.float32)
        return jnp.sum(bce * m) / jnp.maximum(jnp.sum(m) * conf.shape[0], 1)

    def loss_fn(params, d0, d1, nk0, nk1, m0, m1, gt):
        out = ada.apply({"params": params}, d0, d1, nk0, nk1, m0, m1)
        l_match = matching_nll_loss(out["plan"], gt, m1)
        match0 = (gt >= 0) & (gt < mrows)
        matched_cols = jax.vmap(
            lambda g, v: jnp.zeros((mrows,), bool)
            .at[jnp.clip(g, 0, mrows - 1)]
            .max(v)
        )(gt, match0)
        l_conf = conf_bce(out["confidences0"], match0, m0) + conf_bce(
            out["confidences1"], matched_cols, m1
        )
        return l_match + args.conf_weight * l_conf, (l_match, l_conf)

    tx = optax.adam(args.lr)

    def step(params, opt_state, batch):
        d0, k0, m0, d1, k1, m1, gt = batch
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, d0, d1, norm(k0), norm(k1), m0, m1, gt
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    pool = [
        tuple(jnp.asarray(a) for a in (first if i == 0 else make_batch()))
        for i in range(min(args.steps, args.pool))
    ]
    params = avars["params"]
    with fused_attention_disabled():
        jstep = jax.jit(step)
        opt_state = tx.init(params)
        t0 = time.time()
        for it in range(args.steps):
            params, opt_state, loss, (lm, lc) = jstep(
                params, opt_state, pool[it % len(pool)]
            )
            if it % 50 == 0 or it == args.steps - 1:
                print(
                    f"adagml step {it}: loss {float(loss):.4f} "
                    f"(match {float(lm):.4f} conf {float(lc):.4f}) "
                    f"({time.time()-t0:.0f}s)", flush=True,
                )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"saved {OUT}")


if __name__ == "__main__":
    main()
