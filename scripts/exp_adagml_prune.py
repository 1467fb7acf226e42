"""Measure AdaGML's pruning/early-stop behavior at the Aachen shape.

The masking formulation (models/adagml.py) keeps static shapes: pruned
tokens are masked, not gathered out, so every layer still issues full
4096x2048-token attention FLOPs. The reference's AdaGML SAVES that
compute by shrinking tensors (nets/adagml.py:344-374) — this experiment
quantifies how much work a static-shape compaction (top-C capacity
gather after the prune layers) or a batched early-exit would recover on
the bench_aachen workload: per-layer survivor fractions and the
stop-layer distribution with the trained Aachen weights
(weights/adagml_aachen.msgpack) on the same synthetic-scene queries the
bench's recall guard uses.

Runs on CPU by default (stats, not timing): JAX_PLATFORMS=cpu python
scripts/exp_adagml_prune.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from pram_tpu.maps.synthetic import make_synthetic_scene
    from pram_tpu.models.adagml import (
        AdaGML,
        AdaGMLConfig,
        confidence_threshold,
    )

    rng = np.random.RandomState(0)
    n_kpts = 4096
    n_cluster = 512
    height, width = 768, 1024

    cfg = AdaGMLConfig()
    ada = AdaGML(cfg)
    atmpl = ada.init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 8, 128), jnp.float32),
        jnp.zeros((1, 8, 128), jnp.float32),
        jnp.zeros((1, 8, 2), jnp.float32),
        jnp.zeros((1, 8, 2), jnp.float32),
    )["params"]
    ada_weights = os.path.join(_REPO, "weights", "adagml_aachen.msgpack")
    if os.path.exists(ada_weights):
        from flax import serialization

        with open(ada_weights, "rb") as f:
            atmpl = serialization.from_bytes(atmpl, f.read())
        print("trained Aachen weights loaded")
    else:
        print("WARNING: random weights (no weights/adagml_aachen.msgpack)")
    avars = {"params": atmpl}

    # same scene family as bench_aachen's recall guard
    scene = make_synthetic_scene(
        rng, n_cluster=n_cluster, points_per_cluster=40, n_ref_frames=24,
        desc_dim=128, width=width, height=height,
        max_kp_per_frame=2048, max_ref_points=4096,
    )
    pm = scene.map

    qrng = np.random.RandomState(11)
    n_pairs = int(os.environ.get("PRUNE_PAIRS", "8"))
    queries = [
        scene.render_query(qrng, noise_px=0.5, desc_noise=0.05,
                           max_kpts=n_kpts)
        for _ in range(n_pairs)
    ]

    apply_fn = jax.jit(
        lambda d0, d1, k0, k1, m0, m1: ada.apply(
            avars, d0, d1, k0, k1, m0, m1
        )
    )

    L = cfg.n_layers
    surv0 = np.zeros((L,))
    surv1 = np.zeros((L,))
    stop_layers = []
    for qi, q in enumerate(queries):
        # candidate VRF frame of the query's dominant gt segment — the same
        # table the localizer's matcher dispatch gathers (localizer.py:344)
        gt = q["gt_seg"][q["gt_seg"] >= 0]
        sid = int(np.bincount(gt).argmax())
        v = int(pm.seg_vrf_slot[sid])
        f = int(pm.vrf_frame_idx[v])
        fmask = pm.frame_kp_mask[f]
        d1 = pm.point_desc[np.clip(pm.frame_point_idx[f], 0, None)]
        d1 = np.where(fmask[:, None], d1, 0.0)
        uv1 = pm.frame_kp_uv[f]
        w1, h1 = pm.frame_size[f]

        def norm(k, w, h):
            # the engine's reference-convention normalization
            # (localizer.normalize_kpts_like_reference: swapped-axis
            # center, scale 0.7*max)
            size = np.asarray([h, w], np.float32)
            return (k - size / 2.0) / (size.max() * 0.7)

        d0 = jnp.asarray(q["descriptors"])[None]
        k0 = jnp.asarray(norm(q["keypoints"], width, height))[None]
        m0 = jnp.asarray(q["mask"])[None]
        out = apply_fn(
            d0, jnp.asarray(d1)[None],
            k0, jnp.asarray(norm(uv1, w1, h1))[None],
            m0, jnp.asarray(fmask)[None],
        )
        confs0 = np.asarray(out["confidences0"][:, 0])  # [L, N]
        confs1 = np.asarray(out["confidences1"][:, 0])
        stop_layers.append(int(out["stop_layer"][0]))

        # replay the mask evolution (models/adagml.py:408-430)
        m0_np = np.asarray(m0[0]).copy()
        m1_np = np.asarray(fmask).copy()
        orig = m0_np.sum() + m1_np.sum()
        stopped = False
        for ni in range(L):
            surv0[ni] += m0_np.sum() / max(np.asarray(m0[0]).sum(), 1)
            surv1[ni] += m1_np.sum() / max(fmask.sum(), 1)
            if ni >= 1:
                th = confidence_threshold(ni, L)
                below = ((confs0[ni] < th) & m0_np).sum() + (
                    (confs1[ni] < th) & m1_np
                ).sum()
                if not stopped and m0_np.sum() >= cfg.n_min_tokens:
                    m0_np &= confs0[ni] > th
                if not stopped and m1_np.sum() >= cfg.n_min_tokens:
                    m1_np &= confs1[ni] > th
                pos = 1.0 - below / max(orig, 1)
                if not stopped and pos > cfg.stop_ratio:
                    stopped = True
        print(
            f"pair {qi}: stop_layer={stop_layers[-1]} "
            f"final_surv0={m0_np.sum() / max(np.asarray(m0[0]).sum(), 1):.3f} "
            f"final_surv1={m1_np.sum() / max(fmask.sum(), 1):.3f}"
        )

    surv0 /= n_pairs
    surv1 /= n_pairs
    print("\nlayer-entry survivor fraction (mean over pairs):")
    print("layer  query(4096)  ref(2048)")
    for ni in range(L):
        print(f"  {ni}      {surv0[ni]:.3f}       {surv1[ni]:.3f}")
    print(f"stop_layer distribution: {sorted(stop_layers)}")
    # issued-work ratio if layers ran at compacted (survivor) token counts:
    # attention cost ~ (n0+n1)^2 per layer (self n0^2+n1^2 + cross 2*n0*n1)
    full = 0.0
    compact = 0.0
    for ni in range(L):
        full += 1.0
        compact += (
            (surv0[ni] * 4096) ** 2
            + (surv1[ni] * 2048) ** 2
            + 2 * (surv0[ni] * 4096) * (surv1[ni] * 2048)
        ) / (4096**2 + 2048**2 + 2 * 4096 * 2048)
    print(
        f"\nattention work at survivor counts vs full: {compact / full:.3f}"
        " (lower = more to win from compaction)"
    )


if __name__ == "__main__":
    main()
