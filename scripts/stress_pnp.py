"""RANSAC PnP stress grid -> markdown table (VERDICT r4 #6 artifact).

Runs the same scene generator as tests/test_pnp_stress.py over the full
grid (outlier sweep x geometry x noise/threshold x schedule) and prints a
markdown table of recall@(5cm,5deg) plus median errors. Deterministic in
the seed; runs on the CPU mesh (solver tolerance is backend-independent —
the chip A/B for the PnP kernels lives in tests/test_pnp_pallas.py and
the bench image guard).

Usage: python scripts/stress_pnp.py [--trials 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from test_pnp_stress import (  # noqa: E402
    make_trials,
    pose_errors,
    recall_5cm5deg,
    run_batch,
)


def row(name, res, R_gt, t_gt):
    ang, cen = pose_errors(res, R_gt, t_gt)
    succ = np.asarray(res.success)
    r = recall_5cm5deg(res, R_gt, t_gt)
    med_ang = float(np.median(ang[succ])) if succ.any() else float("nan")
    med_cen = float(np.median(cen[succ])) if succ.any() else float("nan")
    print(
        f"| {name} | {r:.3f} | {med_ang:.4f} | {med_cen * 100:.2f} "
        f"| {int(succ.sum())}/{len(succ)} |"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=32)
    args = ap.parse_args()

    print(
        "| config | recall@(5cm,5deg) | med rot err (deg) "
        "| med center err (cm) | success |"
    )
    print("|---|---|---|---|---|")

    rng = np.random.RandomState(7)
    # outlier sweep (0.5px noise, threshold 4, default schedule)
    for frac in (0.0, 0.3, 0.5, 0.7, 0.8):
        cam, uv, xyz, R, t = make_trials(
            rng, n_trials=args.trials, noise=0.5, outlier_frac=frac
        )
        row(f"outliers {int(frac*100)}% (K=256)", run_batch(cam, uv, xyz), R, t)
        if frac >= 0.8:
            row(
                f"outliers {int(frac*100)}% (K=512)",
                run_batch(cam, uv, xyz, num_hyps=512), R, t,
            )
            row(
                f"outliers {int(frac*100)}% (K=1024)",
                run_batch(cam, uv, xyz, num_hyps=1024), R, t,
            )

    # geometry stress
    for geom, frac in (("planar", 0.0), ("planar", 0.5), ("low_parallax", 0.0)):
        cam, uv, xyz, R, t = make_trials(
            rng, n_trials=args.trials, geometry=geom, noise=0.5,
            outlier_frac=frac,
        )
        row(
            f"{geom} outliers {int(frac*100)}%",
            run_batch(cam, uv, xyz), R, t,
        )

    # noise x threshold grid (30% outliers)
    for noise in (0.5, 1.0, 2.0):
        for th in (4.0, 8.0, 12.0):
            cam, uv, xyz, R, t = make_trials(
                rng, n_trials=args.trials, noise=noise, outlier_frac=0.3
            )
            row(
                f"noise {noise}px, gate {int(th)}px",
                run_batch(cam, uv, xyz, threshold=th), R, t,
            )

    # schedule A/B: bench shallow (5,1) vs default (8,2)
    for noise, frac, th in ((1.0, 0.5, 4.0), (2.0, 0.75, 8.0)):
        cam, uv, xyz, R, t = make_trials(
            rng, n_trials=args.trials, noise=noise, outlier_frac=frac
        )
        row(
            f"shallow(5,1) noise {noise} out {int(frac*100)}%",
            run_batch(cam, uv, xyz, threshold=th, gn_iters=5, lo_rounds=1),
            R, t,
        )
        row(
            f"default(8,2) noise {noise} out {int(frac*100)}%",
            run_batch(cam, uv, xyz, threshold=th), R, t,
        )


if __name__ == "__main__":
    main()
