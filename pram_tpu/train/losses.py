"""Segmentation losses and metrics for recognition training.

Rebuilds tools/metrics.py: the background-weighted segmentation
cross-entropy (compute_seg_loss_weight, tools/metrics.py:131-148), the
correct/incorrect accuracy pair (compute_corr_incorr, :105-129) and the
IoU/precision evaluation (:12-68). All masked for padded keypoint tokens.

Note the reference's loss applies ``log_softmax`` and then
``F.cross_entropy`` (which itself applies log-softmax) — a double-softmax
quirk we reproduce by default for gradient-level parity with the published
training runs; set ``double_softmax=False`` for the textbook loss.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def seg_loss_weighted(
    logits: jax.Array,  # [B, N, C]
    target: jax.Array,  # [B, N] int
    mask: Optional[jax.Array] = None,  # [B, N]
    background_id: int = 0,
    weight_background: float = 0.1,
    double_softmax: bool = True,
) -> jax.Array:
    """Background-down-weighted CE (tools/metrics.py:131-148).

    Reduction matches torch's weighted mean: sum(w_i * nll_i) / sum(w_i).
    """
    x = jax.nn.log_softmax(logits, axis=-1)
    if double_softmax:
        x = jax.nn.log_softmax(x, axis=-1)
    nll = -jnp.take_along_axis(x, target[..., None], axis=-1)[..., 0]
    w = jnp.where(target == background_id, weight_background, 1.0)
    if mask is not None:
        w = w * mask.astype(w.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def seg_accuracy(
    logits: jax.Array,
    target: jax.Array,
    mask: Optional[jax.Array] = None,
    ignored_ids: Tuple[int, ...] = (0,),
) -> Tuple[jax.Array, jax.Array]:
    """(correct, incorrect) ratios ignoring background
    (compute_corr_incorr, tools/metrics.py:105-129).

    Both ratios are relative to the total number of (valid) keypoints, like
    the reference (denominator = numel(target)).
    """
    pred = jnp.argmax(logits, axis=-1)
    ignore = jnp.zeros_like(target, dtype=bool)
    for i in ignored_ids:
        ignore |= target == i
    valid = ~ignore
    if mask is not None:
        valid &= mask
        total = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    else:
        total = float(target.size)
    corr = jnp.sum(((pred == target) & valid).astype(jnp.float32)) / total
    incorr = jnp.sum(((pred != target) & valid).astype(jnp.float32)) / total
    return corr, incorr


def seg_iou_precision(
    logits: jax.Array,  # [B, N, C]
    target: jax.Array,
    mask: Optional[jax.Array] = None,
    n_class: Optional[int] = None,
    ignore_background: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Mean IoU and precision over classes present in the ground truth
    (tools/metrics.py:12-68 semantics, vectorized).
    """
    c = n_class or logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    valid = (
        mask if mask is not None else jnp.ones_like(target, dtype=bool)
    )
    pred_oh = jax.nn.one_hot(pred, c, dtype=jnp.float32) * valid[..., None]
    gt_oh = jax.nn.one_hot(target, c, dtype=jnp.float32) * valid[..., None]
    inter = jnp.sum(pred_oh * gt_oh, axis=tuple(range(pred_oh.ndim - 1)))
    pred_n = jnp.sum(pred_oh, axis=tuple(range(pred_oh.ndim - 1)))
    gt_n = jnp.sum(gt_oh, axis=tuple(range(gt_oh.ndim - 1)))
    union = pred_n + gt_n - inter
    present = gt_n > 0
    if ignore_background:
        present = present & (jnp.arange(c) != 0)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-8), 0.0)
    prec = jnp.where(gt_n > 0, inter / jnp.maximum(gt_n, 1e-8), 0.0)
    denom = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
    mean_iou = jnp.sum(jnp.where(present, iou, 0.0)) / denom
    mean_prec = jnp.sum(jnp.where(present, prec, 0.0)) / denom
    return mean_iou, mean_prec


def cls_loss_ce(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Sum-reduced multi-class CE normalized by non-background count.

    Reference tools/metrics.py:152-163 (compute_cls_loss_ce); unused by the
    shipped training pipeline but part of its metric surface. ``pred`` is
    ``[B, C]`` or ``[B, C, S]`` (S parallel heads, summed), ``target`` the
    integer labels of matching shape minus the C axis.
    """
    def one(p2, t1):  # [B, C], [B]
        logp = jax.nn.log_softmax(p2, axis=-1)
        picked = jnp.take_along_axis(logp, t1[:, None].astype(jnp.int32), 1)
        return -jnp.sum(picked)

    if pred.ndim == 2:
        total = one(pred, target)
    else:
        total = 0.0
        for i in range(pred.shape[-1]):
            total = total + one(pred[..., i], target[..., i])
    n_valid = jnp.maximum(jnp.sum((target > 0).astype(jnp.float32)), 1.0)
    return total / n_valid


def cls_loss_kl(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Sum-reduced KL(softmax(target) || softmax(pred)).

    Reference tools/metrics.py:166-180 (compute_cls_loss_kl); ``target`` are
    logits of a soft distribution. Multi-head ``[..., S]`` inputs average
    over heads like the reference.
    """
    def one(p2, t2):
        logp = jax.nn.log_softmax(p2, axis=-1)
        q = jax.nn.softmax(t2, axis=-1)
        logq = jax.nn.log_softmax(t2, axis=-1)
        return jnp.sum(q * (logq - logp))

    if pred.ndim == 2:
        return one(pred, target)
    total = 0.0
    for i in range(pred.shape[-1]):
        total = total + one(pred[..., i], target[..., i])
    return total / pred.shape[-1]


def sc_loss_l1(pred, target, mask=None):
    """Scene-coordinate L1 (tools/metrics.py:183-196): per-sample mean over
    the point axis, then masked mean over the rest."""
    loss = jnp.mean(jnp.abs(pred - target), axis=1)
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask.astype(loss.dtype)), 1.0)
        return jnp.sum(jnp.where(mask, loss, 0.0)) / denom
    return jnp.mean(loss)


def sc_loss_geo(pred, P, K, p2ds, mean_xyz, scale_xyz, max_value=20.0,
                mask=None):
    """Scene-coordinate reprojection loss (tools/metrics.py:199-216).

    Faithfully reproduces the reference's quirk of projecting the
    *normalized* coordinates (it builds p3ds then homogenizes ``pred``, not
    ``p3ds``). pred ``[B, 3, N]``, P ``[B, 3or4, 4]``, K ``[B, 3, 3]``,
    p2ds ``[B, N, 2]``.
    """
    b, _, n = pred.shape
    ones = jnp.ones((b, 1, n), pred.dtype)
    p3ds_homo = jnp.concatenate([pred, ones], axis=1)  # [B, 4, N]
    cam = jnp.matmul(P, p3ds_homo)[:, :3, :]
    proj = jnp.matmul(K, cam)  # [B, 3, N]
    p2 = proj[:, :2, :] / proj[:, 2:, :]
    loss = jnp.sum((p2 - jnp.transpose(p2ds, (0, 2, 1))) ** 2, axis=1)
    loss = jnp.minimum(loss, max_value)
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask.astype(loss.dtype)), 1.0)
        return jnp.sum(jnp.where(mask, loss, 0.0)) / denom
    return jnp.mean(loss)


class SeqIoU:
    """Streaming mean-IoU accumulator (tools/metrics.py:199-216): per-frame
    IoUs are averaged over a whole evaluation sequence."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, logits, target, mask=None) -> float:
        iou, _ = seg_iou_precision(logits, target, mask)
        v = float(iou)
        self.total += v
        self.count += 1
        return v

    def mean(self) -> float:
        return self.total / max(self.count, 1)


def matching_nll_loss(
    plan: jax.Array,  # [B, N+1, M+1] assignment plan (Sinkhorn output)
    gt: jax.Array,  # [B, N] int: column in [0, M-1], M = dustbin, -1 = pad
    ref_mask: jax.Array,  # [B, M] bool valid reference tokens
    col_weight: float = 0.5,
) -> jax.Array:
    """Assignment NLL for matcher training (SuperGlue/IMP supervision).

    The reference's GML produces the plan (nets/gml.py:20-46) and is trained
    in the IMP repo with this objective: matched query rows pay
    ``-log plan[i, gt_i]`` (dustbin column M for unmatched queries), and
    reference tokens that no query matches pay the dustbin-ROW NLL, weighted
    by ``col_weight``. Padded query rows (gt = -1) are excluded.
    """
    plan = jnp.clip(plan, 1e-9, None)
    logp = jnp.log(plan)
    mcols = plan.shape[-1] - 1
    tgt = jnp.where(gt >= 0, gt, 0)
    row_nll = -jnp.take_along_axis(logp[:, :-1, :], tgt[..., None], axis=-1)[
        ..., 0
    ]
    valid = gt >= 0
    loss_rows = jnp.sum(jnp.where(valid, row_nll, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )
    matched_cols = jax.vmap(
        lambda g, v: jnp.zeros((mcols,), bool)
        .at[jnp.clip(g, 0, mcols - 1)]
        .max(v & (g >= 0) & (g < mcols))
    )(gt, valid)
    ref_unmatched = ref_mask & ~matched_cols
    col_nll = -logp[:, -1, :-1]
    loss_cols = jnp.sum(jnp.where(ref_unmatched, col_nll, 0.0)) / jnp.maximum(
        jnp.sum(ref_unmatched), 1
    )
    return loss_rows + col_weight * loss_cols
