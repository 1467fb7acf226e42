"""AdaGML — GML with adaptive token pooling / early stopping (IMP, CVPR'23).

TPU-native rebuild of the reference's AdaGML (nets/adagml.py:232-536). The
reference *gathers* confident tokens into shrinking dynamic-shape tensors and
breaks out of the layer loop; that is untraceable under XLA. Here the same
algorithm is expressed with static shapes:

- per-layer attention statistics (mean attention received by each token from
  self- and cross-attention, nets/adagml.py:148,229) feed a PoolingLayer
  that predicts per-token confidence;
- low-confidence tokens are *masked out* rather than gathered out (identical
  downstream effect: they stop contributing attention mass and are excluded
  from matching, with the n_min_tokens floor honoured);
- the stop condition (>=95% of original tokens confident after layer>=1,
  nets/adagml.py:522-531) freezes descriptors instead of breaking, and the
  matched output projection of the stopping layer is selected with a one-hot
  contraction.

Result: the plan restricted to surviving tokens matches the reference's
pruned computation up to attention renormalization over the pruned set (the
reference recomputes softmax over survivors; so does masking).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pram_tpu.models import common as _common
from pram_tpu.models.common import (
    LearnableFourierPE,
    _DenseParams,
    _LNParams,
    apply_rotary,
    mask_to_bias,
    masked_softmax,
)
from pram_tpu.ops.matching import MatchResult, mutual_matches
from pram_tpu.ops.sinkhorn import dual_softmax_matching, sinkhorn_matching


@dataclass
class AdaGMLConfig:
    """Defaults = reference nets/adagml.py:233-249."""

    descriptor_dim: int = 128
    hidden_dim: int = 256
    num_heads: int = 4
    n_layers: int = 9
    sinkhorn_iterations: int = 20
    match_threshold: float = 0.2
    n_min_tokens: int = 256
    min_confidence: float = 0.9
    with_sinkhorn: bool = True
    stop_ratio: float = 0.95
    adaptive: bool = True  # disable to run as plain GML with pooling heads
    # rematerialize each layer under autodiff: training at the Aachen eval
    # shape (4096/2048 tokens) would otherwise save ~2.4 GB of attention
    # probabilities PER LAYER for the backward
    remat: bool = False


def confidence_threshold(layer_index: int, n_layers: int) -> float:
    """Layer-scaled confidence threshold (nets/adagml.py:516-520)."""
    return float(np.clip(0.5 + 0.1 * np.exp(-4.0 * layer_index / n_layers), 0, 1))


class PoolingLayer(nn.Module):
    """Token-confidence predictor from features + attention stats.

    Reference: nets/adagml.py:114-138.
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, score: jax.Array) -> jax.Array:
        s = nn.Dense(self.hidden_dim, name="score_enc_0")(score)
        s = nn.LayerNorm(name="score_enc_ln")(s)
        s = nn.gelu(s, approximate=False)
        s = nn.Dense(self.hidden_dim, name="score_enc_3")(s)
        xp = nn.Dense(self.hidden_dim, name="proj")(x)
        y = jnp.concatenate([xp, s], axis=-1)
        y = nn.Dense(self.hidden_dim, name="predict_0")(y)
        y = nn.LayerNorm(name="predict_ln")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(1, name="predict_3")(y)
        return jax.nn.sigmoid(y)[..., 0]


class _SelfAttnStats(nn.Module):
    """Self-attention block that also returns mean attention received per key.

    Reference: nets/adagml.py:141-183 (same block as GML's, plus the
    mean-over-heads, mean-over-queries attention statistic).
    """

    feat_dim: int
    hidden_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, encoding, mask):
        b, n, _ = x.shape
        h = self.num_heads
        hd = self.hidden_dim // h

        from pram_tpu.ops.mlp_pallas import fused_mlp_supported

        if (
            _common.use_fused_attention(n)
            and _common._attn_vmem_ok(
                n, n, self.hidden_dim, x.dtype.itemsize
            )
            and fused_mlp_supported(
                n, self.feat_dim, self.feat_dim * 2, x.dtype.itemsize
            )
        ):
            # fused Pallas path: packed-qkv attention kernel emits the
            # per-key received-attention sums alongside the messages
            # (ops/attention_pallas.py; VERDICT r2 #2b)
            from pram_tpu.ops.attention_pallas import (
                fused_self_attention_qkv,
                permute_qkv_kernel,
            )
            from pram_tpu.ops.mlp_pallas import fused_residual_mlp

            kernel, kbias = _DenseParams(
                self.hidden_dim * 3, name="qkv"
            )(x.shape[-1])
            wp, bp = permute_qkv_kernel(kernel, kbias, h, hd)
            qkv = (x @ wp.astype(x.dtype)) + bp.astype(x.dtype)
            if encoding is not None:
                cos, sin = encoding[0][:, 0], encoding[1][:, 0]
            else:
                cos = sin = None
            msg, stat_sum = fused_self_attention_qkv(
                qkv, cos, sin, mask_to_bias(mask, b, n), hd**-0.5, h,
                return_stats=True,
            )
            if mask is None:
                n_valid = jnp.full((b, 1), float(n), jnp.float32)
            else:
                n_valid = jnp.maximum(
                    jnp.sum(mask.astype(jnp.float32), -1, keepdims=True),
                    1.0,
                )
            stat = stat_sum / (h * n_valid)
            msg = msg.astype(x.dtype)

            wp_, bp_ = _DenseParams(self.hidden_dim, name="proj")(
                self.hidden_dim
            )
            w0_, b0_ = _DenseParams(self.feat_dim * 2, name="mlp_0")(
                x.shape[-1] + self.hidden_dim
            )
            g_, be_ = _LNParams(self.feat_dim * 2, name="mlp_ln")()
            w3_, b3_ = _DenseParams(self.feat_dim, name="mlp_3")(
                self.feat_dim * 2
            )
            out = fused_residual_mlp(
                x, msg, wp_, bp_, w0_, b0_, g_, be_, w3_, b3_
            )
            return out, stat

        qkv = nn.Dense(self.hidden_dim * 3, name="qkv")(x)
        qkv = jnp.moveaxis(qkv.reshape(b, n, h, hd, 3), 2, 1)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        if encoding is not None:
            q = apply_rotary(encoding, q)
            k = apply_rotary(encoding, k)
        logits = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        attn = masked_softmax(
            logits, None if mask is None else mask[:, None, None, :]
        ).astype(v.dtype)
        # mean over heads then over (valid) query rows -> per-key stat
        stat = jnp.mean(attn, axis=1)  # [B, Nq, Nk]
        if mask is None:
            stat = jnp.mean(stat, axis=1)
        else:
            qm = mask.astype(stat.dtype)[:, :, None]
            stat = jnp.sum(stat * qm, axis=1) / jnp.maximum(
                jnp.sum(qm, axis=1), 1.0
            )
        msg = jnp.einsum(
            "bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        msg = jnp.moveaxis(msg, 1, 2).reshape(b, n, self.hidden_dim)
        msg = nn.Dense(self.hidden_dim, name="proj")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(self.feat_dim * 2, name="mlp_0")(y)
        y = nn.LayerNorm(name="mlp_ln")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.feat_dim, name="mlp_3")(y)
        return x + y, stat


class _CrossAttnStats(nn.Module):
    """Cross-attention block returning per-token received-attention stats.

    Reference: nets/adagml.py:186-229.
    """

    feat_dim: int
    hidden_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x0, x1, mask0, mask1):
        b, n0, _ = x0.shape
        n1 = x1.shape[1]
        h = self.num_heads
        hd = self.hidden_dim // h
        scale = hd**-0.5

        to_qk = nn.Dense(self.hidden_dim, name="to_qk")
        to_v = nn.Dense(self.hidden_dim, name="to_v")

        from pram_tpu.ops.mlp_pallas import fused_mlp_supported

        if (
            _common.use_fused_cross_attention(n0, n1)
            and _common._attn_vmem_ok(
                n0, n1, self.hidden_dim, x0.dtype.itemsize
            )
            and fused_mlp_supported(
                n0 + n1, self.feat_dim, self.feat_dim * 2, x0.dtype.itemsize
            )
        ):
            from pram_tpu.ops.attention_pallas import (
                fused_cross_attention_packed,
            )
            from pram_tpu.ops.mlp_pallas import fused_residual_mlp

            cat = jnp.concatenate([x0, x1], axis=1)
            qk = to_qk(cat)
            v = to_v(cat)
            m0, m1, s0_sum, s1_sum = fused_cross_attention_packed(
                qk[:, :n0], qk[:, n0:], v[:, :n0], v[:, n0:],
                mask_to_bias(mask0, b, n0), mask_to_bias(mask1, b, n1),
                scale, h, return_stats=True,
            )

            def valid_count(mask, n):
                if mask is None:
                    return jnp.full((b, 1), float(n), jnp.float32)
                return jnp.maximum(
                    jnp.sum(mask.astype(jnp.float32), -1, keepdims=True),
                    1.0,
                )

            # stat0: mass received by x0 tokens from x1's valid queries
            stat0 = s0_sum / (h * valid_count(mask1, n1))
            stat1 = s1_sum / (h * valid_count(mask0, n0))

            m_cat = jnp.concatenate([m0, m1], axis=1).astype(x0.dtype)
            wp_, bp_ = _DenseParams(self.hidden_dim, name="proj")(
                self.hidden_dim
            )
            w0_, b0_ = _DenseParams(self.feat_dim * 2, name="mlp_0")(
                cat.shape[-1] + self.hidden_dim
            )
            g_, be_ = _LNParams(self.feat_dim * 2, name="mlp_ln")()
            w3_, b3_ = _DenseParams(self.feat_dim, name="mlp_3")(
                self.feat_dim * 2
            )
            out = fused_residual_mlp(
                cat, m_cat, wp_, bp_, w0_, b0_, g_, be_, w3_, b3_
            )
            return out[:, :n0], out[:, n0:], stat0, stat1

        proj = nn.Dense(self.hidden_dim, name="proj")
        mlp_0 = nn.Dense(self.feat_dim * 2, name="mlp_0")
        mlp_ln = nn.LayerNorm(name="mlp_ln")
        mlp_3 = nn.Dense(self.feat_dim, name="mlp_3")

        def split(t, n):
            return jnp.moveaxis(t.reshape(b, n, h, hd), 2, 1)

        qk0 = split(to_qk(x0), n0) * scale**0.5
        qk1 = split(to_qk(x1), n1) * scale**0.5
        v0 = split(to_v(x0), n0)
        v1 = split(to_v(x1), n1)
        sim = jnp.einsum(
            "bhid,bhjd->bhij", qk0, qk1, preferred_element_type=jnp.float32
        )
        attn01 = masked_softmax(
            sim, None if mask1 is None else mask1[:, None, None, :], axis=-1
        ).astype(v1.dtype)
        attn10 = masked_softmax(
            sim, None if mask0 is None else mask0[:, None, :, None], axis=-2
        ).astype(v0.dtype)

        def received(attn, qmask, qaxis):
            # attn [B,H,i,j]: average over heads and over valid queries
            s = jnp.mean(attn, axis=1)
            if qmask is None:
                return jnp.mean(s, axis=qaxis)
            if qaxis == 1:
                qm = qmask.astype(s.dtype)[:, :, None]
            else:
                qm = qmask.astype(s.dtype)[:, None, :]
            return jnp.sum(s * qm, axis=qaxis) / jnp.maximum(
                jnp.sum(qm, axis=qaxis), 1.0
            )

        # stat for x0 tokens: attention they receive in attn10 (queries = x1)
        stat0 = received(attn10, mask1, 2)  # mean over j (x1 queries) -> [B, N0]
        stat1 = received(attn01, mask0, 1)  # mean over i (x0 queries) -> [B, N1]

        m0 = jnp.einsum(
            "bhij,bhjd->bhid", attn01, v1, preferred_element_type=jnp.float32
        ).astype(x0.dtype)
        m1 = jnp.einsum(
            "bhij,bhid->bhjd", attn10, v0, preferred_element_type=jnp.float32
        ).astype(x1.dtype)

        def merge(t, n):
            return jnp.moveaxis(t, 1, 2).reshape(b, n, self.hidden_dim)

        m0 = proj(merge(m0, n0))
        m1 = proj(merge(m1, n1))

        def mlp(x, m):
            y = jnp.concatenate([x, m], axis=-1)
            y = mlp_0(y)
            y = mlp_ln(y)
            y = nn.gelu(y, approximate=False)
            return mlp_3(y)

        return x0 + mlp(x0, m0), x1 + mlp(x1, m1), stat0, stat1


class AdaGML(nn.Module):
    """Adaptive matcher with static-shape token pruning."""

    config: AdaGMLConfig = field(default_factory=AdaGMLConfig)

    @nn.compact
    def __call__(
        self,
        desc0: jax.Array,
        desc1: jax.Array,
        norm_kpts0: jax.Array,
        norm_kpts1: jax.Array,
        mask0: Optional[jax.Array] = None,
        mask1: Optional[jax.Array] = None,
    ) -> dict:
        cfg = self.config
        b, n0, _ = desc0.shape
        n1 = desc1.shape[1]
        head_dim = cfg.hidden_dim // cfg.num_heads
        if mask0 is None:
            mask0 = jnp.ones((b, n0), bool)
        if mask1 is None:
            mask1 = jnp.ones((b, n1), bool)
        orig_total = jnp.sum(mask0.astype(jnp.float32), -1) + jnp.sum(
            mask1.astype(jnp.float32), -1
        )

        input_proj = nn.Dense(cfg.hidden_dim, name="input_proj")
        x0 = input_proj(desc0)
        x1 = input_proj(desc1)
        posenc = LearnableFourierPE(f_dim=head_dim, name="poseenc")
        enc0 = posenc(norm_kpts0)
        enc1 = posenc(norm_kpts1)

        stopped = jnp.zeros((b,), bool)
        stop_layer = jnp.full((b,), cfg.n_layers - 1, jnp.int32)
        confs0, confs1 = [], []

        SA = nn.remat(_SelfAttnStats) if cfg.remat else _SelfAttnStats
        CA = nn.remat(_CrossAttnStats) if cfg.remat else _CrossAttnStats
        for ni in range(cfg.n_layers):
            sa = SA(
                feat_dim=cfg.hidden_dim,
                hidden_dim=cfg.hidden_dim,
                num_heads=cfg.num_heads,
                name=f"self_attn_{ni}",
            )
            nx0, s00 = sa(x0, enc0, mask0)
            nx1, s11 = sa(x1, enc1, mask1)
            nx0, nx1, s01, s10 = CA(
                feat_dim=cfg.hidden_dim,
                hidden_dim=cfg.hidden_dim,
                num_heads=cfg.num_heads,
                name=f"cross_attn_{ni}",
            )(nx0, nx1, mask0, mask1)

            pool = PoolingLayer(cfg.hidden_dim, name=f"pooling_{ni}")
            conf0 = pool(nx0, jnp.stack([s00, s01], axis=-1))
            conf1 = pool(nx1, jnp.stack([s11, s10], axis=-1))
            confs0.append(conf0)
            confs1.append(conf1)

            # freeze descriptors for batches that already stopped
            keep = stopped[:, None, None]
            x0 = jnp.where(keep, x0, nx0)
            x1 = jnp.where(keep, x1, nx1)

            if cfg.adaptive and ni >= 1:
                th = confidence_threshold(ni, cfg.n_layers)
                cnt0 = jnp.sum(mask0.astype(jnp.int32), -1)
                cnt1 = jnp.sum(mask1.astype(jnp.int32), -1)
                prune0 = (cnt0 >= cfg.n_min_tokens) & ~stopped
                prune1 = (cnt1 >= cfg.n_min_tokens) & ~stopped
                # the stop check evaluates over the token set at layer ENTRY
                # (nets/adagml.py:527-531: conf is pre-pruning): tokens pruned
                # in earlier layers are absent from `confidences` there and so
                # count as implicitly confident — pos = 1 - below/(m+n).
                below = jnp.sum(
                    ((conf0 < th) & mask0).astype(jnp.float32), -1
                ) + jnp.sum(((conf1 < th) & mask1).astype(jnp.float32), -1)
                mask0 = jnp.where(
                    prune0[:, None], mask0 & (conf0 > th), mask0
                )
                mask1 = jnp.where(
                    prune1[:, None], mask1 & (conf1 > th), mask1
                )
                pos = 1.0 - below / jnp.maximum(orig_total, 1.0)
                now_stop = pos > cfg.stop_ratio
                stop_layer = jnp.where(~stopped & now_stop, ni, stop_layer)
                stopped = stopped | now_stop

        # select out_proj[stop_layer] via one-hot over all layer projections
        d = x0.shape[-1]
        out_projs = [
            nn.Dense(cfg.hidden_dim, name=f"out_proj_{i}")
            for i in range(cfg.n_layers)
        ]
        md0_all = jnp.stack([proj(x0) for proj in out_projs], axis=0)
        md1_all = jnp.stack([proj(x1) for proj in out_projs], axis=0)
        onehot = jax.nn.one_hot(stop_layer, cfg.n_layers, dtype=x0.dtype)
        md0 = jnp.einsum("lbnd,bl->bnd", md0_all, onehot) / d**0.25
        md1 = jnp.einsum("lbnd,bl->bnd", md1_all, onehot) / d**0.25

        sim = jnp.einsum(
            "bnd,bmd->bnm", md0, md1, preferred_element_type=jnp.float32
        )
        dustbin = self.param("bin_score", nn.initializers.ones, ())
        if cfg.with_sinkhorn:
            plan = sinkhorn_matching(
                sim, dustbin, cfg.sinkhorn_iterations, mask0, mask1
            )
        else:
            plan = dual_softmax_matching(sim, dustbin, mask0, mask1)
        return {
            "plan": plan,
            "mask0": mask0,
            "mask1": mask1,
            "stop_layer": stop_layer,
            # per-layer pooling confidences [L, B, N]: the training target
            # for the matchability supervision (the hard pruning thresholds
            # pass no gradient, so the heads need their own loss)
            "confidences0": jnp.stack(confs0, axis=0),
            "confidences1": jnp.stack(confs1, axis=0),
        }


def extract_matches(plan: jax.Array, threshold: float = 0.2) -> MatchResult:
    """Mutual-max readout; pruned tokens carry no plan mass, so they can't match."""
    return mutual_matches(plan, threshold)


# ---------------------------------------------------------------------------
# Online early-exit formulation
# ---------------------------------------------------------------------------


def stack_adagml_layers(variables, n_layers: int = 9):
    """Re-layout per-layer AdaGML params into leading-[n_layers] stacks.

    Enables the lax.while_loop early-exit apply (adagml_online_apply): the
    loop indexes one layer's params with a dynamic slice instead of unrolling
    all layers.
    """
    p = variables["params"]

    def stack(prefix):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[p[f"{prefix}_{i}"] for i in range(n_layers)],
        )

    return {
        "input_proj": p["input_proj"],
        "poseenc": p["poseenc"],
        "bin_score": p["bin_score"],
        "self_attn": stack("self_attn"),
        "cross_attn": stack("cross_attn"),
        "pooling": stack("pooling"),
        "out_proj": stack("out_proj"),
    }


def adagml_batched_adaptive_apply(
    stacked,
    desc0: jax.Array,  # [B, N, D]
    desc1: jax.Array,  # [B, M, D]
    norm_kpts0: jax.Array,
    norm_kpts1: jax.Array,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
    cfg: AdaGMLConfig = AdaGMLConfig(),
) -> dict:
    """Batched AdaGML that actually SKIPS layers once every element stops.

    The unrolled module (AdaGML.__call__) evaluates all ``n_layers`` at the
    full static shape and freezes stopped elements with ``jnp.where`` — on
    the Aachen operating point (4096x2048 tokens) that wastes most of the
    matcher's FLOPs: with the trained Aachen weights every query stops at
    layer 2 and pruning leaves ~8%/17% of tokens alive
    (scripts/exp_adagml_prune.py), yet 9 full-shape layers run. The
    reference recovers this compute by literally shrinking tensors and
    breaking the loop (nets/adagml.py:344-374, 522-531) — untraceable
    under XLA. This formulation is the TPU-native middle ground: a
    ``lax.while_loop`` over stacked layer parameters whose condition is
    "some element still running", with per-element freezing identical to
    the unrolled module. Produces the SAME plan / masks / stop_layer as
    ``AdaGML.__call__`` for the same inputs (tests/test_adagml_exit.py):
    layers after the all-stop point only ever feed frozen ``jnp.where``
    lanes and the (output-irrelevant) confidence heads, so skipping them
    is exact.

    Inference-only: ``lax.while_loop`` is not reverse-differentiable;
    training uses the unrolled module (which needs the per-layer
    confidences as supervision targets anyway).
    """
    b, n0, _ = desc0.shape
    n1 = desc1.shape[1]
    head_dim = cfg.hidden_dim // cfg.num_heads
    if mask0 is None:
        mask0 = jnp.ones((b, n0), bool)
    if mask1 is None:
        mask1 = jnp.ones((b, n1), bool)
    orig_total = jnp.sum(mask0.astype(jnp.float32), -1) + jnp.sum(
        mask1.astype(jnp.float32), -1
    )

    dense = nn.Dense(cfg.hidden_dim)
    x0 = dense.apply({"params": stacked["input_proj"]}, desc0)
    x1 = dense.apply({"params": stacked["input_proj"]}, desc1)
    pe = LearnableFourierPE(f_dim=head_dim)
    enc0 = pe.apply({"params": stacked["poseenc"]}, norm_kpts0)
    enc1 = pe.apply({"params": stacked["poseenc"]}, norm_kpts1)

    sa = _SelfAttnStats(cfg.hidden_dim, cfg.hidden_dim, cfg.num_heads)
    ca = _CrossAttnStats(cfg.hidden_dim, cfg.hidden_dim, cfg.num_heads)
    pool = PoolingLayer(cfg.hidden_dim)
    thresholds = jnp.asarray(
        [confidence_threshold(i, cfg.n_layers) for i in range(cfg.n_layers)],
        jnp.float32,
    )

    def layer_step(carry):
        x0, x1, m0, m1, ni, stopped, stop_layer = carry
        sl = lambda t: jax.tree_util.tree_map(lambda a: a[ni], t)
        p_sa = sl(stacked["self_attn"])
        p_ca = sl(stacked["cross_attn"])
        p_po = sl(stacked["pooling"])
        nx0, s00 = sa.apply({"params": p_sa}, x0, enc0, m0)
        nx1, s11 = sa.apply({"params": p_sa}, x1, enc1, m1)
        nx0, nx1, s01, s10 = ca.apply({"params": p_ca}, nx0, nx1, m0, m1)
        conf0 = pool.apply({"params": p_po}, nx0, jnp.stack([s00, s01], -1))
        conf1 = pool.apply({"params": p_po}, nx1, jnp.stack([s11, s10], -1))

        # freeze stopped elements (models/adagml.py batched module semantics)
        keep = stopped[:, None, None]
        x0 = jnp.where(keep, x0, nx0)
        x1 = jnp.where(keep, x1, nx1)

        if cfg.adaptive:
            th = thresholds[ni]
            do_prune = ni >= 1
            cnt0 = jnp.sum(m0.astype(jnp.int32), -1)
            cnt1 = jnp.sum(m1.astype(jnp.int32), -1)
            prune0 = do_prune & (cnt0 >= cfg.n_min_tokens) & ~stopped
            prune1 = do_prune & (cnt1 >= cfg.n_min_tokens) & ~stopped
            below = jnp.sum(
                ((conf0 < th) & m0).astype(jnp.float32), -1
            ) + jnp.sum(((conf1 < th) & m1).astype(jnp.float32), -1)
            m0 = jnp.where(prune0[:, None], m0 & (conf0 > th), m0)
            m1 = jnp.where(prune1[:, None], m1 & (conf1 > th), m1)
            pos = 1.0 - below / jnp.maximum(orig_total, 1.0)
            now_stop = do_prune & (pos > cfg.stop_ratio)
            stop_layer = jnp.where(~stopped & now_stop, ni, stop_layer)
            stopped = stopped | now_stop
        return (x0, x1, m0, m1, ni + 1, stopped, stop_layer)

    def cond(carry):
        *_, ni, stopped, _sl = carry
        return (ni < cfg.n_layers) & ~jnp.all(stopped)

    x0f, x1f, m0f, m1f, _, _, stop_layer = jax.lax.while_loop(
        cond,
        layer_step,
        (
            x0, x1, mask0, mask1, jnp.asarray(0),
            jnp.zeros((b,), bool),
            jnp.full((b,), cfg.n_layers - 1, jnp.int32),
        ),
    )

    # per-element out_proj[stop_layer]: a parameter gather instead of the
    # module's one-hot contraction — same selected values (the one-hot's
    # other terms are exact zeros), one projection instead of n_layers
    d = x0f.shape[-1]
    opk = stacked["out_proj"]["kernel"][stop_layer]  # [B, H, H]
    opb = stacked["out_proj"]["bias"][stop_layer]  # [B, H]
    md0 = (
        jnp.einsum(
            "bnd,bdh->bnh", x0f, opk.astype(x0f.dtype)
        )
        + opb.astype(x0f.dtype)[:, None]
    ) / d**0.25
    md1 = (
        jnp.einsum(
            "bmd,bdh->bmh", x1f, opk.astype(x1f.dtype)
        )
        + opb.astype(x1f.dtype)[:, None]
    ) / d**0.25
    sim = jnp.einsum(
        "bnd,bmd->bnm", md0, md1, preferred_element_type=jnp.float32
    )
    if cfg.with_sinkhorn:
        plan = sinkhorn_matching(
            sim, stacked["bin_score"], cfg.sinkhorn_iterations, m0f, m1f
        )
    else:
        plan = dual_softmax_matching(sim, stacked["bin_score"], m0f, m1f)
    return {
        "plan": plan,
        "mask0": m0f,
        "mask1": m1f,
        "stop_layer": stop_layer,
    }


def adagml_online_apply(
    stacked,
    desc0: jax.Array,  # [1, N, D]
    desc1: jax.Array,  # [1, M, D]
    norm_kpts0: jax.Array,
    norm_kpts1: jax.Array,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
    cfg: AdaGMLConfig = AdaGMLConfig(),
) -> dict:
    """Latency-oriented AdaGML: truly SKIPS layers after the stop condition.

    The batched module (AdaGML.__call__) evaluates all layers and freezes
    descriptors at the stop point — right for throughput batches. For online
    single-frame streams (the reference's inference.py --online path) this
    variant runs a lax.while_loop over stacked layer parameters and exits as
    soon as >=stop_ratio of the tokens are confident (nets/adagml.py:522-531),
    saving the remaining layers' compute. Produces the same plan as the
    batched module for the same inputs (tested).
    """
    from flax.core import freeze

    b, n0, _ = desc0.shape
    n1 = desc1.shape[1]
    head_dim = cfg.hidden_dim // cfg.num_heads
    if mask0 is None:
        mask0 = jnp.ones((b, n0), bool)
    if mask1 is None:
        mask1 = jnp.ones((b, n1), bool)
    orig_total = (
        jnp.sum(mask0.astype(jnp.float32)) + jnp.sum(mask1.astype(jnp.float32))
    )

    dense = nn.Dense(cfg.hidden_dim)
    x0 = dense.apply({"params": stacked["input_proj"]}, desc0)
    x1 = dense.apply({"params": stacked["input_proj"]}, desc1)
    pe = LearnableFourierPE(f_dim=head_dim)
    enc0 = pe.apply({"params": stacked["poseenc"]}, norm_kpts0)
    enc1 = pe.apply({"params": stacked["poseenc"]}, norm_kpts1)

    sa = _SelfAttnStats(cfg.hidden_dim, cfg.hidden_dim, cfg.num_heads)
    ca = _CrossAttnStats(cfg.hidden_dim, cfg.hidden_dim, cfg.num_heads)
    pool = PoolingLayer(cfg.hidden_dim)

    thresholds = jnp.asarray(
        [confidence_threshold(i, cfg.n_layers) for i in range(cfg.n_layers)],
        jnp.float32,
    )

    def layer_step(carry):
        x0, x1, m0, m1, ni, stopped = carry
        sl = lambda t: jax.tree_util.tree_map(lambda a: a[ni], t)
        p_sa = sl(stacked["self_attn"])
        p_ca = sl(stacked["cross_attn"])
        p_po = sl(stacked["pooling"])
        nx0, s00 = sa.apply({"params": p_sa}, x0, enc0, m0)
        nx1, s11 = sa.apply({"params": p_sa}, x1, enc1, m1)
        nx0, nx1, s01, s10 = ca.apply({"params": p_ca}, nx0, nx1, m0, m1)
        conf0 = pool.apply({"params": p_po}, nx0, jnp.stack([s00, s01], -1))
        conf1 = pool.apply({"params": p_po}, nx1, jnp.stack([s11, s10], -1))

        th = thresholds[ni]
        do_prune = ni >= 1
        cnt0 = jnp.sum(m0.astype(jnp.int32))
        cnt1 = jnp.sum(m1.astype(jnp.int32))
        # stop check over the layer-ENTRY token set: earlier-pruned tokens
        # are absent from the reference's `confidences` (nets/adagml.py:527)
        # and count as implicitly confident — pos = 1 - below/(m+n).
        below = jnp.sum(((conf0 < th) & m0).astype(jnp.float32)) + jnp.sum(
            ((conf1 < th) & m1).astype(jnp.float32)
        )
        m0n = jnp.where(
            do_prune & (cnt0 >= cfg.n_min_tokens), m0 & (conf0 > th), m0
        )
        m1n = jnp.where(
            do_prune & (cnt1 >= cfg.n_min_tokens), m1 & (conf1 > th), m1
        )
        pos = 1.0 - below / jnp.maximum(orig_total, 1.0)
        now_stop = do_prune & (pos > cfg.stop_ratio)
        return (nx0, nx1, m0n, m1n, ni + 1, now_stop)

    def cond(carry):
        *_, ni, stopped = carry
        return (ni < cfg.n_layers) & ~stopped

    x0f, x1f, m0f, m1f, ni_f, _ = jax.lax.while_loop(
        cond, layer_step, (x0, x1, mask0, mask1, jnp.asarray(0), jnp.asarray(False))
    )
    stop_layer = jnp.clip(ni_f - 1, 0, cfg.n_layers - 1)

    d = x0f.shape[-1]
    op = nn.Dense(cfg.hidden_dim)
    p_op = jax.tree_util.tree_map(lambda a: a[stop_layer], stacked["out_proj"])
    md0 = op.apply({"params": p_op}, x0f) / d**0.25
    md1 = op.apply({"params": p_op}, x1f) / d**0.25
    sim = jnp.einsum(
        "bnd,bmd->bnm", md0, md1, preferred_element_type=jnp.float32
    )
    plan = sinkhorn_matching(
        sim, stacked["bin_score"], cfg.sinkhorn_iterations, m0f, m1f
    )
    return {"plan": plan, "mask0": m0f, "mask1": m1f, "stop_layer": stop_layer}
