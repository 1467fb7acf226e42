"""GML matcher — LightGlue-architecture attentional matcher trained with IMP.

TPU-native rebuild of the reference's default matcher (nets/gml.py:189-319):
shared input projection, rotary Fourier positional encoding, n_layers of
(self-attention on each side, symmetric cross-attention), a per-layer output
projection (only the last is used at inference), Sinkhorn with dustbin, and
mutual-max match extraction.

Fixed shapes: both sides are padded to static token counts with validity
masks; masked attention + masked Sinkhorn make the result equal to the
unpadded computation (see ops/sinkhorn.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pram_tpu.models.common import (
    CrossAttentionBlock,
    LearnableFourierPE,
    SelfAttentionBlock,
)
from pram_tpu.ops.matching import MatchResult, mutual_matches
from pram_tpu.ops.sinkhorn import dual_softmax_matching, sinkhorn_matching


@dataclass
class GMLConfig:
    """Defaults = reference nets/gml.py:193-209."""

    descriptor_dim: int = 128
    hidden_dim: int = 256
    num_heads: int = 4
    n_layers: int = 9
    sinkhorn_iterations: int = 20
    match_threshold: float = 0.2
    with_sinkhorn: bool = True
    use_pallas_sinkhorn: bool = False  # fused VMEM kernel (TPU only)


class GML(nn.Module):
    """Attentional graph matcher producing a transport plan over keypoints."""

    config: GMLConfig = field(default_factory=GMLConfig)

    @nn.compact
    def __call__(
        self,
        desc0: jax.Array,  # [B, N, D]
        desc1: jax.Array,  # [B, M, D]
        norm_kpts0: jax.Array,  # [B, N, 2]
        norm_kpts1: jax.Array,  # [B, M, 2]
        mask0: Optional[jax.Array] = None,
        mask1: Optional[jax.Array] = None,
    ) -> dict:
        cfg = self.config
        head_dim = cfg.hidden_dim // cfg.num_heads

        n0 = desc0.shape[1]
        n1 = desc1.shape[1]
        splits = (n0, n1)

        # one token stream: both sides share every projection, so the
        # layer stack runs each matmul ONCE over the concatenation (the
        # attention ops stay blocked per side via `splits`) — fewer,
        # larger MXU calls than the reference's per-side module calls
        cat = jnp.concatenate([desc0, desc1], axis=1)
        x = nn.Dense(cfg.hidden_dim, name="input_proj")(cat)
        posenc = LearnableFourierPE(f_dim=head_dim, name="poseenc")
        enc = posenc(jnp.concatenate([norm_kpts0, norm_kpts1], axis=1))
        if mask0 is None and mask1 is None:
            mask_cat = None
        else:
            b = desc0.shape[0]
            m0 = mask0 if mask0 is not None else jnp.ones((b, n0), bool)
            m1 = mask1 if mask1 is not None else jnp.ones((b, n1), bool)
            mask_cat = jnp.concatenate([m0, m1], axis=1)

        for i in range(cfg.n_layers):
            x = SelfAttentionBlock(
                feat_dim=cfg.hidden_dim,
                hidden_dim=cfg.hidden_dim,
                num_heads=cfg.num_heads,
                name=f"self_attn_{i}",
            )(x, enc, mask_cat, splits=splits)
            x, _ = CrossAttentionBlock(
                feat_dim=cfg.hidden_dim,
                hidden_dim=cfg.hidden_dim,
                num_heads=cfg.num_heads,
                name=f"cross_attn_{i}",
            )(x, None, mask0, mask1, splits=splits)
        x0, x1 = x[:, :n0], x[:, n0:]

        # The reference creates out_proj for every layer but only applies the
        # last at inference (nets/gml.py:279-280); earlier ones exist for the
        # training-time per-layer losses. We declare all for checkpoint parity.
        for i in range(cfg.n_layers - 1):
            _ = nn.Dense(cfg.hidden_dim, name=f"out_proj_{i}")
        out_proj = nn.Dense(cfg.hidden_dim, name=f"out_proj_{cfg.n_layers - 1}")
        d = x0.shape[-1]
        md0 = out_proj(x0) / d**0.25
        md1 = out_proj(x1) / d**0.25

        sim = jnp.einsum(
            "bnd,bmd->bnm", md0, md1, preferred_element_type=jnp.float32
        )
        dustbin = self.param("bin_score", nn.initializers.ones, ())
        if cfg.with_sinkhorn:
            from pram_tpu.utils.pallas_gate import tpu_pallas_ok

            if cfg.use_pallas_sinkhorn and tpu_pallas_ok():
                from pram_tpu.ops.sinkhorn_pallas import sinkhorn_matching_pallas

                plan = sinkhorn_matching_pallas(
                    sim, dustbin, cfg.sinkhorn_iterations, mask0, mask1
                )
            else:
                plan = sinkhorn_matching(
                    sim, dustbin, cfg.sinkhorn_iterations, mask0, mask1
                )
        else:
            plan = dual_softmax_matching(sim, dustbin, mask0, mask1)
        return {"plan": plan, "mdesc0": md0, "mdesc1": md1}


def extract_matches(plan: jax.Array, threshold: float = 0.2) -> MatchResult:
    """Mutual-max match readout (reference nets/gml.py:304-319)."""
    return mutual_matches(plan, threshold)
