"""GM matcher — SuperGlue-style attentional GNN with Sinkhorn.

Rebuild of the reference's GM (nets/gm.py:93-263). Note the reference ships
with a constructor bug (nets/gm.py:51 passes ``hidden_dim=`` to
``AttentionalPropagation`` which doesn't accept it, so GM cannot be
instantiated there); this is the *intended*, working architecture: descriptor
+ keypoint-MLP encoding, 2*n_layers alternating self/cross attentional
propagation with shared weights per layer pair side, per-layer final
projection (last used at inference), Sinkhorn with dustbin.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pram_tpu.models.segnet import AttentionalPropagation, PointMLP
from pram_tpu.ops.matching import MatchResult, mutual_matches
from pram_tpu.ops.sinkhorn import dual_softmax_matching, sinkhorn_matching


@dataclass
class GMConfig:
    """Defaults = reference nets/gm.py:94-109."""

    descriptor_dim: int = 128
    keypoint_encoder: Sequence[int] = (32, 64, 128, 256)
    n_layers: int = 9  # expands to 2*n_layers alternating self/cross
    sinkhorn_iterations: int = 20
    match_threshold: float = 0.2
    with_sinkhorn: bool = True
    ac_fn: str = "relu"
    norm_fn: str = "in"


class GM(nn.Module):
    """SuperGlue-style matcher over two padded keypoint sets."""

    config: GMConfig = field(default_factory=GMConfig)

    @nn.compact
    def __call__(
        self,
        desc0: jax.Array,  # [B, N, D]
        desc1: jax.Array,
        norm_kpts0: jax.Array,  # [B, N, 2]
        norm_kpts1: jax.Array,
        scores0: jax.Array,  # [B, N]
        scores1: jax.Array,
        mask0: Optional[jax.Array] = None,
        mask1: Optional[jax.Array] = None,
    ) -> dict:
        cfg = self.config
        kenc = PointMLP(
            list(cfg.keypoint_encoder) + [cfg.descriptor_dim],
            ac_fn=cfg.ac_fn,
            norm_fn=cfg.norm_fn,
            name="kenc",
        )
        x0 = desc0 + kenc(
            jnp.concatenate([norm_kpts0, scores0[..., None]], -1), mask0
        )
        x1 = desc1 + kenc(
            jnp.concatenate([norm_kpts1, scores1[..., None]], -1), mask1
        )

        names = ["self", "cross"] * cfg.n_layers
        for i, kind in enumerate(names):
            layer = AttentionalPropagation(
                feature_dim=cfg.descriptor_dim,
                num_heads=4,
                ac_fn=cfg.ac_fn,
                norm_fn=cfg.norm_fn,
                name=f"gnn_{i}",
            )
            if kind == "cross":
                d0 = layer(x0, x1, mask1, mask0)
                d1 = layer(x1, x0, mask0, mask1)
            else:
                d0 = layer(x0, x0, mask0, mask0)
                d1 = layer(x1, x1, mask1, mask1)
            x0 = x0 + d0
            x1 = x1 + d1

        for i in range(cfg.n_layers - 1):
            _ = nn.Dense(cfg.descriptor_dim, name=f"final_proj_{i}")
        fproj = nn.Dense(cfg.descriptor_dim, name=f"final_proj_{cfg.n_layers-1}")
        md0 = fproj(x0)
        md1 = fproj(x1)

        d = cfg.descriptor_dim
        sim = jnp.einsum(
            "bnd,bmd->bnm", md0, md1, preferred_element_type=jnp.float32
        ) / d**0.5
        dustbin = self.param("bin_score", nn.initializers.ones, ())
        if cfg.with_sinkhorn:
            plan = sinkhorn_matching(
                sim, dustbin, cfg.sinkhorn_iterations, mask0, mask1
            )
        else:
            plan = dual_softmax_matching(sim, dustbin, mask0, mask1)
        return {"plan": plan}


def extract_matches(plan: jax.Array, threshold: float = 0.2) -> MatchResult:
    return mutual_matches(plan, threshold)
