"""SegNetViT — ViT-style landmark recognition over keypoint tokens.

TPU-native rebuild of the reference's default recognition head
(nets/segnetvit.py:109-203): input projection 256->hidden, learnable Fourier
rotary positional encoding on normalized keypoint coordinates, a stack of
self-attention blocks, and a Linear-LN-GELU-Linear segmentation head emitting
per-keypoint landmark logits ``[B, N, n_class]``.

Differences from the reference dictated by TPU execution: tokens are padded to
a static N with a validity mask (attention keys are masked), and the whole
forward is one jit-compiled function over the batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pram_tpu.models.common import LearnableFourierPE, SelfAttentionBlock


@dataclass
class SegNetViTConfig:
    """Hyperparameters (defaults = reference nets/segnetvit.py:125-137)."""

    descriptor_dim: int = 256
    output_dim: int = 1024
    n_class: int = 512
    n_layers: int = 15
    num_heads: int = 4
    hidden_dim: int = 256
    with_score: bool = False
    with_sc: bool = False  # optional scene-coordinate head


class SegNetViT(nn.Module):
    """Per-keypoint landmark classifier (recognition head)."""

    config: SegNetViTConfig = field(default_factory=SegNetViTConfig)

    @nn.compact
    def __call__(
        self,
        descriptors: jax.Array,  # [B, N, D]
        norm_keypoints: jax.Array,  # [B, N, 2] normalized coords
        mask: Optional[jax.Array] = None,  # [B, N] bool
    ) -> dict:
        cfg = self.config
        head_dim = cfg.hidden_dim // cfg.num_heads
        enc = LearnableFourierPE(f_dim=head_dim, name="kenc")(norm_keypoints)
        x = nn.Dense(cfg.hidden_dim, name="input_proj")(descriptors)
        for i in range(cfg.n_layers):
            x = SelfAttentionBlock(
                feat_dim=cfg.hidden_dim,
                hidden_dim=cfg.hidden_dim,
                num_heads=cfg.num_heads,
                name=f"gnn_{i}",
            )(x, enc, mask)

        y = nn.Dense(cfg.output_dim, name="seg_0")(x)
        y = nn.LayerNorm(name="seg_ln")(y)
        y = nn.gelu(y, approximate=False)
        logits = nn.Dense(cfg.n_class, name="seg_3")(y)
        out = {"prediction": logits}
        if cfg.with_sc:
            z = nn.Dense(cfg.output_dim, name="sc_0")(x)
            z = nn.LayerNorm(name="sc_ln")(z)
            z = nn.gelu(z, approximate=False)
            out["sc"] = nn.Dense(3, name="sc_3")(z)
        return out
