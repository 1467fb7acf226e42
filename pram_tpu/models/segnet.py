"""SegNet — GNN-variant landmark recognition head.

Rebuild of the reference's SegNet (nets/segnet.py:16-121): keypoint-MLP
positional encoder added to descriptor tokens, N attentional-propagation
layers (residual attention + concat-MLP), and an MLP segmentation head.

The reference's MLP uses Conv1d + InstanceNorm/BatchNorm over the channel-
first layout; here tokens are channel-last and the norm is computed over the
token axis per channel (InstanceNorm1d semantics), masked for padding.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pram_tpu.models.common import masked_softmax


class TokenInstanceNorm(nn.Module):
    """InstanceNorm1d over tokens (normalizes each channel across N), masked.

    Equivalent to torch ``nn.InstanceNorm1d(C, eps)`` applied to ``[B, C, N]``
    (reference nets/layers.py:24), with padded tokens excluded from the
    statistics. torch's InstanceNorm1d default has no affine parameters.
    """

    eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        # x: [B, N, C]
        if mask is None:
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
        else:
            m = mask[..., None].astype(x.dtype)
            cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(x * m, axis=1, keepdims=True) / cnt
            var = jnp.sum(((x - mean) ** 2) * m, axis=1, keepdims=True) / cnt
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class PointMLP(nn.Module):
    """Per-token MLP matching the reference ``MLP`` helper (nets/layers.py:15-35).

    1x1 Conv1d == Dense on channel-last tokens; norm+activation between all
    but the last layer.
    """

    channels: Sequence[int]
    ac_fn: str = "relu"
    norm_fn: str = "in"
    train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, name=f"lin_{i}")(x)
            if i < n - 1:
                if self.norm_fn == "in":
                    x = TokenInstanceNorm(name=f"norm_{i}")(x, mask)
                elif self.norm_fn == "bn":
                    # torch nn.BatchNorm1d(C, eps=1e-3) on [B, C, N]
                    # (nets/layers.py:26): per-channel stats over (B, N);
                    # eval uses running stats + affine.
                    x = nn.BatchNorm(
                        use_running_average=not self.train,
                        epsilon=1e-3,
                        momentum=0.9,
                        name=f"norm_{i}",
                    )(x)
                if self.ac_fn == "relu":
                    x = nn.relu(x)
                elif self.ac_fn == "gelu":
                    x = nn.gelu(x, approximate=False)
                elif self.ac_fn == "lrelu":
                    x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class AttentionalPropagation(nn.Module):
    """Residual message-passing layer (reference nets/layers.py:38-92).

    Attention projections are 1x1 convs (= Dense); the message is merged and
    concatenated with the input through an MLP.
    """

    feature_dim: int
    num_heads: int
    ac_fn: str = "relu"
    norm_fn: str = "in"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, N, D]
        source: jax.Array,  # [B, M, D]
        mask: Optional[jax.Array] = None,  # [B, M] key validity
        self_mask: Optional[jax.Array] = None,  # [B, N] for norm stats
    ) -> jax.Array:
        b, n, d = x.shape
        h = self.num_heads
        hd = d // h

        # the reference's head split is channel-strided: head = c % num_heads
        # (nets/layers.py:57 views [B, D, N] as [B, dim, heads, N]), so the
        # per-head slice is the TRAILING axis of a [hd, h] reshape — kept to
        # stay weight-compatible with SegNet/GM checkpoints
        q = nn.Dense(d, name="proj_q")(x).reshape(b, n, hd, h)
        k = nn.Dense(d, name="proj_k")(source).reshape(b, -1, hd, h)
        v = nn.Dense(d, name="proj_v")(source).reshape(b, -1, hd, h)
        logits = jnp.einsum(
            "bnkh,bmkh->bhnm", q, k, preferred_element_type=jnp.float32
        ) / (hd**0.5)
        attn = masked_softmax(
            logits, None if mask is None else mask[:, None, None, :]
        ).astype(v.dtype)
        msg = jnp.einsum(
            "bhnm,bmkh->bnkh", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        msg = msg.reshape(b, n, d)
        msg = nn.Dense(d, name="merge")(msg)

        y = jnp.concatenate([x, msg], axis=-1)
        y = PointMLP(
            [d * 2, d], ac_fn=self.ac_fn, norm_fn=self.norm_fn, name="mlp"
        )(y, self_mask)
        return y


@dataclass
class SegNetConfig:
    """Defaults = reference nets/segnet.py:33-45."""

    descriptor_dim: int = 256
    output_dim: int = 1024
    n_class: int = 512
    keypoint_encoder: Sequence[int] = (32, 64, 128, 256)
    n_layers: int = 9
    ac_fn: str = "relu"
    norm_fn: str = "in"
    with_score: bool = False
    with_sc: bool = False


class SegNet(nn.Module):
    """GNN recognition head: kenc + n_layers x AttentionalPropagation + seg MLP."""

    config: SegNetConfig = field(default_factory=SegNetConfig)

    @nn.compact
    def __call__(
        self,
        descriptors: jax.Array,  # [B, N, D]
        norm_keypoints: jax.Array,  # [B, N, 2]
        scores: Optional[jax.Array] = None,  # [B, N]
        mask: Optional[jax.Array] = None,
    ) -> dict:
        cfg = self.config
        if cfg.with_score:
            kin = jnp.concatenate([norm_keypoints, scores[..., None]], axis=-1)
        else:
            kin = norm_keypoints
        enc = PointMLP(
            list(cfg.keypoint_encoder) + [cfg.descriptor_dim],
            ac_fn=cfg.ac_fn,
            norm_fn=cfg.norm_fn,
            name="kenc",
        )(kin, mask)
        x = descriptors + enc
        for i in range(cfg.n_layers):
            delta = AttentionalPropagation(
                feature_dim=cfg.descriptor_dim,
                num_heads=4,
                ac_fn=cfg.ac_fn,
                norm_fn=cfg.norm_fn,
                name=f"gnn_{i}",
            )(x, x, mask, mask)
            x = x + delta
        logits = PointMLP(
            [cfg.output_dim, cfg.n_class],
            ac_fn=cfg.ac_fn,
            norm_fn=cfg.norm_fn,
            name="seg",
        )(x, mask)
        out = {"prediction": logits}
        if cfg.with_sc:
            out["sc"] = PointMLP(
                [cfg.output_dim, 3],
                ac_fn=cfg.ac_fn,
                norm_fn=cfg.norm_fn,
                name="sc",
            )(x, mask)
        return out
