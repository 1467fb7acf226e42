"""RetNet — global-descriptor retrieval CNN with GeM pooling.

Rebuild of nets/retnet.py:60-170. The reference defines it but does not use
it in the pipeline (PRAM's point is to *discard* global retrieval); included
for capability parity. Takes a mid-level feature map (e.g. SFD2's
``mid_features``) and produces an L2-normalized global descriptor via two
downsampling stages of grouped residual blocks and trainable generalized-mean
pooling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def generalized_mean_pool(x: jax.Array, p: jax.Array, eps: float = 1e-6):
    """GeM: (mean(x^p))^(1/p) over spatial dims (nets/retnet.py:66-104)."""
    x = jnp.clip(x, eps, None) ** p
    x = jnp.mean(x, axis=(1, 2))
    return x ** (1.0 / p)


class RetResBlock(nn.Module):
    """Grouped bottleneck residual block with GELU (nets/retnet.py:24-63)."""

    features: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(
            self.features, (3, 3), padding=1,
            feature_group_count=self.groups, use_bias=False, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn3")(y)
        return nn.gelu(y + x, approximate=False)


class RetNet(nn.Module):
    """Global retrieval head: [B, H, W, indim] -> [B, outdim] unit vectors."""

    indim: int = 256
    outdim: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(512, (3, 3), strides=(2, 2), padding=1, name="conv_a")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn_a")(x)
        x = RetResBlock(512, name="res_a0")(x)
        x = RetResBlock(512, name="res_a1")(x)
        x = nn.Conv(1024, (3, 3), strides=(2, 2), padding=1, name="conv_b")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn_b")(x)
        x = RetResBlock(1024, name="res_b0")(x)
        x = RetResBlock(1024, name="res_b1")(x)

        p = self.param("gem_p", lambda k: jnp.asarray([3.0]))
        x = generalized_mean_pool(x, p[0])
        x = nn.Dense(self.outdim, name="fc")(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)
