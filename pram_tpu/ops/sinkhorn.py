"""Sinkhorn optimal transport with dustbin, masked for fixed-shape batches.

TPU-native equivalent of the reference's matching score head
(nets/gml.py:20-46, nets/gm.py:35-60): a similarity matrix is augmented with a
learned dustbin row/column, turned into a transport plan by a fixed number of
Sinkhorn iterations (non-log domain, matching the reference numerics), and the
plan is read out with mutual-max + threshold.

Padding support: padded rows/columns carry zero marginal mass (r_i = 0), which
zeroes their scaling factors after the first iteration — so the plan restricted
to valid entries is *identical* to running the reference on the unpadded
problem, while shapes stay static for XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def _augment_with_dustbin(sim: jax.Array, dustbin: jax.Array) -> jax.Array:
    """Append a dustbin row and column filled with the learned scalar."""
    b, n, m = sim.shape
    col = jnp.broadcast_to(dustbin, (b, n, 1)).astype(sim.dtype)
    sim = jnp.concatenate([sim, col], axis=-1)
    row = jnp.broadcast_to(dustbin, (b, 1, m + 1)).astype(sim.dtype)
    return jnp.concatenate([sim, row], axis=-2)


def sinkhorn_matching(
    sim: jax.Array,
    dustbin: jax.Array,
    num_iters: int = 20,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
) -> jax.Array:
    """Sinkhorn transport plan with dustbin (reference nets/gml.py:27-46).

    Args:
      sim: ``[B, N, M]`` similarity matrix.
      dustbin: scalar (learned) dustbin score.
      num_iters: Sinkhorn iterations (reference: 20).
      mask0: optional ``[B, N]`` bool validity of rows.
      mask1: optional ``[B, M]`` bool validity of columns.

    Returns:
      ``[B, N+1, M+1]`` transport plan; padded rows/cols have zero mass.
    """
    b, n, m = sim.shape
    dtype = sim.dtype
    aug = _augment_with_dustbin(sim, dustbin)

    # The reference (nets/gml.py:38-46) gives the dustbin entry of the row
    # marginal r the value N+1 (= #rows of the augmented matrix) and of the
    # column marginal c the value M+1; the masked equivalent replaces N/M by
    # the valid counts.
    if mask0 is None:
        r_valid = jnp.ones((b, n), dtype)
        n_valid = jnp.full((b,), float(n + 1), dtype)
    else:
        r_valid = mask0.astype(dtype)
        n_valid = jnp.sum(r_valid, axis=-1) + 1.0
    if mask1 is None:
        c_valid = jnp.ones((b, m), dtype)
        m_valid = jnp.full((b,), float(m + 1), dtype)
    else:
        c_valid = mask1.astype(dtype)
        m_valid = jnp.sum(c_valid, axis=-1) + 1.0

    r = jnp.concatenate([r_valid, n_valid[:, None]], axis=-1)  # [B, N+1]
    c = jnp.concatenate([c_valid, m_valid[:, None]], axis=-1)  # [B, M+1]

    p = jax.nn.softmax(aug, axis=-1)

    def body(carry, _):
        u, v = carry
        u = r / (jnp.einsum("bnm,bm->bn", p, v) + _EPS)
        v = c / (jnp.einsum("bnm,bn->bm", p, u) + _EPS)
        return (u, v), None

    u0 = jnp.ones_like(r)
    v0 = jnp.ones_like(c)
    (u, v), _ = lax.scan(body, (u0, v0), None, length=num_iters)
    return p * u[:, :, None] * v[:, None, :]


def dual_softmax_matching(
    sim: jax.Array,
    dustbin: jax.Array,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
) -> jax.Array:
    """Dual-softmax score with dustbin (reference nets/gml.py:20-24).

    Padded rows/columns are pushed to -inf before the softmaxes and zeroed in
    the output.
    """
    aug = _augment_with_dustbin(sim, dustbin)
    neg = jnp.asarray(-1e9, aug.dtype)
    if mask0 is not None:
        rm = jnp.concatenate(
            [mask0, jnp.ones((sim.shape[0], 1), bool)], axis=-1
        )
        aug = jnp.where(rm[:, :, None], aug, neg)
    if mask1 is not None:
        cm = jnp.concatenate(
            [mask1, jnp.ones((sim.shape[0], 1), bool)], axis=-1
        )
        aug = jnp.where(cm[:, None, :], aug, neg)
    score = jax.nn.log_softmax(aug, axis=-1) + jax.nn.log_softmax(aug, axis=-2)
    out = jnp.exp(score)
    if mask0 is not None:
        out = out * rm[:, :, None]
    if mask1 is not None:
        out = out * cm[:, None, :]
    return out
