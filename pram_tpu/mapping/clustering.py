"""3D landmark clustering: on-device KMeans + CPU Birch.

Rebuild of the reference's cluster step (recognition/recmap.py:85-122):
points observed >= min_obs times are clustered on (axis-masked) coordinates
into n_cluster landmarks. ``cluster_mode`` zeroes unused axes (e.g. 'xz'
clusters in the ground plane).

KMeans runs as jit-compiled Lloyd iterations on the accelerator (one
distance matmul per iteration — MXU work); Birch keeps the reference's
sklearn behavior (hierarchical CF-tree, threshold-sensitive) on host.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "num_iters"))
def kmeans_jax(
    key: jax.Array, xyz: jax.Array, k: int, num_iters: int = 50
) -> Tuple[jax.Array, jax.Array]:
    """Lloyd's algorithm with kmeans++-style random init (on device).

    Args:
      xyz: ``[N, D]`` points.
      k: number of clusters.

    Returns:
      (labels ``[N]`` int32, centers ``[k, D]``).
    """
    n, d = xyz.shape
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centers = xyz[init_idx]

    def step(centers, _):
        # [N, k] squared distances via one matmul
        d2 = (
            jnp.sum(xyz**2, -1, keepdims=True)
            - 2.0 * xyz @ centers.T
            + jnp.sum(centers**2, -1)[None]
        )
        lab = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(lab, k, dtype=xyz.dtype)  # [N, k]
        counts = jnp.sum(onehot, axis=0)  # [k]
        sums = onehot.T @ xyz  # [k, D]
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        # keep empty clusters where they were
        new_centers = jnp.where(
            counts[:, None] > 0, new_centers, centers
        )
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=num_iters)
    d2 = (
        jnp.sum(xyz**2, -1, keepdims=True)
        - 2.0 * xyz @ centers.T
        + jnp.sum(centers**2, -1)[None]
    )
    labels = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    return labels, centers


def cluster_points(
    xyz: np.ndarray,
    k: int,
    mode: str = "xyz",
    method: str = "birch",
    birch_threshold: float = 0.01,
    seed: int = 0,
) -> np.ndarray:
    """Cluster (axis-masked) 3D points into k landmarks
    (recognition/recmap.py:85-122).

    Returns integer labels ``[N]``.
    """
    masked = xyz.astype(np.float64).copy()
    if "x" not in mode:
        masked[:, 0] = 0
    if "y" not in mode:
        masked[:, 1] = 0
    if "z" not in mode:
        masked[:, 2] = 0

    if method == "kmeans":
        labels, _ = kmeans_jax(
            jax.random.PRNGKey(seed), jnp.asarray(masked, jnp.float32), k
        )
        return np.asarray(labels)
    if method == "birch":
        from sklearn.cluster import Birch

        model = Birch(threshold=birch_threshold, n_clusters=k).fit(masked)
        return np.asarray(model.labels_).reshape(-1)
    raise ValueError(f"unknown clustering method {method}")
