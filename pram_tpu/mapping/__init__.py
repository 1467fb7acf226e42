"""Offline map construction: clustering, VRFs, compression, feature export."""

from pram_tpu.mapping.recmap import RecMap
from pram_tpu.mapping.outliers import statistical_outlier_removal
from pram_tpu.mapping.clustering import cluster_points, kmeans_jax

__all__ = [
    "RecMap",
    "statistical_outlier_removal",
    "cluster_points",
    "kmeans_jax",
]
