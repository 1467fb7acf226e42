"""Fixed-shape TPU ops: NMS, keypoint selection, descriptor sampling, Sinkhorn."""

from pram_tpu.ops.nms import simple_nms, max_pool_2d
from pram_tpu.ops.keypoints import extract_keypoints, normalize_keypoints
from pram_tpu.ops.sampling import grid_sample_nchw, sample_descriptors
from pram_tpu.ops.sinkhorn import sinkhorn_matching, dual_softmax_matching
from pram_tpu.ops.matching import mutual_matches

__all__ = [
    "simple_nms",
    "max_pool_2d",
    "extract_keypoints",
    "normalize_keypoints",
    "grid_sample_nchw",
    "sample_descriptors",
    "sinkhorn_matching",
    "dual_softmax_matching",
    "mutual_matches",
]
