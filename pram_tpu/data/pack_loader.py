"""PackLoader: native-sampled training batches from feature packs.

The fast input pipeline: per-scene FeaturePacks (native/feature_pack.cpp)
assemble fixed-shape batches in C++ threads; this loader adds the epoch
permutation, multi-scene global-label offsetting (recdataset.py:56-90), and
normalized keypoints — a drop-in replacement for BatchLoader when feature
packs have been built (pram_tpu/data/feature_pack.py).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from pram_tpu.data.feature_pack import FeaturePack
from pram_tpu.data.scene import normalize_size


class PackLoader:
    """Epoch iterator over one or more scenes' feature packs.

    Args:
      packs: per-scene FeaturePacks (labels are scene-local, 0 = background).
      n_clusters: per-scene landmark counts; labels are offset into the
        global space exactly like MultiSceneDataset.
      image_size: (height, width) used for norm_keypoints (per scene).
    """

    def __init__(
        self,
        packs: Sequence[FeaturePack],
        n_clusters: Sequence[int],
        batch_size: int,
        nfeatures: int = 512,
        min_inliers: int = 0,
        max_inliers: int = 4096,
        image_sizes: Optional[Sequence] = None,
        seed: int = 0,
        n_threads: int = 8,
        num_hosts: int = 1,
        host_id: int = 0,
    ):
        self.num_hosts = num_hosts
        self.host_id = host_id
        assert len(packs) == len(n_clusters)
        self.packs = list(packs)
        self.batch_size = batch_size
        self.nfeatures = nfeatures
        self.min_inliers = min_inliers
        self.max_inliers = max_inliers
        self.seed = seed
        self.n_threads = n_threads
        self.image_sizes = (
            list(image_sizes)
            if image_sizes is not None
            else [(480, 640)] * len(packs)
        )

        self.offsets = []
        start = 1
        for n in n_clusters:
            self.offsets.append(start)
            start += n
        self.n_class = start

        # global index: (scene, image)
        self.index = [
            (si, k)
            for si, p in enumerate(self.packs)
            for k in range(p.n_images)
        ]

    def __len__(self):
        return len(self.index)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed + epoch)
        order = rng.permutation(len(self.index))
        order = order[self.host_id :: self.num_hosts]
        nb = len(order) // self.batch_size
        desc_dim = max((p.desc_dim for p in self.packs), default=0)
        for b in range(nb):
            sel = order[b * self.batch_size : (b + 1) * self.batch_size]
            # group by scene so each scene's native sampler runs once
            out_k = np.empty((self.batch_size, self.nfeatures, 2), np.float32)
            out_s = np.empty((self.batch_size, self.nfeatures), np.float32)
            out_g = np.empty((self.batch_size, self.nfeatures), np.int32)
            out_nk = np.empty_like(out_k)
            out_d = (
                np.empty(
                    (self.batch_size, self.nfeatures, desc_dim), np.float32
                )
                if desc_dim
                else None
            )
            by_scene: Dict[int, List[int]] = {}
            for pos, gi in enumerate(sel):
                si, k = self.index[gi]
                by_scene.setdefault(si, []).append((pos, k))
            for si, items in by_scene.items():
                idx = np.array([k for _, k in items], np.int64)
                batch = self.packs[si].sample_batch(
                    idx,
                    self.nfeatures,
                    self.min_inliers,
                    self.max_inliers,
                    seed=(self.seed + epoch) * 1000003 + b,
                    n_threads=self.n_threads,
                )
                off = self.offsets[si]
                seg = batch["gt_seg"]
                seg = np.where(seg > 0, seg + off - 1, 0).astype(np.int32)
                sizes = self.packs[si].sizes
                for row, (pos, k) in enumerate(items):
                    out_k[pos] = batch["keypoints"][row]
                    out_s[pos] = batch["scores"][row]
                    out_g[pos] = seg[row]
                    size = (
                        sizes[k] if sizes is not None
                        else self.image_sizes[si]
                    )
                    out_nk[pos] = normalize_size(
                        batch["keypoints"][row], size
                    )
                    if out_d is not None:
                        d = self.packs[si].desc_dim
                        if d:
                            out_d[pos, :, :d] = batch["seg_descriptors"][row]
                            out_d[pos, :, d:] = 0.0
                        else:
                            out_d[pos] = 0.0
            out = {
                "keypoints": out_k,
                "scores": out_s,
                "gt_seg": out_g,
                "norm_keypoints": out_nk,
                "mask": np.ones((self.batch_size, self.nfeatures), bool),
            }
            if out_d is not None:
                out["seg_descriptors"] = out_d
            yield out
