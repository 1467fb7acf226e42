"""Feature packs: mmapped contiguous feature store + native batch sampler.

The TPU-native replacement for the reference's per-image pickled ``.npy``
cache + torch DataLoader workers (dataset/basicdataset.py:167-330,
train.py:146-166): all of a scene's keypoints/scores/descriptors live in one
flat binary pack with the keypoint->landmark labels *precomputed at pack
time*, so training batch assembly is a multithreaded C++ routine
(native/feature_pack.cpp) writing straight into reusable numpy buffers —
no pickle, no per-item python, no worker processes.

Pack layout (little-endian, mmap-friendly):
  header.npz-style: we simply use np.savez with known keys; np.load(mmap_mode)
  keeps arrays on-disk until touched.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Dict, Optional

import numpy as np

_LIB = None


def _native_lib_path() -> str:
    root = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    return osp.join(root, "native", "libfeature_pack.so")


def _native_src_path() -> str:
    root = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    return osp.join(root, "native", "feature_pack.cpp")


def build_native(force: bool = False) -> str:
    """Compile the C++ sampler (g++, cached by mtime)."""
    so = _native_lib_path()
    src = _native_src_path()
    if (
        not force
        and osp.exists(so)
        and os.path.getmtime(so) >= os.path.getmtime(src)
    ):
        return so
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        src, "-o", so,
    ]
    subprocess.run(cmd, check=True)
    return so


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build_native())
        lib.fp_sample_batch.restype = ctypes.c_int
        _LIB = lib
    return _LIB


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class FeaturePack:
    """One scene's packed features with precomputed landmark labels."""

    KEYS = ("offsets", "kpts", "scores", "seg", "names")

    def __init__(self, data: Dict[str, np.ndarray]):
        self.offsets = np.ascontiguousarray(data["offsets"], np.int64)
        self.kpts = np.ascontiguousarray(data["kpts"], np.float32)
        self.scores = np.ascontiguousarray(data["scores"], np.float32)
        self.seg = np.ascontiguousarray(data["seg"], np.int32)
        self.desc = (
            np.ascontiguousarray(data["desc"], np.float32)
            if "desc" in data and data["desc"] is not None
            and np.size(data["desc"])
            else None
        )
        # per-image (h, w) for keypoint normalization (None = caller default)
        self.sizes = (
            np.ascontiguousarray(data["sizes"], np.float32)
            if "sizes" in data and data["sizes"] is not None
            and np.size(data["sizes"])
            else None
        )
        self.names = list(data["names"])

    @property
    def n_images(self) -> int:
        return len(self.offsets) - 1

    @property
    def desc_dim(self) -> int:
        return 0 if self.desc is None else self.desc.shape[1]

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        scene_dataset,
        with_descriptors: bool = False,
    ) -> "FeaturePack":
        """Pack a SceneDataset's images (labels resolved once, here)."""
        offsets = [0]
        kpts, scores, segs, descs, names, sizes = [], [], [], [], [], []
        for idx, name in enumerate(scene_dataset.img_fns):
            feat = scene_dataset._load_features(name)
            k = np.asarray(feat["keypoints"], np.float32)[:, :2]
            s = np.asarray(feat["scores"], np.float32).reshape(-1)
            image_id = scene_dataset.name_to_id[name]
            p3d_ids = scene_dataset.images[image_id].point3D_ids
            seg, _ = scene_dataset._labels_for(name, p3d_ids)
            n = min(len(k), len(seg))
            kpts.append(k[:n])
            scores.append(s[:n])
            segs.append(seg[:n].astype(np.int32))
            if with_descriptors and "descriptors" in feat:
                descs.append(np.asarray(feat["descriptors"], np.float32)[:n])
            if "image_size" in feat:
                sizes.append(
                    np.asarray(feat["image_size"], np.float32).reshape(-1)[:2]
                )
            else:
                sizes.append(np.asarray([480.0, 640.0], np.float32))
            names.append(name)
            offsets.append(offsets[-1] + n)
        return cls(
            {
                "offsets": np.asarray(offsets, np.int64),
                "kpts": np.concatenate(kpts) if kpts else np.zeros((0, 2)),
                "scores": np.concatenate(scores) if scores else np.zeros(0),
                "seg": np.concatenate(segs) if segs else np.zeros(0, np.int32),
                "desc": np.concatenate(descs) if descs else None,
                "sizes": np.stack(sizes) if sizes else None,
                "names": names,
            }
        )

    def save(self, path: str):
        np.savez(
            path,
            offsets=self.offsets,
            kpts=self.kpts,
            scores=self.scores,
            seg=self.seg,
            desc=self.desc if self.desc is not None else np.zeros((0, 0)),
            sizes=self.sizes if self.sizes is not None else np.zeros((0, 0)),
            names=np.asarray(self.names),
        )

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "FeaturePack":
        data = np.load(path, mmap_mode="r" if mmap else None,
                       allow_pickle=False)
        return cls(
            {
                k: data[k]
                for k in (
                    "offsets", "kpts", "scores", "seg", "desc", "names",
                )
            }
            | {"sizes": data["sizes"] if "sizes" in data else None}
        )

    # ------------------------------------------------------------------
    def sample_batch(
        self,
        image_indices: np.ndarray,
        nfeatures: int,
        min_inliers: int = 0,
        max_inliers: int = 4096,
        seed: int = 0,
        n_threads: int = 8,
        out: Optional[Dict[str, np.ndarray]] = None,
    ) -> Dict[str, np.ndarray]:
        """Assemble a fixed-shape training batch with the native sampler."""
        b = len(image_indices)
        d = self.desc_dim
        if out is None:
            out = {
                "keypoints": np.empty((b, nfeatures, 2), np.float32),
                "scores": np.empty((b, nfeatures), np.float32),
                "gt_seg": np.empty((b, nfeatures), np.int32),
            }
            if d:
                out["seg_descriptors"] = np.empty((b, nfeatures, d), np.float32)
        idx = np.ascontiguousarray(image_indices, np.int64)
        lib = _lib()
        ret = lib.fp_sample_batch(
            _ptr(self.offsets, ctypes.c_int64),
            _ptr(self.kpts, ctypes.c_float),
            _ptr(self.scores, ctypes.c_float),
            _ptr(self.seg, ctypes.c_int32),
            _ptr(self.desc, ctypes.c_float) if d else None,
            ctypes.c_int64(self.n_images),
            ctypes.c_int64(d),
            _ptr(idx, ctypes.c_int64),
            ctypes.c_int64(b),
            ctypes.c_int64(nfeatures),
            ctypes.c_int64(min_inliers),
            ctypes.c_int64(max_inliers),
            ctypes.c_uint64(seed),
            ctypes.c_int64(n_threads),
            _ptr(out["keypoints"], ctypes.c_float),
            _ptr(out["scores"], ctypes.c_float),
            _ptr(out["gt_seg"], ctypes.c_int32),
            _ptr(out["seg_descriptors"], ctypes.c_float) if d else None,
        )
        if ret != 0:
            raise RuntimeError(f"fp_sample_batch failed: {ret}")
        out["mask"] = np.ones((b, nfeatures), bool)
        return out
