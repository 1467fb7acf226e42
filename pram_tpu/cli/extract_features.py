"""Feature extraction CLI: images -> hloc-compatible h5.

Rebuild of localization/extract_features.py: glob/list image loading,
per-config extractor (sfd2 / superpoint-n4096), h5 groups with
{keypoints, scores, descriptors [D, N], image_size} and keypoint scale-back
when images are resized. The extractor itself runs as the fused fixed-shape
TPU pipeline (models/sfd2.py extract): images are padded to a common shape
and processed in batches — per-image python inference loops become device
batches.

Usage:
  python -m pram_tpu.cli.extract_features --image_dir D --export_fn out.h5 \
      --conf sfd2 [--weight_path ckpt.pth] [--image_list list.txt]
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

CONFS = {
    "sfd2": {
        "output": "feats-sfd2",
        "model": {"name": "resnet4x", "outdim": 128, "max_keypoints": 4096,
                  "conf_th": 0.005, "nms_radius": 4, "min_keypoints": 128},
        "preprocessing": {"grayscale": False, "resize_max": None},
    },
    "resnet4x": {
        "output": "feats-resnet4x",
        "model": {"name": "resnet4x", "outdim": 128, "max_keypoints": 4096,
                  "conf_th": 0.005, "nms_radius": 4, "min_keypoints": 128},
        "preprocessing": {"grayscale": False, "resize_max": None},
    },
    "superpoint-n4096": {
        "output": "feats-superpoint-n4096",
        "model": {"name": "superpoint", "outdim": 256, "max_keypoints": 4096,
                  "conf_th": 0.005, "nms_radius": 3, "min_keypoints": 32},
        "preprocessing": {"grayscale": True, "resize_max": None},
    },
}

IMAGE_GLOBS = ["*.jpg", "*.png", "*.jpeg", "*.JPG", "*.PNG"]


def list_images(root: str, image_list: Optional[str] = None) -> List[str]:
    if image_list is not None:
        with open(image_list) as f:
            return [l.strip() for l in f if l.strip()]
    paths = []
    for g in IMAGE_GLOBS:
        paths += glob.glob(osp.join(root, "**", g), recursive=True)
    rel = sorted(osp.relpath(p, root) for p in paths)
    if not rel:
        raise ValueError(f"no images under {root}")
    return rel


def load_image(path: str, grayscale: bool, resize_max: Optional[int]):
    """Read an image -> float [H, W, C] in [0,1] + scale back factor."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    if not grayscale:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    size = np.array(img.shape[:2][::-1])  # (w, h)
    scale = 1.0
    if resize_max and max(img.shape[:2]) > resize_max:
        scale = resize_max / max(img.shape[:2])
        img = cv2.resize(
            img, (int(round(img.shape[1] * scale)), int(round(img.shape[0] * scale)))
        )
    img = img.astype(np.float32) / 255.0
    if grayscale:
        img = img[..., None]
    return img, size, scale


def _pad_to_multiple(img: np.ndarray, mult: int = 8):
    h, w = img.shape[:2]
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
    return img


def build_extractor(conf: Dict, weight_path: Optional[str] = None):
    """Create (model, variables, extract_fn) for a config, optionally with
    converted reference weights."""
    import jax

    name = conf["model"]["name"]
    if name in ("resnet4x", "sfd2"):
        from pram_tpu.models.sfd2 import ResNet4x, extract, preprocess_image

        model = ResNet4x(outdim=conf["model"]["outdim"])
        if weight_path:
            from pram_tpu.models.convert import convert_sfd2, load_torch_state_dict

            variables = jax.tree_util.tree_map(
                np.asarray, convert_sfd2(load_torch_state_dict(weight_path))
            )
        else:
            import jax.numpy as jnp

            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
            )
        return model, variables, extract, preprocess_image
    if name == "superpoint":
        from pram_tpu.models.superpoint import SuperPoint, extract

        model = SuperPoint(descriptor_dim=conf["model"]["outdim"])
        if weight_path:
            from pram_tpu.models.convert import (
                convert_superpoint,
                load_torch_state_dict,
            )

            variables = jax.tree_util.tree_map(
                np.asarray,
                convert_superpoint(load_torch_state_dict(weight_path)),
            )
        else:
            import jax.numpy as jnp

            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))
            )
        return model, variables, extract, None
    raise ValueError(f"unknown extractor {name}")


def build_compressor(feat_dim: int, weight_path: Optional[str] = None):
    """Optional 128->64/32-d descriptor compression (reference main.py:50-63).

    Returns a callable descs [N, 128] -> [N, feat_dim], or None when
    feat_dim == 128 (the uncompressed default).
    """
    if feat_dim == 128:
        return None
    import jax
    import jax.numpy as jnp

    from pram_tpu.models.sfd2 import DescriptorCompressor

    comp = DescriptorCompressor(outdim=feat_dim)
    if weight_path:
        from pram_tpu.models.convert import (
            convert_descriptor_compressor,
            load_torch_state_dict,
        )

        variables = jax.tree_util.tree_map(
            np.asarray,
            convert_descriptor_compressor(load_torch_state_dict(weight_path)),
        )
    else:
        variables = comp.init(jax.random.PRNGKey(0), jnp.zeros((1, 128)))
    fn = jax.jit(lambda d: comp.apply(variables, d))
    return fn


def extract_to_h5(
    image_dir: str,
    export_fn: str,
    conf_name: str = "sfd2",
    weight_path: Optional[str] = None,
    image_list: Optional[str] = None,
    resize_max: Optional[int] = None,
    feat_dim: int = 128,
    compressor_weight_path: Optional[str] = None,
):
    import h5py
    import jax.numpy as jnp

    conf = CONFS[conf_name]
    model, variables, extract_fn, preprocess = build_extractor(
        conf, weight_path
    )
    compressor = build_compressor(feat_dim, compressor_weight_path)
    names = list_images(image_dir, image_list)
    os.makedirs(osp.dirname(osp.abspath(export_fn)), exist_ok=True)

    mconf = conf["model"]
    with h5py.File(export_fn, "w") as out:
        for name in names:
            img, orig_size, scale = load_image(
                osp.join(image_dir, name),
                conf["preprocessing"]["grayscale"],
                resize_max or conf["preprocessing"]["resize_max"],
            )
            img = _pad_to_multiple(img)
            x = jnp.asarray(img)[None]
            if preprocess is not None:
                x = preprocess(x)
            feats = extract_fn(
                model,
                variables,
                x,
                max_keypoints=mconf["max_keypoints"],
                conf_th=mconf["conf_th"],
                nms_radius=mconf["nms_radius"],
                min_keypoints=mconf["min_keypoints"],
            )
            kps = feats["keypoints"]
            mask = np.asarray(kps.mask[0])
            kpts = np.asarray(kps.xy[0])[mask] / scale  # scale back
            scores = np.asarray(kps.scores[0])[mask]
            descs = np.asarray(feats["descriptors"][0])[mask]
            if compressor is not None:
                descs = np.asarray(compressor(jnp.asarray(descs)))
            g = out.create_group(name)
            g.create_dataset("keypoints", data=kpts.astype(np.float32))
            g.create_dataset("scores", data=scores.astype(np.float32))
            # hloc layout: descriptors [D, N]
            g.create_dataset("descriptors", data=descs.T.astype(np.float32))
            g.create_dataset("image_size", data=orig_size)
    return export_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--export_fn", required=True)
    ap.add_argument("--conf", default="sfd2", choices=list(CONFS))
    ap.add_argument("--weight_path", default=None)
    ap.add_argument("--image_list", default=None)
    ap.add_argument("--resize_max", type=int, default=None)
    ap.add_argument(
        "--feat_dim", type=int, default=128,
        help="64/32 compress descriptors through DescriptorCompressor",
    )
    ap.add_argument("--compressor_weight_path", default=None)
    args = ap.parse_args()
    extract_to_h5(
        args.image_dir,
        args.export_fn,
        args.conf,
        args.weight_path,
        args.image_list,
        args.resize_max,
        args.feat_dim,
        args.compressor_weight_path,
    )


if __name__ == "__main__":
    main()
