"""Common host utilities (reference tools/common.py).

Image resize/pad helpers and config snapshotting; the reference's GPU
environment setup (torch_set_gpu, tools/common.py:37) has no TPU equivalent —
device selection is jax.devices()/mesh construction.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import yaml


def resize_img(img: np.ndarray, nh: int = -1, nw: int = -1, mode=None):
    """Resize keeping aspect ratio when only one target dim is given
    (tools/common.py resize_img semantics)."""
    import cv2

    if mode is None:
        mode = cv2.INTER_NEAREST
    h, w = img.shape[:2]
    if nh > 0 and nw > 0:
        return cv2.resize(img, (nw, nh), interpolation=mode)
    if nh > 0:
        return cv2.resize(img, (int(w * nh / h), nh), interpolation=mode)
    if nw > 0:
        return cv2.resize(img, (nw, int(h * nw / w)), interpolation=mode)
    return img


def pad_to_multiple(
    img: np.ndarray, multiple: int = 8
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Zero-pad H/W up to a multiple (TPU extractors need static /8 shapes)."""
    h, w = img.shape[:2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        widths = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
        img = np.pad(img, widths)
    return img, (h, w)


def puttext_with_background(
    img, text, org, bg_color=(0, 0, 0), text_color=(0, 255, 0),
    fscale=1.0, thickness=2,
):
    """Text overlay with a filled background box (tools/common.py)."""
    import cv2

    (tw, th), baseline = cv2.getTextSize(
        text, cv2.FONT_HERSHEY_SIMPLEX, fscale, thickness
    )
    x, y = org
    cv2.rectangle(
        img, (x, y - th - baseline), (x + tw, y + baseline), bg_color, -1
    )
    cv2.putText(
        img, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, fscale, text_color,
        thickness, cv2.LINE_AA,
    )
    return img


def save_args_yaml(args, save_dir: str, name: str = "args.yaml"):
    """Config snapshot (trainer.py:86)."""
    os.makedirs(save_dir, exist_ok=True)
    if not isinstance(args, dict):
        args = vars(args) if hasattr(args, "__dict__") else dict(args)
    with open(os.path.join(save_dir, name), "w") as f:
        yaml.safe_dump(args, f, sort_keys=False)
