"""Model registry — dynamic construction by config name.

TPU-native equivalent of the reference's plugin loader
(localization/base_model.py:9-44, nets/load_segnet.py): models are selected by
string name from config, built with merged default+user configs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple


def build_recognizer(name: str, config: Optional[Dict[str, Any]] = None):
    """Build a recognition head module by name ('segnetvit' | 'segnet')."""
    config = config or {}
    name = name.lower()
    if name == "segnetvit":
        from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig

        cfg = SegNetViTConfig(**config)
        return SegNetViT(cfg)
    if name == "segnet":
        from pram_tpu.models.segnet import SegNet, SegNetConfig

        cfg = SegNetConfig(**config)
        return SegNet(cfg)
    raise ValueError(f"unknown recognizer: {name}")


def build_matcher(name: str, config: Optional[Dict[str, Any]] = None):
    """Build a matcher module by name ('gml' | 'adagml' | 'gm')."""
    config = config or {}
    name = name.lower()
    if name == "gml":
        from pram_tpu.models.gml import GML, GMLConfig

        return GML(GMLConfig(**config))
    if name == "adagml":
        from pram_tpu.models.adagml import AdaGML, AdaGMLConfig

        return AdaGML(AdaGMLConfig(**config))
    if name == "gm":
        from pram_tpu.models.gm import GM, GMConfig

        return GM(GMConfig(**config))
    raise ValueError(f"unknown matcher: {name}")


def build_extractor(name: str, config: Optional[Dict[str, Any]] = None):
    """Build a feature extractor module by name ('sfd2' | 'superpoint')."""
    config = config or {}
    name = name.lower()
    if name in ("sfd2", "resnet4x"):
        from pram_tpu.models.sfd2 import ResNet4x

        return ResNet4x(**config)
    if name == "superpoint":
        from pram_tpu.models.superpoint import SuperPoint

        return SuperPoint(**config)
    raise ValueError(f"unknown extractor: {name}")
