"""Typed experiment configuration with the reference's YAML surface.

The reference loads flat YAML dicts with un-validated key access
(train.py:113-114, config_train_*.yaml). Here the same YAML files parse into
typed dataclasses — unknown keys are preserved in ``extras`` (the reference
configs carry many commented alternates like ``weight_path_1``), known keys
are validated, and the nested ``localization:`` block maps onto the engine's
LocConfig.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import yaml

from pram_tpu.engine.localizer import LocConfig
from pram_tpu.train.trainer import TrainConfig


@dataclass
class JitterParams:
    brightness: float = 0.5
    contrast: float = 0.5
    saturation: float = 0.25
    hue: float = 0.15
    blur: float = 0.0


@dataclass
class ExperimentConfig:
    """Flat experiment config (configs/config_train_*_sfd2.yaml layout)."""

    dataset: List[str] = field(default_factory=lambda: ["7Scenes"])
    network: str = "segnetvit"
    feature: str = "sfd2"

    save_path: str = "exp"
    landmark_path: str = "landmarks"
    dataset_path: str = "datasets"
    config_path: str = "configs/datasets"

    image_dim: int = 3
    feat_dim: int = 128

    min_inliers: int = 32
    max_inliers: int = 256
    random_inliers: bool = True
    max_keypoints: int = 512
    eval_max_keypoints: int = 1024
    output_dim: int = 1024
    layers: int = 15
    n_class: int = 113

    jitter_params: JitterParams = field(default_factory=JitterParams)
    scale_params: Sequence[float] = (0.5, 1.0)
    with_aug: bool = True
    use_mid_feature: bool = True
    norm_desc: bool = False
    with_cls: bool = False
    with_score: bool = False

    batch_size: int = 32
    its_per_epoch: int = 1000
    epochs: int = 200
    lr: float = 1e-4
    min_lr: float = 1e-5
    decay_rate: float = 0.999992
    decay_iter: int = 80000
    workers: int = 8
    log_intervals: int = 50
    eval_n_epoch: int = 10
    do_eval: bool = False
    cluster_method: str = "birch"

    weight_path: Optional[str] = None
    resume_path: Optional[str] = None

    localization: LocConfig = field(default_factory=LocConfig)
    # keys for the localization block that belong to the host pipeline, not
    # the compiled engine
    loc_scene_name: List[str] = field(default_factory=list)
    matching_method: str = "gml"
    with_compress: bool = True
    refinement_method: str = "projection"
    save_loc_path: Optional[str] = None

    extras: Dict[str, Any] = field(default_factory=dict)

    def train_config(self) -> TrainConfig:
        return TrainConfig(
            lr=self.lr,
            min_lr=self.min_lr,
            decay_rate=self.decay_rate,
            decay_iter=self.decay_iter,
            epochs=self.epochs,
            its_per_epoch=self.its_per_epoch,
            batch_size=self.batch_size,
        )


_LOC_KEY_MAP = {
    # reference 'localization:' key -> LocConfig field
    "seg_k": "seg_k",
    "threshold": "threshold",
    "min_kpts": "min_kpts",
    "min_matches": "min_matches",
    "min_inliers": "min_inliers",
    "semantic_matching": "semantic_matching",
    "do_refinement": "do_refinement",
    "pre_filtering_th": "pre_filtering_th",
    "refinement_nn_ratio": "projection_ratio",
}


def load_config(path: str) -> ExperimentConfig:
    """Parse a reference-format YAML into an ExperimentConfig."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    return config_from_dict(raw)


def config_from_dict(raw: Dict[str, Any]) -> ExperimentConfig:
    known = {f.name for f in dataclasses.fields(ExperimentConfig)}
    kwargs: Dict[str, Any] = {}
    extras: Dict[str, Any] = {}

    loc_raw = raw.pop("localization", {}) or {}
    loc_kwargs = {}
    loc_host = {}
    for k, v in loc_raw.items():
        if k in _LOC_KEY_MAP:
            loc_kwargs[_LOC_KEY_MAP[k]] = v
        elif k in ("loc_scene_name", "matching_method", "with_compress",
                   "refinement_method"):
            loc_host[k] = v
        elif k == "save_path":
            loc_host["save_loc_path"] = v
        else:
            extras[f"localization.{k}"] = v
    kwargs["localization"] = LocConfig(**{
        k: (float(v) if k in ("threshold", "pre_filtering_th",
                              "projection_ratio") else v)
        for k, v in loc_kwargs.items()
    })
    kwargs.update(loc_host)

    for k, v in raw.items():
        if k == "jitter_params" and isinstance(v, dict):
            kwargs[k] = JitterParams(**v)
        elif k in known:
            kwargs[k] = v
        else:
            extras[k] = v
    kwargs["extras"] = extras
    return ExperimentConfig(**kwargs)


@dataclass
class SceneConfig:
    """Per-scene entry of configs/datasets/<Dataset>.yaml."""

    n_cluster: int
    cluster_mode: str = "xz"
    cluster_method: str = "birch"
    training_sample_ratio: int = 1
    eval_sample_ratio: int = 1
    gt_pose_path: Optional[str] = None
    query_path: Optional[str] = None
    image_path_prefix: str = ""
    extras: Dict[str, Any] = field(default_factory=dict)


def load_dataset_config(path: str):
    """Parse a dataset YAML -> (dataset name, {scene: SceneConfig})."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    name = raw.pop("dataset")
    scenes = raw.pop("scenes")
    known = {f.name for f in dataclasses.fields(SceneConfig)}
    out = {}
    for scene in scenes:
        sc = raw.get(scene, {}) or {}
        kwargs = {k: v for k, v in sc.items() if k in known}
        kwargs["extras"] = {k: v for k, v in sc.items() if k not in known}
        out[scene] = SceneConfig(**kwargs)
    return name, out
