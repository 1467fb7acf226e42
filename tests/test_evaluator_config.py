"""Evaluator recall buckets + typed config parsing."""

import numpy as np
import pytest
import yaml

from pram_tpu.core.config import (
    config_from_dict,
    load_config,
    load_dataset_config,
)
from pram_tpu.engine.evaluator import EvalReport, INDOOR_BUCKETS, evaluate_queries


class _FakeLocalizer:
    """Returns gt poses for even queries, failures for odd ones."""

    def localize_batch(self, key, camera, kpts, scores, descs, mask, logits):
        import jax.numpy as jnp

        from pram_tpu.engine.localizer import LocResult
        from pram_tpu.geometry.rotations import qvec2rotmat

        b = kpts.shape[0]
        qvec = self._gt_q
        tvec = self._gt_t
        success = jnp.asarray([(i % 2) == 0 for i in range(b)])
        n = kpts.shape[1]
        return LocResult(
            qvec=jnp.asarray(qvec),
            tvec=jnp.asarray(tvec),
            R=qvec2rotmat(jnp.asarray(qvec)),
            success=success,
            num_inliers=jnp.full((b,), 50),
            matched_order=jnp.zeros((b,), jnp.int32),
            matched_sid=jnp.zeros((b,), jnp.int32),
            initial_num_inliers=jnp.full((b,), 50),
            kpt_point_idx=jnp.full((b, n), -1, jnp.int32),
            kpt_xyz=jnp.zeros((b, n, 3)),
        )


def test_evaluate_queries_buckets(rng):
    b, n = 4, 16
    q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (b, 1))
    t = rng.randn(b, 3).astype(np.float32)
    loc = _FakeLocalizer()
    loc._gt_q = q
    loc._gt_t = t

    batch = {
        "camera_params": np.tile(
            np.array([500, 500, 320, 240, 0, 0, 0, 0], np.float32), (b, 1)
        ),
        "camera_size": np.tile(np.array([640, 480], np.float32), (b, 1)),
        "keypoints": np.zeros((b, n, 2), np.float32),
        "scores": np.zeros((b, n), np.float32),
        "descriptors": np.zeros((b, n, 8), np.float32),
        "mask": np.ones((b, n), bool),
        "seg_logits": np.zeros((b, n, 4), np.float32),
        "gt_qvec": q,
        "gt_tvec": t,
        "names": [f"q{i}" for i in range(b)],
    }
    report = evaluate_queries(loc, [batch], log_fn=None)
    assert report.n_total == b
    assert report.n_success == b // 2  # odd queries failed
    # successes are exact poses -> all buckets count them
    for c in report.bucket_counts:
        assert c == b // 2
    rec = report.recall()
    assert rec["0.05m/5.0deg"] == 0.5
    assert report.failed_cases == ["q1", "q3"]
    assert "recall" in report.summary()


def test_config_roundtrip(tmp_path):
    raw = {
        "dataset": ["7Scenes"],
        "network": "segnetvit",
        "layers": 15,
        "lr": 0.0001,
        "batch_size": 16,
        "unknown_key": 42,
        "localization": {
            "seg_k": 7,
            "threshold": 6,
            "min_inliers": 24,
            "matching_method": "gml",
            "with_compress": True,
            "refinement_method": "projection",
            "pre_filtering_th": 0.9,
            "covisibility_frame": 10,
            "weird_loc_key": "x",
        },
    }
    fn = tmp_path / "cfg.yaml"
    with open(fn, "w") as f:
        yaml.safe_dump(raw, f)
    cfg = load_config(str(fn))
    assert cfg.layers == 15
    assert cfg.batch_size == 16
    assert cfg.localization.seg_k == 7
    assert cfg.localization.threshold == 6.0
    assert cfg.localization.min_inliers == 24
    assert cfg.matching_method == "gml"
    assert cfg.refinement_method == "projection"
    assert cfg.extras["unknown_key"] == 42
    assert cfg.extras["localization.weird_loc_key"] == "x"
    tc = cfg.train_config()
    assert tc.lr == 0.0001 and tc.batch_size == 16


def test_repo_configs_parse():
    import glob

    for fn in glob.glob("configs/config_train_*.yaml"):
        cfg = load_config(fn)
        assert cfg.network == "segnetvit"
        assert cfg.localization.seg_k > 0
    name, scenes = load_dataset_config("configs/datasets/7Scenes.yaml")
    assert name == "7Scenes"
    assert set(scenes) == {
        "chess", "heads", "office", "fire", "stairs", "redkitchen", "pumpkin"
    }
    assert scenes["chess"].n_cluster == 16
    assert scenes["chess"].cluster_mode == "xz"


def test_evaluator_streams_through_adaptive(rng):
    """The pipelined evaluator drives the adaptive two-phase API (VERDICT
    r2 #6): same recall as the plain dispatch, no host sync breaking the
    in-flight queue."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pram_tpu.engine.evaluator import evaluate_queries
    from pram_tpu.engine.localizer import LocConfig, Localizer
    from pram_tpu.engine.matching import make_nn_match_fn
    from pram_tpu.maps.device import to_device
    from pram_tpu.maps.synthetic import make_synthetic_scene
    from tests.test_engine import perfect_logits

    scene = make_synthetic_scene(
        rng, n_cluster=3, points_per_cluster=80, n_ref_frames=4, desc_dim=32
    )
    dmap = to_device(scene.map)
    cfg = LocConfig(seg_k=3, min_inliers=12, min_kpts=16, threshold=5.0,
                    num_hypotheses=64)
    loc = Localizer(dmap, make_nn_match_fn(), cfg)

    def batches():
        for _ in range(3):
            qs = [scene.render_query(rng, noise_px=0.3) for _ in range(2)]
            yield {
                "camera_params": np.stack(
                    [[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]] * 2
                ).astype(np.float32),
                "camera_size": np.stack([[640.0, 480.0]] * 2).astype(
                    np.float32
                ),
                "keypoints": np.stack([q["keypoints"] for q in qs]),
                "scores": np.stack([q["scores"] for q in qs]),
                "descriptors": np.stack([q["descriptors"] for q in qs]),
                "mask": np.stack([q["mask"] for q in qs]),
                "seg_logits": np.stack(
                    [
                        perfect_logits(q["gt_seg"], scene.map.n_class,
                                       q["mask"])
                        for q in qs
                    ]
                ),
                "gt_qvec": np.stack([q["qvec"] for q in qs]).astype(
                    np.float32
                ),
                "gt_tvec": np.stack([q["tvec"] for q in qs]),
            }

    report = evaluate_queries(
        loc, batches(), log_fn=None, pipeline_depth=2, prefetch=2,
        method="adaptive",
    )
    assert report.n_total == 6
    assert report.recall()["0.05m/5.0deg"] == 1.0
