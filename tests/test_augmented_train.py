"""Augmented in-step training: frozen extractor + jitter inside one jit."""

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
from pram_tpu.models.sfd2 import ResNet4x
from pram_tpu.train.augmented import make_augmented_train_step, photometric_jitter
from pram_tpu.train.trainer import TrainConfig, init_train_state


def test_photometric_jitter_bounds(rng):
    imgs = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    out = photometric_jitter(jax.random.PRNGKey(0), imgs)
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # different keys give different augmentations
    out2 = photometric_jitter(jax.random.PRNGKey(1), imgs)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_augmented_step_trains_and_freezes_extractor(rng):
    b, h, w, n = 2, 32, 40, 24
    extractor = ResNet4x()
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    evars = extractor.init(jax.random.PRNGKey(0), imgs)

    cfg = TrainConfig(lr=1e-3)
    rec = SegNetViT(
        SegNetViTConfig(descriptor_dim=256, hidden_dim=32, output_dim=64,
                        n_class=5, n_layers=1, num_heads=2)
    )
    batch = {
        "image": imgs,
        "keypoints": jnp.asarray(
            (rng.rand(b, n, 2) * [w - 2, h - 2] + 1).astype(np.float32)
        ),
        "norm_keypoints": jnp.asarray(
            (rng.rand(b, n, 2) * 2 - 1).astype(np.float32)
        ),
        "gt_seg": jnp.asarray(rng.randint(0, 5, (b, n))),
        "mask": jnp.ones((b, n), bool),
        "seg_descriptors": jnp.zeros((b, n, 256), jnp.float32),  # init only
        "scores": jnp.ones((b, n), jnp.float32),
    }
    state = init_train_state(rec, cfg, batch)
    step = make_augmented_train_step(rec, extractor, evars, cfg)

    evars_before = jax.tree_util.tree_map(np.asarray, evars)
    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(5):
        state, metrics = step(state, jax.random.fold_in(key, i), batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.iteration) == 5
    # extractor untouched (frozen)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(evars_before),
        jax.tree_util.tree_leaves(evars),
    ):
        np.testing.assert_array_equal(a, np.asarray(b_))


def test_augmented_training_from_images_on_disk(tmp_path, rng):
    """End-to-end augmented training from IMAGE FILES: disk scene (pngs +
    feature cache + colmap model) -> SceneDataset(with_image=True) ->
    collate -> augmented train step (in-step frozen-SFD2 re-extraction,
    trainer.py:96-130 semantics). Loss must drop; jitter must actually
    perturb the resampled descriptors."""
    import pytest

    cv2 = pytest.importorskip("cv2")

    from pram_tpu.data.loader import collate
    from pram_tpu.data.scene import SceneDataset
    from pram_tpu.models.sfd2 import preprocess_image
    from pram_tpu.ops.sampling import sample_descriptors
    from pram_tpu.train.augmented import photometric_jitter
    from tests.test_data import build_disk_scene

    h, w, n_kpts = 48, 64, 48
    spec = build_disk_scene(
        tmp_path, rng, n_imgs=4, n_kpts=120, n_points=80, n_cluster=4
    )
    # textured images on disk at the feature cache's recorded size
    img_dir = tmp_path / "images"
    for nm in spec.image_names:
        fn = img_dir / nm
        os.makedirs(osp.dirname(fn), exist_ok=True)
        cv2.imwrite(str(fn), (rng.rand(480, 640, 3) * 255).astype(np.uint8))
    spec.image_dir = str(img_dir)

    ds = SceneDataset(
        spec, nfeatures=n_kpts, train=True, with_image=True,
        scale_params=(0.5, 1.0),
    )
    item_rng = np.random.RandomState(3)
    items = [ds.get_train_item(i, item_rng) for i in range(len(ds))]
    assert all("image" in it for it in items)
    assert all(it["image"].shape == (480, 640, 3) for it in items)

    batch_np = collate(items)
    # downscale images (and keypoints) so the CPU test stays fast; shapes
    # divisible by 8 for the score pixel-shuffle
    import jax
    import jax.numpy as jnp

    sx, sy = w / 640.0, h / 480.0
    small = np.stack(
        [cv2.resize(im, (w, h)) for im in batch_np["image"]]
    ).astype(np.float32)
    batch = {
        "image": jnp.asarray(small),
        "keypoints": jnp.asarray(batch_np["keypoints"] * [sx, sy]),
        "norm_keypoints": jnp.asarray(batch_np["norm_keypoints"]),
        "gt_seg": jnp.asarray(batch_np["gt_seg"].astype(np.int32)),
        "mask": jnp.asarray(batch_np["mask"]),
        "seg_descriptors": jnp.zeros((len(items), n_kpts, 256), jnp.float32),
        "scores": jnp.asarray(batch_np["scores"]),
    }

    extractor = ResNet4x()
    evars = extractor.init(jax.random.PRNGKey(0), batch["image"])
    cfg = TrainConfig(lr=5e-3)
    rec = SegNetViT(
        SegNetViTConfig(descriptor_dim=256, hidden_dim=32, output_dim=64,
                        n_class=spec.n_class, n_layers=1, num_heads=2)
    )
    state = init_train_state(rec, cfg, batch)
    step = make_augmented_train_step(rec, extractor, evars, cfg)

    losses = []
    key = jax.random.PRNGKey(11)
    for i in range(8):
        state, metrics = step(state, jax.random.fold_in(key, i), batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # the augmentation really perturbs the in-step descriptors: two jitter
    # keys -> different resampled seg-descriptors from the frozen extractor
    def descs(k):
        imgs = photometric_jitter(k, batch["image"])
        fmap = extractor.apply(evars, preprocess_image(imgs))["mid_features"]
        return jax.vmap(
            lambda kp, f: sample_descriptors(
                kp, jnp.transpose(f, (2, 0, 1)), 4, normalize=False
            )
        )(batch["keypoints"], fmap)

    d1 = np.asarray(descs(jax.random.PRNGKey(1)))
    d2 = np.asarray(descs(jax.random.PRNGKey(2)))
    assert np.abs(d1 - d2).max() > 1e-3
