"""Augmented in-step training: frozen extractor + jitter inside one jit."""

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
