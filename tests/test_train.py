"""Training tests: loss parity with the reference quirk, overfit, DP mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
from pram_tpu.train.losses import seg_accuracy, seg_iou_precision, seg_loss_weighted
from pram_tpu.train.trainer import (
    TrainConfig,
    init_train_state,
    lr_schedule,
    make_data_mesh,
    make_train_step,
)


def torch_seg_loss(pred_bnc, target, weight_background=0.1):
    """Reference compute_seg_loss_weight (tools/metrics.py:131-148)."""
    pred = torch.log_softmax(pred_bnc.transpose(-2, -1), dim=1)  # [B, C, N]
    weight = torch.ones(pred.shape[1])
    weight[0] = weight_background
    return F.cross_entropy(pred, target.long(), weight=weight)


def test_seg_loss_matches_reference_quirk(rng):
    logits = rng.randn(2, 50, 9).astype(np.float32)
    target = rng.randint(0, 9, (2, 50))
    ours = float(
        seg_loss_weighted(jnp.asarray(logits), jnp.asarray(target))
    )
    theirs = float(
        torch_seg_loss(torch.from_numpy(logits), torch.from_numpy(target))
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_seg_loss_masked_ignores_padding(rng):
    logits = rng.randn(1, 30, 5).astype(np.float32)
    target = rng.randint(0, 5, (1, 30))
    mask = np.zeros((1, 30), bool)
    mask[:, :20] = True
    full = float(
        seg_loss_weighted(
            jnp.asarray(logits[:, :20]), jnp.asarray(target[:, :20])
        )
    )
    masked = float(
        seg_loss_weighted(
            jnp.asarray(logits), jnp.asarray(target), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(full, masked, rtol=1e-5)


def test_seg_metrics(rng):
    logits = np.zeros((1, 6, 4), np.float32)
    target = np.array([[0, 1, 1, 2, 3, 3]])
    # predictions: [0, 1, 2, 2, 3, 0]
    for i, c in enumerate([0, 1, 2, 2, 3, 0]):
        logits[0, i, c] = 5.0
    corr, incorr = seg_accuracy(jnp.asarray(logits), jnp.asarray(target))
    # non-bg targets: 5; correct among them: idx1(1==1), idx3(2==2), idx4(3==3)
    np.testing.assert_allclose(float(corr), 3 / 6)
    np.testing.assert_allclose(float(incorr), 2 / 6)
    iou, prec = seg_iou_precision(jnp.asarray(logits), jnp.asarray(target))
    assert 0 < float(iou) <= 1 and 0 < float(prec) <= 1


def test_lr_schedule_floor_and_cap():
    cfg = TrainConfig(lr=1e-3, min_lr=1e-5, decay_rate=0.9, decay_iter=10)
    s = lr_schedule(cfg)
    np.testing.assert_allclose(float(s(jnp.asarray(0))), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(
        float(s(jnp.asarray(20))), max(1e-3 * 0.9**10, 1e-5), rtol=1e-5
    )
    np.testing.assert_allclose(float(s(jnp.asarray(10**6))), 1e-5, rtol=1e-5)


def _tiny_batch(rng, b=8, n=32, d=32, c=5):
    descs = rng.randn(b, n, d).astype(np.float32)
    gt = rng.randint(0, c, (b, n))
    # make descriptors informative about the label
    for cls in range(c):
        descs[..., cls] += 3.0 * (gt == cls)
    return {
        "seg_descriptors": jnp.asarray(descs),
        "norm_keypoints": jnp.asarray(
            (rng.rand(b, n, 2) * 2 - 1).astype(np.float32)
        ),
        "gt_seg": jnp.asarray(gt),
        "mask": jnp.ones((b, n), bool),
    }


def test_train_step_overfits_tiny_problem(rng):
    cfg = TrainConfig(lr=1e-3, decay_iter=10**9)
    model = SegNetViT(
        SegNetViTConfig(descriptor_dim=32, hidden_dim=32, output_dim=64,
                        n_class=5, n_layers=2, num_heads=2)
    )
    batch = _tiny_batch(rng)
    state = init_train_state(model, cfg, batch)
    step = make_train_step(model, cfg)
    losses = []
    for _ in range(60):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, f"no training progress: {losses[::10]}"
    assert float(metrics["acc_corr"]) > 0.5
    assert int(state.iteration) == 60


def test_train_step_dp_mesh_matches_single_device(rng):
    """DP-sharded step must produce the same update as single-device."""
    cfg = TrainConfig(lr=1e-3)
    model = SegNetViT(
        SegNetViTConfig(descriptor_dim=16, hidden_dim=16, output_dim=32,
                        n_class=4, n_layers=1, num_heads=2)
    )
    batch = _tiny_batch(rng, b=8, n=16, d=16, c=4)
    state0 = init_train_state(model, cfg, batch)

    step_single = make_train_step(model, cfg, donate=False)
    s1, m1 = step_single(state0, batch)

    mesh = make_data_mesh(8)
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    step_dp = make_train_step(model, cfg, mesh=mesh, donate=False)
    s2, m2 = step_dp(state0, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
