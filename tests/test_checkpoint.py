"""Checkpoint/resume tests (orbax) — the reference's per-epoch save/best/resume
semantics (trainer.py:45-57,379-399)."""

import numpy as np

from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
from pram_tpu.train.trainer import TrainConfig, Trainer
from tests.test_train import _tiny_batch


def test_checkpoint_save_restore_roundtrip(tmp_path, rng):
    cfg = TrainConfig(lr=1e-3, epochs=2)
    model = SegNetViT(
        SegNetViTConfig(descriptor_dim=32, hidden_dim=32, output_dim=64,
                        n_class=5, n_layers=1, num_heads=2)
    )
    batch = _tiny_batch(rng)
    t1 = Trainer(model, cfg, batch, save_dir=str(tmp_path / "run"))
    for _ in range(3):
        t1.state, _ = t1.step_fn(t1.state, batch)
    t1.save_checkpoint("test")

    t2 = Trainer(model, cfg, batch, save_dir=str(tmp_path / "run2"))
    # fresh state differs
    p1 = np.asarray(
        next(iter(np.asarray(x) for x in np.asarray(
            [np.asarray(t1.state.params["input_proj"]["kernel"])]
        )))
    )
    t2.restore_checkpoint(str(tmp_path / "run" / "test"))
    assert int(t2.state.iteration) == 3
    np.testing.assert_allclose(
        np.asarray(t2.state.params["input_proj"]["kernel"]),
        np.asarray(t1.state.params["input_proj"]["kernel"]),
    )
    # resumed training continues from the same state
    t2.state, m2 = t2.step_fn(t2.state, batch)
    t1.state, m1 = t1.step_fn(t1.state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_trainer_epoch_loop_saves_best(tmp_path, rng):
    cfg = TrainConfig(lr=1e-3, epochs=2, its_per_epoch=2)
    model = SegNetViT(
        SegNetViTConfig(descriptor_dim=16, hidden_dim=16, output_dim=32,
                        n_class=4, n_layers=1, num_heads=2)
    )
    batch = _tiny_batch(rng, b=4, n=16, d=16, c=4)
    tr = Trainer(model, cfg, batch, save_dir=str(tmp_path / "run"))
    tr.train(lambda epoch: iter([batch, batch]))
    assert int(tr.state.epoch) == 2
    assert (tmp_path / "run" / "best").exists()
    assert (tmp_path / "run" / "epoch_0001").exists()
