"""Multi-host distributed init exercised in simulation (VERDICT r2 #8).

Two subprocesses (2 virtual CPU devices each) form a 4-device global mesh
through parallel/mesh.py:initialize_distributed — the branch the reference
never runs (train.py:64-68 hardcodes single-host). Each process feeds its
own half of the global batch; one DP train step must agree with a
single-process full-batch step bit-for-near (same math, different device
topology).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_matches_single(tmp_path):
    import jax
    import jax.numpy as jnp

    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
    from pram_tpu.train.trainer import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    b, n = 4, 32
    rng = np.random.RandomState(0)
    batch_np = {
        "seg_descriptors": rng.randn(b, n, 16).astype(np.float32),
        "norm_keypoints": (rng.rand(b, n, 2) * 2 - 1).astype(np.float32),
        "gt_seg": rng.randint(0, 9, (b, n)).astype(np.int32),
        "mask": np.ones((b, n), bool),
    }
    np.savez(tmp_path / "batch.npz", **batch_np)

    # single-process full-batch reference
    cfg = TrainConfig(batch_size=b)
    model = SegNetViT(
        SegNetViTConfig(
            descriptor_dim=16, hidden_dim=32, output_dim=32, n_class=9,
            n_layers=2, num_heads=2,
        )
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = init_train_state(model, cfg, batch)
    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    leaf0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.savez(
        tmp_path / "reference.npz",
        loss=float(metrics["loss"]),
        leaf0=leaf0,
    )

    port = _free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), str(port), str(tmp_path)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {r} failed:\n{out[-3000:]}"
        assert f"WORKER {r} OK" in out
    assert (tmp_path / "ok_0.json").exists()
    assert (tmp_path / "ok_1.json").exists()
