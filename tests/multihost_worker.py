"""Worker process for the multi-host (2-process) distributed test.

Run as: python tests/multihost_worker.py <rank> <port> <tmpdir>
Env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2

Exercises the non-trivial branch of parallel/mesh.py:initialize_distributed
(the reference's equivalent surface is train.py:64-68, which only ever ran
single-host): two processes x two virtual CPU devices form a 4-device global
mesh; each process feeds its own half of the global batch (the per-host
loader sharding that replaces DistributedSampler), and one DP train step
must agree with the single-process full-batch reference computed by the
parent (written to <tmpdir>/reference.npz).
"""

import json
import os
import sys

import numpy as np

# python puts the script's dir (tests/) on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank = int(sys.argv[1])
    port = int(sys.argv[2])
    tmpdir = sys.argv[3]

    import jax

    from pram_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=rank,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp

    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
    from pram_tpu.train.trainer import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    data = np.load(os.path.join(tmpdir, "batch.npz"))
    ref = np.load(os.path.join(tmpdir, "reference.npz"))
    b = data["seg_descriptors"].shape[0]
    half = b // 2

    cfg = TrainConfig(batch_size=b)
    model = SegNetViT(
        SegNetViTConfig(
            descriptor_dim=16, hidden_dim=32, output_dim=32, n_class=9,
            n_layers=2, num_heads=2,
        )
    )

    # identical deterministic init on every process (replicated params)
    host_batch = {
        k: jnp.asarray(data[k]) for k in
        ("seg_descriptors", "norm_keypoints", "gt_seg", "mask")
    }
    state = init_train_state(model, cfg, host_batch)

    mesh = make_mesh()  # ('data',) over all 4 global devices
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    # per-host loader sharding: this process only materializes ITS half of
    # the global batch (rows [rank*half, (rank+1)*half))
    local = {
        k: np.asarray(data[k])[rank * half : (rank + 1) * half]
        for k in ("seg_descriptors", "norm_keypoints", "gt_seg", "mask")
    }
    global_batch = {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local.items()
    }
    for v in global_batch.values():
        assert v.shape[0] == b  # global shape spans both hosts

    step = make_train_step(model, cfg, mesh=mesh)
    state, metrics = step(state, global_batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, float(ref["loss"]), rtol=1e-5)

    # updated params (replicated) must match the single-process step
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(
        np.asarray(leaf.addressable_data(0)),
        ref["leaf0"],
        rtol=1e-5,
        atol=1e-6,
    )

    with open(os.path.join(tmpdir, f"ok_{rank}.json"), "w") as f:
        json.dump({"rank": rank, "loss": loss}, f)
    print(f"WORKER {rank} OK loss={loss}")


if __name__ == "__main__":
    main()
