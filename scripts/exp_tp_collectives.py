"""Collective-traffic accounting for the explicit TP forward (parallel/tp.py).

Compiles the shard_map tensor-parallel SegNetViT at the Aachen head scale
(nc513, output_dim 1024, 15 layers, 4096 tokens) on the 8-device virtual
mesh (data=2 x model=4) and counts the collective ops/bytes XLA emitted
from the optimized HLO — the known TP schedule (one psum per layer at the
output projection + two for the seg head), priced in MB/step so the ICI
cost is arguable from bandwidth, not vibes. Companion to
exp_dist_take.py's accounting for the row-sharded map.

Run: python scripts/exp_tp_collectives.py  (spawns itself with a CPU mesh)
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from exp_dist_take import count_collectives
    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
    from pram_tpu.parallel.mesh import make_mesh
    from pram_tpu.parallel.tp import (
        make_tp_segnetvit_fn,
        place_segnetvit_tp,
    )

    cfg = SegNetViTConfig(n_class=513)  # 15L, hidden 256, out 1024
    model = SegNetViT(cfg)
    mesh = make_mesh(data=2, model=4)
    b, n = 2, 4096
    rng = np.random.RandomState(0)
    descs = jnp.asarray(rng.randn(1, 8, 256).astype(np.float32))
    nk = jnp.asarray((rng.rand(1, 8, 2) * 2 - 1).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), descs, nk, jnp.ones((1, 8), bool)
    )
    placed = place_segnetvit_tp(mesh, variables)
    fn = make_tp_segnetvit_fn(mesh, cfg, placed)

    args = (
        placed,
        jnp.zeros((b, n, 256), jnp.float32),
        jnp.zeros((b, n, 2), jnp.float32),
        jnp.ones((b, n), bool),
    )
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    coll = count_collectives(hlo)

    # expected: per device-local batch frame, n_layers psums of
    # [b_loc, N, hidden] f32 + seg stats [b_loc, N, 2] + logits
    # [b_loc, N, n_class]
    b_loc = b // mesh.shape["data"]
    expected_mb = (
        cfg.n_layers * b_loc * n * cfg.hidden_dim
        + b_loc * n * 2
        + b_loc * n * cfg.n_class
    ) * 4 / 2**20
    print(
        json.dumps(
            {
                "metric": "tp_forward_collectives_per_step",
                "mesh": {"data": 2, "model": 4},
                "batch": b,
                "tokens": n,
                "collectives": coll,
                "expected_allreduce_mb": round(expected_mb, 2),
                "note": "optimized HLO of the shard_map TP SegNetViT "
                "(nc513 / out 1024 / 15L / 4096 tokens); schedule is "
                "n_layers+2 psums by construction (parallel/tp.py)",
            }
        )
    )


if __name__ == "__main__":
    if "--_worker" not in sys.argv:
        import subprocess

        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        sys.exit(
            subprocess.call(
                [sys.executable, os.path.abspath(__file__), "--_worker"],
                cwd=os.path.join(REPO, "scripts"), env=env,
            )
        )
    main()
