"""Collective-traffic accounting for the row-sharded map engine (VERDICT #9).

Compiles the sharded localization step at the Aachen shape on the 8-device
virtual mesh and counts the collective ops/bytes XLA actually emitted
(all-gather / reduce-scatter / all-reduce) from the optimized HLO — the
dist_take formulation's gather traffic per step, independent of wall clock.

Run: python scripts/exp_dist_take.py  (spawns itself with a CPU mesh)
"""

import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1,
    "f16": 2, "s64": 8, "u64": 8, "s16": 2, "u16": 2,
}


def _shape_bytes(shape_str):
    """'f32[8,128,3]' -> byte count."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def count_collectives(hlo_text):
    out = {}
    for kind in ("all-gather", "reduce-scatter", "all-reduce",
                 "collective-permute", "all-to-all"):
        ops = 0
        nbytes = 0
        for line in hlo_text.splitlines():
            ls = line.strip()
            m = re.match(rf"(?:ROOT )?%?[\w.\-]+ = ([^=]+) {kind}\(", ls)
            if m:
                ops += 1
                shapes = re.findall(r"\w+\[[\d,]*\]", m.group(1))
                nbytes += sum(_shape_bytes(s) for s in shapes)
        if ops:
            out[kind] = {"ops": ops, "mb": round(nbytes / 2**20, 2)}
    return out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pram_tpu.engine.localizer import LocConfig, Localizer
    from pram_tpu.engine.matching import make_nn_match_fn
    from pram_tpu.geometry.camera import Camera
    from pram_tpu.maps.device import to_device
    from pram_tpu.maps.sharded import shard_map_tables
    from pram_tpu.maps.synthetic import make_synthetic_scene

    rng = np.random.RandomState(0)
    # Aachen shape drivers: 512 landmarks, 2048-kpt VRF frames, 4096-kpt
    # queries (smaller point cloud than the real thing; traffic scales with
    # the GATHERED working set, which is at full scale here)
    scene = make_synthetic_scene(
        rng, n_cluster=512, points_per_cluster=8, n_ref_frames=24,
        desc_dim=128, width=1024, height=768,
        max_kp_per_frame=2048, max_ref_points=4096,
    )
    dmap = to_device(scene.map)
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    smap = shard_map_tables(dmap, mesh)
    cfg = LocConfig(seg_k=1, min_inliers=32, threshold=8.0,
                    num_hypotheses=64)
    loc = Localizer(smap, make_nn_match_fn(), cfg)

    b, n, c = 8, 4096, scene.map.n_class
    cam = Camera(
        jnp.broadcast_to(
            jnp.asarray([900.0, 900.0, 512.0, 384.0, 0, 0, 0, 0]), (b, 8)
        ),
        jnp.broadcast_to(jnp.asarray([1024.0, 768.0]), (b, 2)),
    )
    args = (
        jax.random.PRNGKey(0), cam,
        jnp.zeros((b, n, 2)), jnp.zeros((b, n)),
        jnp.zeros((b, n, 128), jnp.bfloat16), jnp.ones((b, n), bool),
        jnp.zeros((b, n, c)),
    )
    lowered = jax.jit(lambda *a: loc._step(*a)).lower(*args)
    hlo = lowered.compile().as_text()
    coll = count_collectives(hlo)

    # per-frame gathered working set (what dist_take must deliver)
    k = smap.frame_point_idx.shape[-1] if hasattr(
        smap, "frame_point_idx") else 2048
    per_frame_mb = (
        k * (4 + 8 + 4 + 4) + k * (12 + 2 * 128 + 4)  # tables + points
    ) / 2**20
    print(
        json.dumps(
            {
                "metric": "sharded_map_collectives_per_step",
                "mesh_devices": 8,
                "batch": b,
                "collectives": coll,
                "gathered_working_set_mb_per_frame": round(per_frame_mb, 2),
                "note": "bytes from the optimized HLO of loc._step at the "
                "Aachen shape (4096-kpt queries, 2048-kpt VRFs, nc513)",
            }
        )
    )


if __name__ == "__main__":
    if "--_worker" not in sys.argv:
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
                cwd=REPO, env=env,
            )
        )
    main()
