"""Parallelism family demo: every sharding mode, pinned + HLO-counted.

Runs each shard_map forward of parallel/tp.py on a virtual 8-device CPU
mesh, checks it equals the replicated model, and prints the collective
schedule counted from the compiled HLO — the dp/tp/sp/pp evidence table
in one command (the same assertions live in tests/test_model_axis.py).

Usage: python scripts/exp_parallel.py  (no TPU needed)
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pram_tpu.models.gml import GML, GMLConfig
from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
from pram_tpu.parallel.tp import (
    make_pp_segnetvit_fn,
    make_sp_gml_fn,
    make_sp_segnetvit_fn,
    make_tp_segnetvit_fn,
    make_tp_sp_segnetvit_fn,
    place_segnetvit_tp,
    segnetvit_tp_specs,
    stack_segnetvit_layers,
)


def counts(hlo):
    return {
        "all-reduce": hlo.count(" all-reduce("),
        "all-gather": hlo.count(" all-gather("),
        "collective-permute": hlo.count(" collective-permute("),
    }


def report(name, got, ref, hlo, tol=2e-5):
    ok = np.allclose(np.asarray(got), np.asarray(ref), rtol=tol, atol=tol)
    c = counts(hlo)
    line = ", ".join(f"{k}={v}" for k, v in c.items() if v)
    print(f"{name:28s} equal={ok}  {line or 'no collectives'}")
    assert ok, name


def main():
    rng = np.random.RandomState(0)
    devs = np.asarray(jax.devices()[:8])

    cfg = SegNetViTConfig(
        descriptor_dim=64, hidden_dim=64, output_dim=128, n_class=17,
        n_layers=2, num_heads=4,
    )
    model = SegNetViT(cfg)
    b, n = 8, 64
    d = jnp.asarray(rng.randn(b, n, 64).astype(np.float32))
    k = jnp.asarray((rng.rand(b, n, 2) * 2 - 1).astype(np.float32))
    m = jnp.asarray(rng.rand(b, n) > 0.1)
    v = model.init(jax.random.PRNGKey(0), d, k, m)
    ref = jax.jit(lambda v: model.apply(v, d, k, m)["prediction"])(v)

    def run(fn, *args):
        """Compile once; execute and count collectives on the SAME
        executable."""
        compiled = fn.lower(*args).compile()
        return compiled(*args), compiled.as_text()

    # dp: batch sharded, no collectives in the forward
    mesh_dp = Mesh(devs, axis_names=("data",))
    db = jax.device_put(d, NamedSharding(mesh_dp, P("data")))
    fn = jax.jit(lambda v, d_, k_, m_: model.apply(v, d_, k_, m_)["prediction"])
    got, hlo = run(fn, v, db, k, m)
    report("dp (batch-sharded)", got, ref, hlo)

    # tp: heads + seg head over 'model'
    mesh_tp = Mesh(devs.reshape(2, 4), axis_names=("data", "model"))
    placed = place_segnetvit_tp(mesh_tp, v)
    ftp = jax.jit(make_tp_segnetvit_fn(mesh_tp, cfg, v))
    got, hlo = run(ftp, placed, d, k, m)
    report("tp (head/seg-sharded)", got, ref, hlo, tol=2e-4)

    # sp: tokens over 'seq'
    mesh_sp = Mesh(devs.reshape(2, 4), axis_names=("data", "seq"))
    fsp = jax.jit(make_sp_segnetvit_fn(mesh_sp, cfg))
    got, hlo = run(fsp, v, d, k, m)
    report("sp (token-sharded)", got, ref, hlo, tol=2e-4)

    # tp x sp composed on a 3-axis mesh
    mesh3 = Mesh(devs.reshape(2, 2, 2), axis_names=("data", "seq", "model"))
    sp3 = segnetvit_tp_specs(v, 2)
    placed3 = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh3, s)), v, sp3
    )
    f3 = jax.jit(make_tp_sp_segnetvit_fn(mesh3, cfg, v))
    got, hlo = run(f3, placed3, d, k, m)
    report("tp x sp (3-axis)", got, ref, hlo, tol=2e-4)

    # pp: GPipe stages over 'pipe'
    mesh_pp = Mesh(devs.reshape(2, 4)[:, :2].reshape(2, 2),
                   axis_names=("data", "pipe"))
    stacked, io = stack_segnetvit_layers(v, cfg.n_layers)
    fpp = jax.jit(make_pp_segnetvit_fn(mesh_pp, cfg, 2))
    got, hlo = run(fpp, stacked, io, d, k, m)
    report("pp (GPipe 2 stages)", got, ref, hlo, tol=2e-4)

    # sp for the matcher (GML + row-sharded Sinkhorn)
    gcfg = GMLConfig(descriptor_dim=32, hidden_dim=64, num_heads=2,
                     n_layers=2, sinkhorn_iterations=8)
    gm = GML(gcfg)
    n0, n1 = 64, 48
    g0 = jnp.asarray(rng.randn(2, n0, 32).astype(np.float32))
    g1 = jnp.asarray(rng.randn(2, n1, 32).astype(np.float32))
    gk0 = jnp.asarray((rng.rand(2, n0, 2) * 2 - 1).astype(np.float32))
    gk1 = jnp.asarray((rng.rand(2, n1, 2) * 2 - 1).astype(np.float32))
    gv = gm.init(jax.random.PRNGKey(1), g0, g1, gk0, gk1)
    gref = jax.jit(lambda v: gm.apply(v, g0, g1, gk0, gk1)["plan"])(gv)
    fgm = jax.jit(make_sp_gml_fn(mesh_sp, gcfg))
    m0 = jnp.ones((2, n0), bool)
    m1 = jnp.ones((2, n1), bool)
    (rows, dust), hlo = run(fgm, gv, g0, g1, gk0, gk1, m0, m1)
    got = jnp.concatenate([rows, dust[:, None, :]], axis=1)
    report("sp matcher (GML+Sinkhorn)", got, gref, hlo, tol=5e-5)

    # sp for the ADAPTIVE matcher (full AdaGML stack; pruning = mask
    # updates, so stop layers and pruned masks must be exactly equal)
    from pram_tpu.models.adagml import AdaGML, AdaGMLConfig
    from pram_tpu.parallel.tp import make_sp_adagml_fn

    acfg = AdaGMLConfig(descriptor_dim=32, hidden_dim=64, num_heads=2,
                        n_layers=3, sinkhorn_iterations=8, n_min_tokens=8)
    am = AdaGML(acfg)
    am0 = jnp.asarray(rng.rand(2, n0) > 0.1)
    am1 = jnp.asarray(rng.rand(2, n1) > 0.1)
    av = am.init(jax.random.PRNGKey(2), g0, g1, gk0, gk1, am0, am1)
    aref = jax.jit(lambda v: am.apply(v, g0, g1, gk0, gk1, am0, am1))(av)
    fam = jax.jit(make_sp_adagml_fn(mesh_sp, acfg))
    (rows, dust, stop, fm0, fm1), hlo = run(
        fam, av, g0, g1, gk0, gk1, am0, am1
    )
    got = jnp.concatenate([rows, dust[:, None, :]], axis=1)
    assert bool(jnp.all(stop == aref["stop_layer"]))
    assert bool(jnp.all(fm0 == aref["mask0"]))
    assert bool(jnp.all(fm1 == aref["mask1"]))
    report("sp adaptive (AdaGML)", got, aref["plan"], hlo, tol=5e-5)

    print("ALL PARALLEL MODES OK")


if __name__ == "__main__":
    main()
