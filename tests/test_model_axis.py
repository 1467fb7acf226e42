"""Tensor-parallel 'model' axis extension: sharded params, equal outputs.

The reference is DP-only (SURVEY.md §2.3); the ('data', 'model') mesh with
column-sharded kernels is this framework's documented extension for
recognition heads too large to replicate. These tests pin that a SegNetViT
forward with parameters sharded over the model axis equals the replicated
forward, with the batch simultaneously sharded over 'data'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig
from pram_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params_for_model_axis,
)


def test_model_axis_forward_matches_replicated(rng):
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}

    model = SegNetViT(
        SegNetViTConfig(
            descriptor_dim=64, hidden_dim=64, output_dim=128, n_class=17,
            n_layers=2, num_heads=2,
        )
    )
    b, n = 4, 64
    descs = jnp.asarray(rng.randn(b, n, 64).astype(np.float32))
    nk = jnp.asarray((rng.rand(b, n, 2) * 2 - 1).astype(np.float32))
    mask = jnp.ones((b, n), bool)
    variables = model.init(jax.random.PRNGKey(0), descs, nk, mask)

    fwd = jax.jit(
        lambda v, d, k, m: model.apply(v, d, k, m)["prediction"]
    )
    ref = fwd(variables, descs, nk, mask)

    vsh = shard_params_for_model_axis(mesh, variables, min_size=1024)
    # at least one kernel actually ended up column-sharded
    shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda x: len({s.device for s in x.addressable_shards}), vsh
        )
    )
    assert max(shardings) == 8
    batch = shard_batch(mesh, {"d": descs, "k": nk, "m": mask})
    got = fwd(vsh, batch["d"], batch["k"], batch["m"])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_shard_map_tp_matches_replicated(rng):
    """Explicit TP (parallel/tp.py): head-sharded attention + sharded seg
    head under shard_map equals the replicated forward, with the known
    collective schedule (one psum per layer + two for the head)."""
    from jax.sharding import PartitionSpec as P

    from pram_tpu.parallel.tp import (
        make_tp_segnetvit_fn,
        place_segnetvit_tp,
        segnetvit_tp_specs,
        tp_segnetvit_forward,
    )

    mesh = make_mesh(data=2, model=4)
    cfg = SegNetViTConfig(
        descriptor_dim=64, hidden_dim=64, output_dim=128, n_class=17,
        n_layers=2, num_heads=4,
    )
    model = SegNetViT(cfg)
    b, n = 4, 64
    descs = jnp.asarray(rng.randn(b, n, 64).astype(np.float32))
    nk = jnp.asarray((rng.rand(b, n, 2) * 2 - 1).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.1)
    variables = model.init(jax.random.PRNGKey(0), descs, nk, mask)

    ref = jax.jit(
        lambda v, d, k, m: model.apply(v, d, k, m)["prediction"]
    )(variables, descs, nk, mask)

    got = tp_segnetvit_forward(mesh, cfg, variables, descs, nk, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    # parameters actually live 1/msize per device on the sharded tables
    placed = place_segnetvit_tp(mesh, variables)
    qkv = placed["params"]["gnn_0"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape == (64, 64 * 3 // 4)
    seg0 = placed["params"]["seg_0"]["kernel"]
    assert seg0.addressable_shards[0].data.shape == (64, 128 // 4)

    # collective accounting from compiled HLO: the schedule is the
    # documented one (n_layers + 2 psums -> all-reduces), and nothing
    # all-gathers a weight table behind our back
    fn = make_tp_segnetvit_fn(mesh, cfg, placed)
    hlo = jax.jit(fn).lower(placed, descs, nk, mask).compile().as_text()
    n_allreduce = hlo.count(" all-reduce(")
    assert n_allreduce <= cfg.n_layers + 2, hlo[:2000]
    assert " all-gather(" not in hlo

    # spec tree covers every param (structure match = zip succeeded)
    specs = segnetvit_tp_specs(variables, 4)
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: isinstance(s, P), specs)
    )
    assert all(flat)


def test_shard_map_tp_gradients_match_replicated(rng):
    """TP is trainable: grads of a scalar loss through the shard_map
    forward equal the replicated model's grads (psum backward handled by
    shard_map's partial-value semantics), so the sharded seg head can be
    TRAINED sharded, not just served."""
    from pram_tpu.parallel.tp import (
        make_tp_segnetvit_fn,
        place_segnetvit_tp,
    )

    mesh = make_mesh(data=2, model=2)
    cfg = SegNetViTConfig(
        descriptor_dim=32, hidden_dim=32, output_dim=64, n_class=9,
        n_layers=1, num_heads=2,
    )
    model = SegNetViT(cfg)
    b, n = 4, 32
    descs = jnp.asarray(rng.randn(b, n, 32).astype(np.float32))
    nk = jnp.asarray((rng.rand(b, n, 2) * 2 - 1).astype(np.float32))
    mask = jnp.ones((b, n), bool)
    variables = model.init(jax.random.PRNGKey(0), descs, nk, mask)
    tgt = jnp.asarray(rng.randn(b, n, 9).astype(np.float32))

    def ref_loss(v):
        out = model.apply(v, descs, nk, mask)["prediction"]
        return jnp.mean((out - tgt) ** 2)

    g_ref = jax.jit(jax.grad(ref_loss))(variables)

    placed = place_segnetvit_tp(mesh, variables)
    fn = make_tp_segnetvit_fn(mesh, cfg, placed)

    def tp_loss(v):
        return jnp.mean((fn(v, descs, nk, mask) - tgt) ** 2)

    g_tp = jax.jit(jax.grad(tp_loss))(placed)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_tp = dict(jax.tree_util.tree_leaves_with_path(g_tp))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_tp[path]), np.asarray(leaf),
            rtol=2e-4, atol=2e-5,
            err_msg=str(path),
        )


def test_trainer_model_axis_sharded_state(rng):
    """DP+TP training: params AND Adam moments stay model-axis-sharded
    through the real train step, and the loss trajectory matches the
    replicated DP step."""
    from pram_tpu.parallel.tp import segnetvit_tp_specs
    from pram_tpu.train.trainer import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    mesh = make_mesh(data=2, model=4)
    cfg = TrainConfig(batch_size=4)
    model = SegNetViT(
        SegNetViTConfig(
            descriptor_dim=64, hidden_dim=64, output_dim=128, n_class=17,
            n_layers=2, num_heads=4,
        )
    )
    b, n = 4, 64
    batch = {
        "seg_descriptors": jnp.asarray(
            rng.randn(b, n, 64).astype(np.float32)
        ),
        "norm_keypoints": jnp.asarray(
            (rng.rand(b, n, 2) * 2 - 1).astype(np.float32)
        ),
        "gt_seg": jnp.asarray(rng.randint(0, 17, (b, n))),
        "mask": jnp.ones((b, n), bool),
    }

    # replicated-DP reference trajectory
    state_r = init_train_state(model, cfg, batch)
    step_r = make_train_step(model, cfg, mesh=mesh, donate=False)
    losses_r = []
    for _ in range(3):
        state_r, m = step_r(state_r, batch)
        losses_r.append(float(m["loss"]))

    specs = segnetvit_tp_specs(
        init_train_state(model, cfg, batch).params, mesh.shape["model"]
    )
    state = init_train_state(
        model, cfg, batch, mesh=mesh, param_specs=specs
    )
    # Adam moments inherited the model-axis sharding
    mu_seg0 = state.opt_state[0].mu["seg_0"]["kernel"]
    assert mu_seg0.addressable_shards[0].data.shape == (64, 128 // 4)

    step = make_train_step(
        model, cfg, mesh=mesh, donate=False, sharded_params=True
    )
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, losses_r, rtol=1e-5)

    # params are STILL sharded after stepping (no silent re-replication)
    p_seg0 = state.params["seg_0"]["kernel"]
    assert p_seg0.addressable_shards[0].data.shape == (64, 128 // 4)
    mu_seg0 = state.opt_state[0].mu["seg_0"]["kernel"]
    assert mu_seg0.addressable_shards[0].data.shape == (64, 128 // 4)


def test_trainer_class_sharded_checkpoint(rng, tmp_path):
    """Trainer with param_specs: epoch runs sharded, orbax checkpoint
    round-trips the sharded state (the --tp CLI path, cli/train.py)."""
    from pram_tpu.parallel.tp import segnetvit_tp_specs
    from pram_tpu.train.trainer import TrainConfig, Trainer

    mesh = make_mesh(data=2, model=4)
    cfg = TrainConfig(batch_size=4, epochs=1)
    model = SegNetViT(
        SegNetViTConfig(
            descriptor_dim=32, hidden_dim=32, output_dim=64, n_class=9,
            n_layers=1, num_heads=4,
        )
    )
    b, n = 4, 32
    batch = {
        "seg_descriptors": jnp.asarray(
            rng.randn(b, n, 32).astype(np.float32)
        ),
        "norm_keypoints": jnp.asarray(
            (rng.rand(b, n, 2) * 2 - 1).astype(np.float32)
        ),
        "gt_seg": jnp.asarray(rng.randint(0, 9, (b, n))),
        "mask": jnp.ones((b, n), bool),
    }
    specs = segnetvit_tp_specs(
        jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            batch["seg_descriptors"], batch["norm_keypoints"],
            batch["mask"],
        )["params"],
        4,
    )
    tr = Trainer(
        model, cfg, batch, save_dir=str(tmp_path / "run"), mesh=mesh,
        param_specs=specs, log_fn=lambda s: None,
    )
    tr.train(lambda epoch: iter([batch, batch]))
    p = tr.state.params["seg_0"]["kernel"]
    assert p.addressable_shards[0].data.shape == (32, 64 // 4)

    tr2 = Trainer(
        model, cfg, batch, save_dir=str(tmp_path / "run"), mesh=mesh,
        param_specs=specs, log_fn=lambda s: None,
    )
    tr2.restore_checkpoint(str(tmp_path / "run" / "best"))
    p2 = tr2.state.params["seg_0"]["kernel"]
    assert p2.addressable_shards[0].data.shape == (32, 64 // 4)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p))


def test_sequence_parallel_matches_replicated(rng):
    """SP (parallel/tp.py:make_sp_segnetvit_fn): tokens sharded over
    'seq', one KV all-gather per layer, equal to the replicated forward
    with the documented collective schedule."""
    from jax.sharding import Mesh

    from pram_tpu.parallel.tp import make_sp_segnetvit_fn

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, axis_names=("data", "seq"))
    cfg = SegNetViTConfig(
        descriptor_dim=64, hidden_dim=64, output_dim=128, n_class=17,
        n_layers=2, num_heads=2,
    )
    model = SegNetViT(cfg)
    b, n = 4, 64
    descs = jnp.asarray(rng.randn(b, n, 64).astype(np.float32))
    nk = jnp.asarray((rng.rand(b, n, 2) * 2 - 1).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.1)
    variables = model.init(jax.random.PRNGKey(0), descs, nk, mask)

    ref = jax.jit(
        lambda v, d, k, m: model.apply(v, d, k, m)["prediction"]
    )(variables, descs, nk, mask)

    fn = make_sp_segnetvit_fn(mesh, cfg)
    got = jax.jit(fn)(variables, descs, nk, mask)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    # collective accounting: exactly n_layers all-gathers, no all-reduce
    hlo = jax.jit(fn).lower(variables, descs, nk, mask).compile().as_text()
    assert hlo.count(" all-gather(") == cfg.n_layers, hlo[:2000]
    assert " all-reduce(" not in hlo


def test_tp_checkpoint_reshards_across_mesh_shapes(rng, tmp_path):
    """A TP checkpoint saved from a model=2 mesh restores onto a model=4
    mesh (orbax reshards to the target's shardings) with equal values —
    the elastic-resharding story for changing pod topologies."""
    from pram_tpu.parallel.tp import segnetvit_tp_specs
    from pram_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(batch_size=4, epochs=1)
    model = SegNetViT(
        SegNetViTConfig(
            descriptor_dim=32, hidden_dim=32, output_dim=64, n_class=9,
            n_layers=1, num_heads=4,
        )
    )
    b, n = 4, 32
    batch = {
        "seg_descriptors": jnp.asarray(
            rng.randn(b, n, 32).astype(np.float32)
        ),
        "norm_keypoints": jnp.asarray(
            (rng.rand(b, n, 2) * 2 - 1).astype(np.float32)
        ),
        "gt_seg": jnp.asarray(rng.randint(0, 9, (b, n))),
        "mask": jnp.ones((b, n), bool),
    }
    abs_params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        batch["seg_descriptors"], batch["norm_keypoints"], batch["mask"],
    )["params"]

    mesh2 = make_mesh(data=4, model=2)
    tr = Trainer(
        model, cfg, batch, save_dir=str(tmp_path / "run"), mesh=mesh2,
        param_specs=segnetvit_tp_specs(abs_params, 2),
        log_fn=lambda s: None,
    )
    tr.train(lambda epoch: iter([batch]))
    saved = np.asarray(tr.state.params["seg_0"]["kernel"])

    mesh4 = make_mesh(data=2, model=4)
    tr4 = Trainer(
        model, cfg, batch, save_dir=str(tmp_path / "other"), mesh=mesh4,
        param_specs=segnetvit_tp_specs(abs_params, 4),
        log_fn=lambda s: None,
    )
    tr4.restore_checkpoint(str(tmp_path / "run" / "best"))
    p4 = tr4.state.params["seg_0"]["kernel"]
    assert p4.addressable_shards[0].data.shape == (32, 64 // 4)
    np.testing.assert_allclose(np.asarray(p4), saved)


def test_sequence_parallel_gml_matches_replicated(rng):
    """SP matcher (parallel/tp.py:make_sp_gml_fn): both token sets
    sharded over 'seq', one gather per attention layer + one psum per
    Sinkhorn iteration, assembled plan equal to the replicated GML."""
    from jax.sharding import Mesh

    from pram_tpu.models.gml import GML, GMLConfig
    from pram_tpu.parallel.tp import make_sp_gml_fn, sp_gml_plan

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, axis_names=("data", "seq"))
    cfg = GMLConfig(
        descriptor_dim=32, hidden_dim=64, num_heads=2, n_layers=2,
        sinkhorn_iterations=8,
    )
    model = GML(cfg)
    b, n0, n1 = 2, 64, 48
    d0 = jnp.asarray(rng.randn(b, n0, 32).astype(np.float32))
    d1 = jnp.asarray(rng.randn(b, n1, 32).astype(np.float32))
    k0 = jnp.asarray((rng.rand(b, n0, 2) * 2 - 1).astype(np.float32))
    k1 = jnp.asarray((rng.rand(b, n1, 2) * 2 - 1).astype(np.float32))
    m0 = jnp.asarray(rng.rand(b, n0) > 0.15)
    m1 = jnp.asarray(rng.rand(b, n1) > 0.15)
    variables = model.init(jax.random.PRNGKey(0), d0, d1, k0, k1, m0, m1)

    ref = jax.jit(
        lambda v: model.apply(v, d0, d1, k0, k1, m0, m1)["plan"]
    )(variables)

    got = sp_gml_plan(mesh, cfg, variables, d0, d1, k0, k1, m0, m1)
    assert got.shape == ref.shape == (b, n0 + 1, n1 + 1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-5, atol=5e-5
    )

    # collective accounting: one gather per self layer + one per cross
    # layer + one for mdesc1; ONE all-reduce (the Sinkhorn column psum,
    # executed num_iters times inside the scan loop)
    fn = jax.jit(make_sp_gml_fn(mesh, cfg))
    hlo = fn.lower(variables, d0, d1, k0, k1, m0, m1).compile().as_text()
    assert hlo.count(" all-gather(") == 2 * cfg.n_layers + 1, hlo[:2000]
    assert hlo.count(" all-reduce(") == 1


def test_tp_sp_composed_matches_replicated(rng):
    """3-axis composition (parallel/tp.py:make_tp_sp_segnetvit_fn):
    batch x tokens x heads sharded simultaneously, equal to the
    replicated forward with the documented collective schedule."""
    from jax.sharding import Mesh, NamedSharding

    from pram_tpu.parallel.tp import (
        make_tp_sp_segnetvit_fn,
        segnetvit_tp_specs,
    )
    from jax.sharding import PartitionSpec as P

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, axis_names=("data", "seq", "model"))
    cfg = SegNetViTConfig(
        descriptor_dim=64, hidden_dim=64, output_dim=128, n_class=17,
        n_layers=2, num_heads=4,
    )
    model = SegNetViT(cfg)
    b, n = 4, 64
    descs = jnp.asarray(rng.randn(b, n, 64).astype(np.float32))
    nk = jnp.asarray((rng.rand(b, n, 2) * 2 - 1).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.1)
    variables = model.init(jax.random.PRNGKey(0), descs, nk, mask)

    ref = jax.jit(
        lambda v, d, k, m: model.apply(v, d, k, m)["prediction"]
    )(variables, descs, nk, mask)

    # place parameters in the TP layout on the 3-axis mesh
    specs = segnetvit_tp_specs(variables, 2)
    placed = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables, specs,
    )
    fn = make_tp_sp_segnetvit_fn(mesh, cfg, variables)
    got = jax.jit(fn)(placed, descs, nk, mask)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    # collective accounting: n_layers 'seq' gathers, n_layers + 2 'model'
    # all-reduces, nothing else
    hlo = jax.jit(fn).lower(placed, descs, nk, mask).compile().as_text()
    assert hlo.count(" all-gather(") == cfg.n_layers, hlo[:2000]
    assert hlo.count(" all-reduce(") <= cfg.n_layers + 2


@pytest.mark.parametrize("psize", [4, 2])
def test_pipeline_parallel_matches_replicated(rng, psize):
    """PP (parallel/tp.py:make_pp_segnetvit_fn): layer stack split into
    'pipe' stages (1 and 2 layers per stage), GPipe microbatch schedule,
    equal to the replicated forward; one ppermute per schedule step +
    one final psum."""
    from jax.sharding import Mesh

    from pram_tpu.parallel.tp import (
        make_pp_segnetvit_fn,
        stack_segnetvit_layers,
    )

    devs = np.asarray(jax.devices()[: 2 * psize]).reshape(2, psize)
    mesh = Mesh(devs, axis_names=("data", "pipe"))
    cfg = SegNetViTConfig(
        descriptor_dim=64, hidden_dim=64, output_dim=128, n_class=17,
        n_layers=4, num_heads=2,
    )
    model = SegNetViT(cfg)
    b, n = 8, 32
    descs = jnp.asarray(rng.randn(b, n, 64).astype(np.float32))
    nk = jnp.asarray((rng.rand(b, n, 2) * 2 - 1).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.1)
    variables = model.init(jax.random.PRNGKey(0), descs, nk, mask)

    ref = jax.jit(
        lambda v, d, k, m: model.apply(v, d, k, m)["prediction"]
    )(variables, descs, nk, mask)

    stacked, io = stack_segnetvit_layers(variables, cfg.n_layers)
    n_micro = 2
    fn = jax.jit(make_pp_segnetvit_fn(mesh, cfg, n_micro))
    got = fn(stacked, io, descs, nk, mask)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    # collective accounting: n_micro + psize - 1 collective-permutes,
    # one all-reduce, no all-gathers
    hlo = fn.lower(stacked, io, descs, nk, mask).compile().as_text()
    assert hlo.count(" collective-permute(") == n_micro + psize - 1, (
        hlo[:2000]
    )
    assert hlo.count(" all-reduce(") == 1
    assert " all-gather(" not in hlo


def test_sp_gml_distributed_match_readout(rng):
    """The distributed mutual-max readout (match_threshold set) equals
    extract_matches of the replicated plan — the [N0, M] plan never
    leaves its row shards."""
    from jax.sharding import Mesh

    from pram_tpu.models.gml import GML, GMLConfig, extract_matches
    from pram_tpu.parallel.tp import make_sp_gml_fn

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, axis_names=("data", "seq"))
    cfg = GMLConfig(
        descriptor_dim=32, hidden_dim=64, num_heads=2, n_layers=2,
        sinkhorn_iterations=8,
    )
    model = GML(cfg)
    b, n0, n1 = 2, 64, 48
    d0 = jnp.asarray(rng.randn(b, n0, 32).astype(np.float32))
    d1 = jnp.asarray(rng.randn(b, n1, 32).astype(np.float32))
    k0 = jnp.asarray((rng.rand(b, n0, 2) * 2 - 1).astype(np.float32))
    k1 = jnp.asarray((rng.rand(b, n1, 2) * 2 - 1).astype(np.float32))
    m0 = jnp.asarray(rng.rand(b, n0) > 0.15)
    m1 = jnp.asarray(rng.rand(b, n1) > 0.15)
    variables = model.init(jax.random.PRNGKey(0), d0, d1, k0, k1, m0, m1)

    plan = jax.jit(
        lambda v: model.apply(v, d0, d1, k0, k1, m0, m1)["plan"]
    )(variables)
    ref = extract_matches(plan, threshold=0.1)

    fn = jax.jit(make_sp_gml_fn(mesh, cfg, match_threshold=0.1))
    got = fn(variables, d0, d1, k0, k1, m0, m1)
    np.testing.assert_array_equal(
        np.asarray(got.matches0), np.asarray(ref.matches0)
    )
    np.testing.assert_array_equal(
        np.asarray(got.matches1), np.asarray(ref.matches1)
    )
    np.testing.assert_allclose(
        np.asarray(got.scores0), np.asarray(ref.scores0),
        rtol=5e-5, atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.scores1), np.asarray(ref.scores1),
        rtol=5e-5, atol=5e-5,
    )


def test_pipeline_parallel_gradients_match_replicated(rng):
    """The GPipe forward is differentiable as-is (ppermute/psum have
    exact transposes): parameter gradients through the staged pipeline
    equal the replicated model's — pp TRAINING, not just inference."""
    from jax.sharding import Mesh

    from pram_tpu.parallel.tp import (
        make_pp_segnetvit_fn,
        stack_segnetvit_layers,
    )

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, axis_names=("data", "pipe"))
    cfg = SegNetViTConfig(
        descriptor_dim=32, hidden_dim=32, output_dim=64, n_class=9,
        n_layers=4, num_heads=2,
    )
    model = SegNetViT(cfg)
    b, n = 8, 16
    descs = jnp.asarray(rng.randn(b, n, 32).astype(np.float32))
    nk = jnp.asarray((rng.rand(b, n, 2) * 2 - 1).astype(np.float32))
    mask = jnp.ones((b, n), bool)
    variables = model.init(jax.random.PRNGKey(0), descs, nk, mask)
    ct = jnp.asarray(rng.randn(b, n, 9).astype(np.float32))

    def ref_loss(v):
        return jnp.sum(model.apply(v, descs, nk, mask)["prediction"] * ct)

    gref = jax.grad(ref_loss)(variables)["params"]

    fn = make_pp_segnetvit_fn(mesh, cfg, n_micro=2)

    def pp_loss(stacked, io):
        return jnp.sum(fn(stacked, io, descs, nk, mask) * ct)

    stacked, io = stack_segnetvit_layers(variables, cfg.n_layers)
    gs, gio = jax.jit(jax.grad(pp_loss, argnums=(0, 1)))(stacked, io)

    # stacked layer grads: compare layer i slice vs replicated gnn_i
    for i in range(cfg.n_layers):
        ref_i = gref[f"gnn_{i}"]
        got_i = jax.tree_util.tree_map(lambda x, i=i: x[i], gs)
        jax.tree_util.tree_map(
            lambda a, bb: np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4
            ),
            got_i, ref_i,
        )
    for key in ("input_proj", "seg_0", "seg_3", "kenc", "seg_ln"):
        jax.tree_util.tree_map(
            lambda a, bb: np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4
            ),
            gio[key], gref[key],
        )


def test_sequence_parallel_gradients_match_replicated(rng):
    """SP forward differentiates exactly too (all_gather transposes to
    reduce-scatter): parameter grads equal the replicated model's."""
    from jax.sharding import Mesh

    from pram_tpu.parallel.tp import make_sp_segnetvit_fn

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, axis_names=("data", "seq"))
    cfg = SegNetViTConfig(
        descriptor_dim=32, hidden_dim=32, output_dim=64, n_class=9,
        n_layers=2, num_heads=2,
    )
    model = SegNetViT(cfg)
    b, n = 4, 32
    descs = jnp.asarray(rng.randn(b, n, 32).astype(np.float32))
    nk = jnp.asarray((rng.rand(b, n, 2) * 2 - 1).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.1)
    variables = model.init(jax.random.PRNGKey(0), descs, nk, mask)
    ct = jnp.asarray(rng.randn(b, n, 9).astype(np.float32))

    gref = jax.grad(
        lambda v: jnp.sum(
            model.apply(v, descs, nk, mask)["prediction"] * ct
        )
    )(variables)
    fn = make_sp_segnetvit_fn(mesh, cfg)
    gsp = jax.jit(
        jax.grad(lambda v: jnp.sum(fn(v, descs, nk, mask) * ct))
    )(variables)
    jax.tree_util.tree_map(
        lambda a, bb: np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4
        ),
        gsp, gref,
    )
