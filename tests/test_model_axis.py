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
