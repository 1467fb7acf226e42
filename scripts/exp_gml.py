"""Decompose GML's per-stage cost on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from flax import linen as nn

    from pram_tpu.models.common import (
        CrossAttentionBlock, LearnableFourierPE, SelfAttentionBlock,
    )
    from pram_tpu.models.gml import GML, GMLConfig
    from pram_tpu.ops.sinkhorn_pallas import sinkhorn_matching_pallas

    rng = np.random.RandomState(0)
    b, n0, n1, d = 32, 512, 1024, 256
    dt = jnp.bfloat16

    def cast(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)

    x0 = jnp.asarray(rng.rand(b, n0, d), dt)
    x1 = jnp.asarray(rng.rand(b, n1, d), dt)
    m0 = jnp.ones((b, n0), bool)
    m1 = jnp.ones((b, n1), bool)
    k0 = jnp.asarray(rng.rand(b, n0, 2), jnp.float32)
    k1 = jnp.asarray(rng.rand(b, n1, 2), jnp.float32)

    pe = LearnableFourierPE(f_dim=64)
    pvars = cast(pe.init(jax.random.PRNGKey(0), k0))
    enc0 = jax.jit(lambda k: pe.apply(pvars, k))(k0)
    enc1 = jax.jit(lambda k: pe.apply(pvars, k))(k1)

    sa = SelfAttentionBlock(feat_dim=d, hidden_dim=d, num_heads=4)
    svars = cast(sa.init(jax.random.PRNGKey(1), x1, None, m1))
    saj = jax.jit(lambda x, e, m: sa.apply(svars, x, e, m))
    print(f"self-block 1024 (1L)  : {timeit(saj, x1, enc1, m1):7.2f} ms/b{b}")
    saj0 = jax.jit(lambda x, e, m: sa.apply(svars, x, e, m))
    print(f"self-block 512 (1L)   : {timeit(saj0, x0, enc0, m0):7.2f} ms/b{b}")

    ca = CrossAttentionBlock(feat_dim=d, hidden_dim=d, num_heads=4)
    cvars = cast(ca.init(jax.random.PRNGKey(2), x0, x1, m0, m1))
    caj = jax.jit(lambda a, c, ma, mb: ca.apply(cvars, a, c, ma, mb))
    print(f"cross-block (1L)      : {timeit(caj, x0, x1, m0, m1):7.2f} ms/b{b}")

    sim = jnp.asarray(rng.rand(b, n0, n1).astype(np.float32))
    dustbin = jnp.asarray(1.0)
    skj = jax.jit(lambda s: sinkhorn_matching_pallas(s, dustbin, 20, m0, m1))
    print(f"sinkhorn pallas (20it): {timeit(skj, sim):7.2f} ms/b{b}")

    for nl in (1, 9):
        gml = GML(GMLConfig(n_layers=nl, use_pallas_sinkhorn=True))
        da = jnp.asarray(rng.rand(b, n0, 128), dt)
        db = jnp.asarray(rng.rand(b, n1, 128), dt)
        gvars = cast(gml.init(jax.random.PRNGKey(3), da[:1, :8], db[:1, :8],
                              k0[:1, :8], k1[:1, :8]))
        gj = jax.jit(lambda a, c, x, y: gml.apply(gvars, a, c, x, y)["plan"])
        print(f"gml full ({nl}L)        : {timeit(gj, da, db, k0, k1):7.2f} ms/b{b}")


if __name__ == "__main__":
    main()
