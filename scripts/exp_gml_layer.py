"""Decompose one GML layer's cost: projections vs attention vs MLP kernels.

Also A/B the Sinkhorn kernel's VPU-reduce vs MXU-matvec inner loop.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
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

    from pram_tpu.ops.attention_pallas import (
        fused_cross_attention_packed,
        fused_self_attention_qkv,
    )
    from pram_tpu.ops.mlp_pallas import fused_residual_mlp

    rng = np.random.RandomState(0)
    b, n0, n1, d = 32, 512, 1024, 256
    nt = n0 + n1
    dt = jnp.bfloat16

    x = jnp.asarray(rng.rand(b, nt, d), dt)
    qkv_w = jnp.asarray(rng.randn(d, 3 * d) * 0.05, dt)
    qkv = jnp.asarray(rng.rand(b, nt, 3 * d), dt)
    cos = jnp.asarray(rng.rand(b, nt, 64), jnp.float32)
    sin = jnp.asarray(rng.rand(b, nt, 64), jnp.float32)
    bias = jnp.zeros((b, nt), jnp.float32)
    scale = 64.0**-0.5

    # 1. the qkv projection alone (XLA matmul)
    projj = jax.jit(lambda x: x @ qkv_w)
    print(f"qkv proj [1536x256x768]: {timeit(projj, x):7.3f} ms/b{b}", flush=True)

    # 2. self-attention kernel alone (both sides, as GML calls it)
    def attn(qkv):
        m0 = fused_self_attention_qkv(
            qkv[:, :n0], cos[:, :n0], sin[:, :n0], bias[:, :n0], scale, 4
        )
        m1 = fused_self_attention_qkv(
            qkv[:, n0:], cos[:, n0:], sin[:, n0:], bias[:, n0:], scale, 4
        )
        return m0, m1

    attnj = jax.jit(attn)
    print(f"self-attn kernels      : {timeit(attnj, qkv):7.3f} ms/b{b}", flush=True)

    # 3. cross-attention kernel alone
    qk = jnp.asarray(rng.rand(b, nt, d), dt)
    v = jnp.asarray(rng.rand(b, nt, d), dt)
    crossj = jax.jit(
        lambda qk, v: fused_cross_attention_packed(
            qk[:, :n0], qk[:, n0:], v[:, :n0], v[:, n0:],
            bias[:, :n0], bias[:, n0:], scale, 4,
        )
    )
    print(f"cross-attn kernel      : {timeit(crossj, qk, v):7.3f} ms/b{b}", flush=True)

    # 4. residual-MLP kernel alone
    msg = jnp.asarray(rng.rand(b, nt, d), dt)
    wp = jnp.asarray(rng.randn(d, d) * 0.05, jnp.float32)
    bp = jnp.zeros((d,), jnp.float32)
    w0 = jnp.asarray(rng.randn(2 * d, 2 * d) * 0.05, jnp.float32)
    b0 = jnp.zeros((2 * d,), jnp.float32)
    g = jnp.ones((2 * d,), jnp.float32)
    be = jnp.zeros((2 * d,), jnp.float32)
    w3 = jnp.asarray(rng.randn(2 * d, d) * 0.05, jnp.float32)
    b3 = jnp.zeros((d,), jnp.float32)
    mlpj = jax.jit(
        lambda x, m: fused_residual_mlp(x, m, wp, bp, w0, b0, g, be, w3, b3)
    )
    print(f"residual-MLP kernel    : {timeit(mlpj, x, msg):7.3f} ms/b{b}", flush=True)

    # 5. XLA equivalent of the residual MLP (for comparison)
    def mlp_xla(x, m):
        pm = (m @ wp.astype(dt)) + bp.astype(dt)
        y = jnp.concatenate([x, pm], axis=-1)
        h = (y @ w0.astype(dt)).astype(jnp.float32) + b0
        mu = jnp.mean(h, axis=-1, keepdims=True)
        hc = h - mu
        var = jnp.mean(hc * hc, axis=-1, keepdims=True)
        hn = (hc * jax.lax.rsqrt(var + 1e-6)) * g + be
        z = jax.nn.gelu(hn, approximate=False).astype(dt)
        return x + ((z @ w3.astype(dt)) + b3.astype(dt))

    mlpxj = jax.jit(mlp_xla)
    print(f"residual-MLP XLA       : {timeit(mlpxj, x, msg):7.3f} ms/b{b}", flush=True)

    # 6. sinkhorn A/B
    from pram_tpu.ops.sinkhorn_pallas import sinkhorn_matching_pallas

    sim = jnp.asarray(rng.rand(b, n0, n1).astype(np.float32))
    dustbin = jnp.asarray(1.0)
    m0 = jnp.ones((b, n0), bool)
    m1 = jnp.ones((b, n1), bool)
    skj = jax.jit(
        lambda s: sinkhorn_matching_pallas(s, dustbin, 20, m0, m1)
    )
    print(f"sinkhorn (current)     : {timeit(skj, sim):7.3f} ms/b{b}", flush=True)


if __name__ == "__main__":
    main()
