"""Measure fused Pallas stem vs XLA conv1a+conv1b on the real chip."""

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

    from pram_tpu.ops.stem_pallas import fused_stem, fold_bn

    rng = np.random.RandomState(0)
    b, h, w = 32, 480, 640
    dt = jnp.bfloat16

    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)).astype(dt)
    k1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    bn1 = tuple(
        jnp.asarray(x.astype(np.float32))
        for x in (rng.rand(64) + 0.5, rng.randn(64) * 0.1, rng.randn(64) * 0.1,
                  rng.rand(64) + 0.5)
    )
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    bn2 = tuple(
        jnp.asarray(x.astype(np.float32))
        for x in (rng.rand(64) + 0.5, rng.randn(64) * 0.1, rng.randn(64) * 0.1,
                  rng.rand(64) + 0.5)
    )

    def xla_stem(image):
        k1f, b1f = fold_bn(k1, b1, *bn1)
        k2f, b2f = fold_bn(k2, b2, *bn2)
        a = jax.lax.conv_general_dilated(
            image, k1f.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        a = jnp.maximum(a + b1f.astype(dt), 0)
        o = jax.lax.conv_general_dilated(
            a, k2f.astype(dt), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.maximum(o + b2f.astype(dt), 0)

    xj = jax.jit(xla_stem)
    print(f"xla stem   : {timeit(xj, img):8.2f} ms/b{b}")

    pj = jax.jit(lambda im: fused_stem(im, k1, b1, bn1, k2, b2, bn2))
    print(f"pallas stem: {timeit(pj, img):8.2f} ms/b{b}")

    # correctness on-chip (bf16 tolerance)
    ref = np.asarray(xj(img), np.float32)
    got = np.asarray(pj(img), np.float32)
    err = np.abs(ref - got) / (np.abs(ref) + 1e-2)
    print(f"max rel err: {err.max():.4f}  mean: {err.mean():.6f}")


if __name__ == "__main__":
    main()
