"""Fused refinement NN-gating kernel vs the XLA formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.ops.refine_pallas import refine_nn_pallas, refine_nn_supported


@pytest.fixture
def rng():
    return np.random.RandomState(5)


def _xla_ref(descs, pdesc, kpts, uv, in_img, qmask, gate_r, ratio):
    sim = jnp.einsum("nd,pd->np", descs, pdesc,
                     preferred_element_type=jnp.float32)
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim + 1e-6, 0.0))
    proj_err = jnp.linalg.norm(kpts[:, None, :] - uv[None], axis=-1)
    gate = (proj_err < gate_r) & in_img[None]
    dist = jnp.where(gate, dist, dist + 100.0)
    nn_idx = jnp.argmin(dist, axis=-1)
    d1 = jnp.min(dist, axis=-1)
    cols = jnp.arange(dist.shape[-1])[None, :]
    d2 = jnp.min(jnp.where(cols == nn_idx[:, None], jnp.inf, dist), axis=-1)
    keep = (d1 / jnp.maximum(d2, 1e-9) <= ratio) & (d1 < 100.0) & qmask
    return nn_idx, d1, keep


def _case(rng, n, p):
    d = 64
    descs = rng.randn(n, d).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
    # half the points share query descriptors (real NN structure)
    pdesc = rng.randn(p, d).astype(np.float32)
    pdesc[: n // 2] = descs[: n // 2] + rng.randn(n // 2, d) * 0.05
    pdesc /= np.linalg.norm(pdesc, axis=-1, keepdims=True)
    kpts = (rng.rand(n, 2) * [640, 480]).astype(np.float32)
    uv = (rng.rand(p, 2) * [640, 480]).astype(np.float32)
    uv[: n // 2] = kpts[: n // 2] + rng.randn(n // 2, 2) * 3
    in_img = rng.rand(p) > 0.1
    qmask = rng.rand(n) > 0.1
    return (
        jnp.asarray(descs), jnp.asarray(pdesc), jnp.asarray(kpts),
        jnp.asarray(uv), jnp.asarray(in_img), jnp.asarray(qmask),
    )


@pytest.mark.parametrize("n,p", [(64, 128), (64, 256)])
def test_refine_nn_matches_xla(rng, n, p):
    args = _case(rng, n, p)
    ref_idx, ref_d1, ref_keep = _xla_ref(*args, 16.0, 0.995)
    got_idx, got_d1, got_keep = refine_nn_pallas(
        *args, 16.0, 0.995, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(got_d1), np.asarray(ref_d1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_keep), np.asarray(ref_keep))


def test_refine_nn_point_tiling(rng):
    """Multi-block accumulation path (P > single-tile)."""
    import pram_tpu.ops.refine_pallas as rp

    n, p = 64, 512
    args = _case(rng, n, p)
    ref = _xla_ref(*args, 16.0, 0.995)

    # force 4 blocks of 128
    orig = rp.refine_nn_pallas

    def forced(*a, **kw):
        return orig(*a, **kw)

    import functools as _ft
    # monkey: shrink the single-tile budget so pblk=128
    old_budget = 8 << 20

    # simplest: call the kernel internals with a tiny budget by patching
    # the module constant via a wrapper
    src_pblk = 128
    # re-implement dispatch with forced tiling
    import jax as _jax

    def tiled_call(descs, pdesc, kpts, uv, in_img, qmask, g, r):
        import pram_tpu.ops.refine_pallas as m
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        import functools, jax.numpy as jnp

        nn_, dd_ = descs.shape
        p_ = pdesc.shape[0]
        pblk = src_pblk
        pblocks = p_ // pblk
        qrows = jnp.concatenate(
            [kpts.astype(jnp.float32),
             qmask.astype(jnp.float32)[:, None],
             jnp.zeros((nn_, 5), jnp.float32)], axis=1)
        prows = jnp.stack(
            [uv[:, 0], uv[:, 1], in_img.astype(jnp.float32)]
            + [jnp.zeros((p_,), jnp.float32)] * 5, axis=0)
        sc = jnp.asarray([[g, r, 0, 0]], jnp.float32)
        out = pl.pallas_call(
            functools.partial(m._refine_kernel, pblocks=pblocks, pblk=pblk),
            grid=(1, pblocks),
            in_specs=[
                pl.BlockSpec((1, nn_, dd_), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pblk, dd_), lambda i, j: (0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nn_, 8), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, pblk), lambda i, j: (0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, nn_, 8), lambda i, j: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=_jax.ShapeDtypeStruct((1, nn_, 8), jnp.float32),
            interpret=True,
        )(descs[None], pdesc[None], qrows[None], prows[None], sc)
        row = out[0]
        return row[:, 0].astype(jnp.int32), row[:, 1], row[:, 3] > 0.5

    got = tiled_call(*args, 16.0, 0.995)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))


def test_refine_nn_supported_gate():
    assert refine_nn_supported(512, 2048)
    assert refine_nn_supported(512, 4096)
    assert not refine_nn_supported(7, 2048)
