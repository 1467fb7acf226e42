"""Pallas backward kernel for the fused residual concat-MLP (training).

ops/train_vjp.py's default MLP backward recomputes the XLA reference and
autodiffs it: correct, but the [B, N, 2D] f32 hidden tensors (pre-LN
activations, normalized activations, gelu outputs and each of their
cotangents) all round-trip HBM between the three matmuls — after the
attention backward kernel (ops/attention_bwd_pallas.py) removes the
[B, H, N, N] traffic, these hiddens are the recognizer/matcher backward's
remaining HBM traffic (VERDICT r4 #7 / ROUND_NOTES r4 lever 3).

This kernel recomputes the forward hidden chain per token tile in VMEM
from (x, pm) and runs the whole backward without materializing any
[N, 2D] tensor in HBM:

  recompute:  h  = x w0x + pm w0m + b0;   ĥ = (h-μ)/σ;   hn = ĥ g + β
  backward:   dy   = ct w3ᵀ
              dz   = dy · (Φ(hn) + hn φ(hn))          (exact-gelu grad)
              dĥ   = dz g
              dh   = (dĥ - mean(dĥ) - ĥ mean(dĥ·ĥ)) / σ
              dx   = ct + dh w0xᵀ          dpm = dh w0mᵀ
  weight grads accumulate in f32 VMEM across the whole (batch, tile)
  grid:       dw3 += yᵀ ct    dw0x += xᵀ dh    dw0m += pmᵀ dh
              db3 += Σ ct     db0  += Σ dh     dγ += Σ dz·ĥ   dβ += Σ dz

The msg projection (pm = msg wp + bp) stays in XLA on both sides, exactly
like the qkv projection in the attention backward: one recompute matmul
forward, roofline matmuls for dmsg/dwp — the win here is the HBM traffic
of the MLP interior, not the projections.

Default ON since the r5 chip validation (with the attention backward:
17.263 steps/s vs 11.375 XLA baseline, on-chip grad parity 0.9% with
trained weights); PRAM_MLP_BWD=0 restores the autodiff backward, parity
pinned in tests/test_train_vjp.py.
Reference being beaten: torch autograd through the MLP tail of
nets/segnetvit.py:99-106 / nets/gml.py:130-139.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pram_tpu.ops.mlp_pallas import _erf

_VMEM_BUDGET = 14 << 20

# test escape, same pattern as ops/attention_bwd_pallas.py
_INTERPRET = False

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _vmem_estimate(nt: int, d: int, dh: int, itemsize: int) -> int:
    """Per-program VMEM: x/pm/ct/dx/dpm blocks + 3 weight mats at the
    compute dtype + f32 weight-grad accumulators + the f32 hidden-chain
    scratch (~6 live [nt, dh] tensors)."""
    blocks = 5 * nt * d * itemsize
    weights = 3 * d * dh * itemsize
    accums = 3 * d * dh * 4
    scratch = 24 * nt * dh + 8 * nt * d
    return blocks + weights + accums + scratch


def _pick_nt(n: int, d: int, dh: int, itemsize: int):
    for nt in (n, 1024, 512, 256, 128):
        if (
            nt <= n
            and n % nt == 0
            and nt % 8 == 0
            and _vmem_estimate(nt, d, dh, itemsize) <= _VMEM_BUDGET
        ):
            return nt
    return None


def mlp_bwd_supported(n: int, d: int, dh: int, itemsize: int) -> bool:
    """Gate for ops/train_vjp.py: False -> autodiff-XLA backward."""
    if d % 128 != 0 or dh % 128 != 0:
        return False
    return _pick_nt(n, d, dh, itemsize) is not None


def _mlp_bwd_kernel(
    x_ref, pm_ref, ct_ref,
    w0x_ref, w0m_ref, b0_ref, g_ref, be_ref, w3_ref,
    dx_ref, dpm_ref,
    dw0x_ref, dw0m_ref, db0_ref, dg_ref, dbe_ref, dw3_ref, db3_ref,
    *, eps,
):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        for ref in (
            dw0x_ref, dw0m_ref, db0_ref, dg_ref, dbe_ref, dw3_ref, db3_ref
        ):
            ref[:, :] = jnp.zeros(ref.shape, ref.dtype)

    x = x_ref[0]  # [nt, d] compute dtype
    pm = pm_ref[0]
    ct = ct_ref[0]
    dtype = x.dtype
    g = g_ref[:, :]  # [1, dh] f32
    ctf = ct.astype(jnp.float32)

    # ---- forward recompute (identical math to mlp_pallas._mlp_kernel)
    h = (
        jnp.dot(x, w0x_ref[:, :], preferred_element_type=jnp.float32)
        + jnp.dot(pm, w0m_ref[:, :], preferred_element_type=jnp.float32)
        + b0_ref[:, :]
    )  # [nt, dh] f32
    mu = jnp.mean(h, axis=-1, keepdims=True)
    hc = h - mu
    var = jnp.mean(hc * hc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)  # [nt, 1]
    hhat = hc * r
    z = hhat * g + be_ref[:, :]  # = hn

    phi = jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI
    big_phi = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
    y = (z * big_phi).astype(dtype)  # fwd casts y before the out matmul

    # ---- backward
    dy = jax.lax.dot_general(
        ct, w3_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [nt, dh] f32
    dz = dy * (big_phi + z * phi)

    dg_ref[:, :] += jnp.sum(dz * hhat, axis=0, keepdims=True)
    dbe_ref[:, :] += jnp.sum(dz, axis=0, keepdims=True)

    dhhat = dz * g
    m1 = jnp.mean(dhhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dhhat * hhat, axis=-1, keepdims=True)
    dh = (dhhat - m1 - hhat * m2) * r  # [nt, dh] f32

    db0_ref[:, :] += jnp.sum(dh, axis=0, keepdims=True)
    dhc = dh.astype(dtype)
    dw0x_ref[:, :] += jax.lax.dot_general(
        x, dhc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw0m_ref[:, :] += jax.lax.dot_general(
        pm, dhc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw3_ref[:, :] += jax.lax.dot_general(
        y, ct, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db3_ref[:, :] += jnp.sum(ctf, axis=0, keepdims=True)

    dx = ctf + jax.lax.dot_general(
        dhc, w0x_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpm = jax.lax.dot_general(
        dhc, w0m_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[0] = dx.astype(dtype)
    dpm_ref[0] = dpm.astype(dtype)


def fused_residual_mlp_bwd(
    x: jax.Array,  # [B, N, D]
    pm: jax.Array,  # [B, N, D] projected messages (recomputed by caller)
    w0: jax.Array, b0: jax.Array,  # mlp_0 [2D, DH], [DH]
    ln_scale: jax.Array, ln_bias: jax.Array,  # [DH]
    w3: jax.Array,  # mlp_3 [DH, D]
    ct: jax.Array,  # [B, N, D] cotangent of the residual output
    *,
    eps: float = 1e-6,
    interpret: bool = False,
):
    """Backward of the residual MLP tail w.r.t. (x, pm, w0, b0, γ, β, w3, b3).

    Returns (dx, dpm ``[B, N, D]`` compute dtype; dw0x, dw0m ``[D, DH]``,
    db0, dγ, dβ ``[DH]``, dw3 ``[DH, D]``, db3 ``[D]`` — all f32,
    accumulated over batch and token tiles). ``dx`` includes the residual
    cotangent; the caller maps dpm back through the msg projection.
    """
    interpret = interpret or _INTERPRET
    b, n, d = x.shape
    dh = w0.shape[-1]
    f32 = jnp.float32
    nt = _pick_nt(n, d, dh, x.dtype.itemsize)
    if nt is None:
        raise ValueError(
            f"fused_residual_mlp_bwd: no token tile of n={n} (d={d}, "
            f"dh={dh}) fits the VMEM budget — gate with mlp_bwd_supported()"
        )
    w0x, w0m = w0[:d], w0[d:]

    def spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda i, j, nd=nd: (i, j) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM,
        )

    def wspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i, j, nd=nd: (0,) * nd, memory_space=pltpu.VMEM
        )

    outs = pl.pallas_call(
        partial(_mlp_bwd_kernel, eps=eps),
        grid=(b, n // nt),
        in_specs=[
            spec(nt, d), spec(nt, d), spec(nt, d),
            wspec(d, dh), wspec(d, dh), wspec(1, dh),
            wspec(1, dh), wspec(1, dh),
            wspec(dh, d),
        ],
        out_specs=[
            spec(nt, d), spec(nt, d),
            wspec(d, dh), wspec(d, dh), wspec(1, dh),
            wspec(1, dh), wspec(1, dh),
            wspec(dh, d), wspec(1, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((d, dh), f32),
            jax.ShapeDtypeStruct((d, dh), f32),
            jax.ShapeDtypeStruct((1, dh), f32),
            jax.ShapeDtypeStruct((1, dh), f32),
            jax.ShapeDtypeStruct((1, dh), f32),
            jax.ShapeDtypeStruct((dh, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ],
        interpret=interpret,
    )(
        x, pm, ct,
        w0x.astype(x.dtype), w0m.astype(x.dtype), b0[None].astype(f32),
        ln_scale[None].astype(f32), ln_bias[None].astype(f32),
        w3.astype(x.dtype),
    )
    dx, dpm, dw0x, dw0m, db0, dg, dbe, dw3, db3 = outs
    return (
        dx, dpm, dw0x, dw0m, db0[0], dg[0], dbe[0], dw3, db3[0]
    )
