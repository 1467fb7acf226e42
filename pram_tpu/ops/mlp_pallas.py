"""Fused residual concat-MLP kernel (Pallas, TPU).

Every attention block in the matcher/recognition transformers ends with
    y = x + mlp_3(gelu(LN(mlp_0(concat[x, proj(msg)]))))
(reference nets/segnetvit.py:99-106 / nets/gml.py:130-139). In XLA this is
three matmuls separated by a f32 LayerNorm and an exact (erf) gelu — each
boundary a fusion break with an HBM round trip of the [B, N, 512] hidden
tensor. This kernel runs the whole tail per batch element in VMEM: the
concat never materializes (mlp_0 is split into its x-half and msg-half and
the halves' partial products are summed), LayerNorm reduces over lanes in
f32, and only y leaves the chip.

Matmul shapes are all lane-exact for hidden_dim=256 (K/N in {256, 512}),
so the MXU sees only useful FLOPs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 erf approximation (|err| <= 1.5e-7).

    Mosaic has no erf lowering; at bf16/f32 output resolution this is
    indistinguishable from the exact gelu the reference uses
    (nn.GELU(approximate='none')).
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _mlp_kernel(
    x_ref, m_ref, wp_ref, bp_ref, w0x_ref, w0m_ref, b0_ref,
    g_ref, be_ref, w3_ref, b3_ref, o_ref, *, eps,
):
    x = x_ref[0]  # [N, D]
    m = m_ref[0]  # [N, D] raw attention messages

    # proj(msg)
    pm = (
        jnp.dot(m, wp_ref[:, :], preferred_element_type=jnp.float32)
        + bp_ref[:, :]
    ).astype(x.dtype)

    # mlp_0(concat[x, pm]) without materializing the concat
    h = (
        jnp.dot(x, w0x_ref[:, :], preferred_element_type=jnp.float32)
        + jnp.dot(pm, w0m_ref[:, :], preferred_element_type=jnp.float32)
        + b0_ref[:, :]
    )  # [N, 2D] f32

    # LayerNorm over features (f32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    hc = h - mu
    var = jnp.mean(hc * hc, axis=-1, keepdims=True)
    hn = hc * jax.lax.rsqrt(var + eps)
    hn = hn * g_ref[:, :] + be_ref[:, :]

    # gelu via the erf approximation, then the output projection
    y = hn * 0.5 * (1.0 + _erf(hn * (1.0 / jnp.sqrt(2.0)).astype(hn.dtype)))
    y = y.astype(x.dtype)
    out = (
        jnp.dot(y, w3_ref[:, :], preferred_element_type=jnp.float32)
        + b3_ref[:, :]
    ).astype(x.dtype)
    o_ref[0] = x + out


_VMEM_BUDGET = 14 << 20  # headroom under Mosaic's 16 MB scoped-vmem limit


def _vmem_estimate(nt: int, d: int, dh: int, itemsize: int) -> int:
    """Per-program VMEM bytes: in/out blocks + weights at the compute dtype
    plus the f32 scratch Mosaic stacks for proj/hidden/gelu. Calibrated on
    the measured 16.61 MB f32 OOM at (nt=1536, d=256, dh=512)."""
    io_w = (3 * nt * d + d * d + 3 * d * dh) * itemsize
    scratch = 8 * nt * (d + dh)
    return io_w + scratch


def _pick_nt(n: int, d: int, dh: int, itemsize: int):
    """Largest token tile that fits VMEM (fewer, bigger programs measured
    ~3x faster than 512-tiles at GML's 1536-token bf16 stream)."""
    for nt in (n, 1024, 512, 256, 128):
        if (
            nt <= n
            and n % nt == 0
            and _vmem_estimate(nt, d, dh, itemsize) <= _VMEM_BUDGET
        ):
            return nt
    return None


def fused_mlp_supported(n: int, d: int, dh: int, itemsize: int) -> bool:
    """Gate for call sites: False -> take the XLA MLP path (e.g. f32
    training traces at token counts whose tiles exceed the VMEM budget)."""
    return _pick_nt(n, d, dh, itemsize) is not None


def fused_residual_mlp(
    x: jax.Array,  # [B, N, D]
    msg: jax.Array,  # [B, N, D] pre-proj attention messages
    wp: jax.Array, bp: jax.Array,  # proj [D, D], [D]
    w0: jax.Array, b0: jax.Array,  # mlp_0 [2D, 2D'], [2D']
    ln_scale: jax.Array, ln_bias: jax.Array,  # [2D']
    w3: jax.Array, b3: jax.Array,  # mlp_3 [2D', D]
    *,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """x + mlp_3(gelu(LN(mlp_0([x, proj(msg)])))) fused per batch element."""
    b, n, d = x.shape
    dh = w0.shape[-1]
    f32 = jnp.float32
    w0x, w0m = w0[:d], w0[d:]
    nt = _pick_nt(n, d, dh, x.dtype.itemsize)
    if nt is None:
        raise ValueError(
            f"fused_residual_mlp: no token tile of n={n} (d={d}, dh={dh}, "
            f"itemsize={x.dtype.itemsize}) fits the VMEM budget — gate call "
            "sites with fused_mlp_supported()"
        )

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

    return pl.pallas_call(
        partial(_mlp_kernel, eps=eps),
        grid=(b, n // nt),
        in_specs=[
            spec(nt, d), spec(nt, d),
            wspec(d, d), wspec(1, d),
            wspec(d, dh), wspec(d, dh), wspec(1, dh),
            wspec(1, dh), wspec(1, dh),
            wspec(dh, d), wspec(1, d),
        ],
        out_specs=spec(nt, d),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=interpret,
    )(
        x, msg,
        wp.astype(x.dtype), bp[None].astype(f32),
        w0x.astype(x.dtype), w0m.astype(x.dtype), b0[None].astype(f32),
        ln_scale[None].astype(f32), ln_bias[None].astype(f32),
        w3.astype(x.dtype), b3[None].astype(f32),
    )
