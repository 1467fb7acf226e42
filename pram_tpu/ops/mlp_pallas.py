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


def _quant_rows(a):
    """Per-row symmetric int8: returns (s8 values, f32 [N,1] row scales).

    Row-dynamic activation quantization (the standard transformer-inference
    scheme): exact s32 accumulation on the MXU at 2x the bf16 rate, error
    bounded per token by its own magnitude.
    """
    af = a.astype(jnp.float32)
    rs = jnp.maximum(jnp.max(jnp.abs(af), -1, keepdims=True), 1e-6) / 127.0
    q = jnp.round(af * (1.0 / rs)).astype(jnp.int8)
    return q, rs


def _mlp_kernel_i8(
    x_ref, m_ref, wp_ref, wps_ref, bp_ref,
    w0x_ref, w0m_ref, w0s_ref, b0_ref,
    g_ref, be_ref, w3_ref, w3s_ref, b3_ref, o_ref, *, eps,
):
    """Int8 variant of _mlp_kernel: per-row dynamic activation scales,
    per-output-column weight scales (computed at trace time outside),
    s8xs8->s32 MXU matmuls, f32 dequantize into the same LN/gelu tail."""
    x = x_ref[0]  # [N, D]
    m = m_ref[0]

    mq, mrs = _quant_rows(m)
    pm = (
        jax.lax.dot_general(
            mq, wp_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * mrs * wps_ref[:, :]
        + bp_ref[:, :]
    ).astype(x.dtype)

    xq, xrs = _quant_rows(x)
    pmq, pmrs = _quant_rows(pm)
    h = (
        jax.lax.dot_general(
            xq, w0x_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * xrs
        + jax.lax.dot_general(
            pmq, w0m_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * pmrs
    ) * w0s_ref[:, :] + b0_ref[:, :]  # [N, 2D] f32

    mu = jnp.mean(h, axis=-1, keepdims=True)
    hc = h - mu
    var = jnp.mean(hc * hc, axis=-1, keepdims=True)
    hn = hc * jax.lax.rsqrt(var + eps)
    hn = hn * g_ref[:, :] + be_ref[:, :]
    y = hn * 0.5 * (1.0 + _erf(hn * (1.0 / jnp.sqrt(2.0)).astype(hn.dtype)))

    yq, yrs = _quant_rows(y)
    out = (
        jax.lax.dot_general(
            yq, w3_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * yrs * w3s_ref[:, :]
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


def _quant_cols(w):
    """Per-output-column symmetric int8 weights: (s8 [K,N], f32 [1,N])."""
    wf = w.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(wf), 0, keepdims=True), 1e-6) / 127.0
    return jnp.round(wf / ws).astype(jnp.int8), ws


def fused_residual_mlp_int8(
    x: jax.Array,  # [B, N, D]
    msg: jax.Array,  # [B, N, D] pre-proj attention messages
    wp: jax.Array, bp: jax.Array,
    w0: jax.Array, b0: jax.Array,
    ln_scale: jax.Array, ln_bias: jax.Array,
    w3: jax.Array, b3: jax.Array,
    *,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """Int8 inference variant of fused_residual_mlp.

    Weights are quantized per output column at trace level (one VPU pass
    per step over each weight matrix, amortized across the batch);
    activations are quantized per row inside the kernel. The three matmuls
    run s8xs8->s32 on the MXU at 2x the bf16 rate; LN/gelu stay f32.
    Forward-only (no VJP) — enable for inference via
    models/common.py:int8_mlp_enabled, never under differentiation.
    """
    b, n, d = x.shape
    dh = w0.shape[-1]
    f32 = jnp.float32
    nt = _pick_nt_i8(n, d, dh, x.dtype.itemsize)
    if nt is None:
        raise ValueError(
            f"fused_residual_mlp_int8: no 32-aligned token tile of n={n} "
            f"(d={d}, dh={dh}) fits — gate with fused_mlp_int8_supported()"
        )
    wpq, wps = _quant_cols(wp)
    w0q, w0s = _quant_cols(w0)
    w3q, w3s = _quant_cols(w3)

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
        partial(_mlp_kernel_i8, eps=eps),
        grid=(b, n // nt),
        in_specs=[
            spec(nt, d), spec(nt, d),
            wspec(d, d), wspec(1, d), wspec(1, d),
            wspec(d, dh), wspec(d, dh), wspec(1, dh), wspec(1, dh),
            wspec(1, dh), wspec(1, dh),
            wspec(dh, d), wspec(1, d), wspec(1, d),
        ],
        out_specs=spec(nt, d),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=interpret,
    )(
        x, msg,
        wpq, wps, bp[None].astype(f32),
        w0q[:d], w0q[d:], w0s, b0[None].astype(f32),
        ln_scale[None].astype(f32), ln_bias[None].astype(f32),
        w3q, w3s, b3[None].astype(f32),
    )


def _pick_nt_i8(n: int, d: int, dh: int, itemsize: int):
    """Like _pick_nt but budgeting the int8 kernel's extra VMEM (s8 copies
    of the four quantized activations, ~nt*(3d+dh) bytes) and requiring
    32-aligned tiles (s8 sublane tiling)."""
    for nt in (n, 1024, 512, 256, 128):
        if (
            nt <= n
            and n % nt == 0
            and nt % 32 == 0
            and _vmem_estimate(nt, d, dh, itemsize) + nt * (3 * d + dh)
            <= _VMEM_BUDGET
        ):
            return nt
    return None


def fused_mlp_int8_supported(n: int, d: int, dh: int, itemsize: int) -> bool:
    return _pick_nt_i8(n, d, dh, itemsize) is not None
