"""Explicit tensor parallelism over the mesh 'model' axis (shard_map).

An extension beyond reference parity (the reference is DP-only,
SURVEY.md §2.3 / train.py:64-108). `shard_params_for_model_axis`
(parallel/mesh.py) places column shards and lets GSPMD propagate; this
module is the *explicit* formulation: a `shard_map` forward where every
device computes its own attention heads and its own slice of the
segmentation head, with exactly one `psum` per transformer layer (the
output projection) and two for the head (distributed LayerNorm stats +
the logit contraction). The collective schedule is therefore known —
and asserted from compiled HLO in tests/test_model_axis.py — rather
than left to the partitioner.

Sharding layout (SegNetViT, nets/segnetvit.py:109-203 semantics):

- `gnn_i/qkv` kernel ``[D, 3*hidden]``: column-sharded. The fused-qkv
  output layout is head-major (``reshape(b, n, h, hd, 3)``,
  models/common.py:304), so contiguous column groups ARE whole heads —
  each device holds ``h / msize`` heads and runs rotary + masked
  attention on them locally with no communication.
- `gnn_i/proj` kernel ``[hidden, hidden]``: row-sharded; the matmul
  emits partial sums -> one ``psum`` -> replicated bias add.
- MLP (`mlp_0/ln/3`): replicated. At recognition scale (feat 256,
  hidden 512) the MLP is minutes of FLOPs per device-second; sharding
  it would trade one more collective per layer for nothing. The big
  memory object TP exists for is the seg head.
- `seg_0` kernel ``[hidden, output_dim]``: column-sharded;
  `seg_ln` scale/bias: sharded with it; LayerNorm statistics over the
  full ``output_dim`` are computed distributively (local sum/sumsq,
  ONE psum of the stacked pair).
- `seg_3` kernel ``[output_dim, n_class]``: row-sharded; partial
  logits -> psum -> bias.

This is the memory win the docstring of shard_params_for_model_axis
promises: an Aachen-scale (or city-scale) seg head's ``[hidden,
output_dim]`` + ``[output_dim, n_class]`` matrices live ``1/msize`` per
device, as do all attention projections.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pram_tpu.models.segnetvit import SegNetViTConfig


def _spec_for(path: str) -> P:
    """PartitionSpec for one SegNetViT parameter, by flax path."""
    if "/qkv/" in path or "/seg_0/" in path:
        if path.endswith("kernel"):
            return P(None, "model")
        return P("model")  # bias
    if "/seg_ln/" in path:
        return P("model")
    if ("/proj/" in path or "/seg_3/" in path) and path.endswith("kernel"):
        return P("model", None)
    return P()


def segnetvit_tp_specs(variables, msize: int):
    """Spec pytree (same structure as ``variables``) for the TP layout."""

    def keystr(kp):
        return "/" + "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    del msize  # layout is divisibility-checked at build time
    return jax.tree_util.tree_map_with_path(
        lambda kp, x: _spec_for(keystr(kp)), variables
    )


def place_segnetvit_tp(mesh: Mesh, variables):
    """Device-put ``variables`` onto ``mesh`` in the TP layout."""
    specs = segnetvit_tp_specs(variables, mesh.shape["model"])
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables,
        specs,
    )


def make_tp_segnetvit_fn(mesh: Mesh, config: SegNetViTConfig, variables):
    """Build the shard_map TP forward: ``fn(variables, d, nk, mask) ->
    logits`` (un-jitted, so callers can jit / lower / inspect HLO).

    The forward math mirrors the XLA attention path of
    models/common.py:302-367 head-for-head — the per-device computation
    IS that path restricted to local heads.
    """
    cfg = config
    assert not cfg.with_sc, "TP forward covers the seg head (with_sc off)"
    msize = mesh.shape["model"]
    h, hd = cfg.num_heads, cfg.hidden_dim // cfg.num_heads
    assert h % msize == 0, f"num_heads {h} not divisible by model={msize}"
    assert cfg.output_dim % msize == 0
    h_loc = h // msize
    scale = hd**-0.5
    eps = 1e-6  # nn.LayerNorm default

    specs = segnetvit_tp_specs(variables, msize)

    def fwd(v, descs, nk, m):
        p = v["params"]
        b, n, _ = descs.shape

        # rotary encoding (replicated; nets/segnetvit.py:26-40)
        proj = nk @ p["kenc"]["Wr"]["kernel"]
        cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)[:, None]  # [B,1,N,hd]
        sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)[:, None]

        def rot_half(t):
            tp = t.reshape(*t.shape[:-1], -1, 2)
            return jnp.stack([-tp[..., 1], tp[..., 0]], axis=-1).reshape(
                t.shape
            )

        x = descs @ p["input_proj"]["kernel"] + p["input_proj"]["bias"]

        for i in range(cfg.n_layers):
            g = p[f"gnn_{i}"]
            qkv = x @ g["qkv"]["kernel"] + g["qkv"]["bias"]  # local heads
            qkv = jnp.moveaxis(
                qkv.reshape(b, n, h_loc, hd, 3), 2, 1
            )  # [B, h_loc, N, hd, 3]
            q, k, vv = qkv[..., 0], qkv[..., 1], qkv[..., 2]
            q = q * cos + rot_half(q) * sin
            k = k * cos + rot_half(k) * sin
            logits = (
                jnp.einsum(
                    "bhid,bhjd->bhij", q, k,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            logits = jnp.where(m[:, None, None, :], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
            msg = jnp.einsum(
                "bhij,bhjd->bhid", attn, vv,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            msg = jnp.moveaxis(msg, 1, 2).reshape(b, n, h_loc * hd)
            # row-sharded output projection: partial -> ONE psum/layer
            msg = (
                jax.lax.psum(msg @ g["proj"]["kernel"], "model")
                + g["proj"]["bias"]
            )
            y = jnp.concatenate([x, msg], axis=-1)
            y = y @ g["mlp_0"]["kernel"] + g["mlp_0"]["bias"]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - mu * mu
            y = (y - mu) * jax.lax.rsqrt(var + eps)
            y = y * g["mlp_ln"]["scale"] + g["mlp_ln"]["bias"]
            y = jax.nn.gelu(y, approximate=False)
            x = x + (y @ g["mlp_3"]["kernel"] + g["mlp_3"]["bias"])

        # seg head: column-sharded seg_0, distributed LN, row-sharded seg_3
        y = x @ p["seg_0"]["kernel"] + p["seg_0"]["bias"]  # [B,N,out_loc]
        stats = jnp.stack(
            [jnp.sum(y, axis=-1), jnp.sum(jnp.square(y), axis=-1)], -1
        )
        stats = jax.lax.psum(stats, "model")  # ONE psum for both moments
        mu = stats[..., 0:1] / cfg.output_dim
        var = stats[..., 1:2] / cfg.output_dim - mu * mu
        y = (y - mu) * jax.lax.rsqrt(var + eps)
        y = y * p["seg_ln"]["scale"] + p["seg_ln"]["bias"]
        y = jax.nn.gelu(y, approximate=False)
        logits = (
            jax.lax.psum(y @ p["seg_3"]["kernel"], "model")
            + p["seg_3"]["bias"]
        )
        return logits

    return jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(specs, P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )


def tp_segnetvit_forward(
    mesh: Mesh,
    config: SegNetViTConfig,
    variables,
    descriptors: jax.Array,  # [B, N, D]
    norm_keypoints: jax.Array,  # [B, N, 2]
    mask: Optional[jax.Array] = None,  # [B, N] bool
) -> jax.Array:
    """Tensor+data-parallel SegNetViT logits, equal to the replicated
    ``model.apply(...)["prediction"]`` (pinned in tests/test_model_axis.py).

    Places ``variables`` in the TP layout (no-op if already placed), then
    runs the shard_map forward under jit: batch over 'data', parameters
    over 'model'.
    """
    if mask is None:
        mask = jnp.ones(descriptors.shape[:2], bool)
    variables = place_segnetvit_tp(mesh, variables)
    fn = make_tp_segnetvit_fn(mesh, config, variables)
    return jax.jit(fn)(variables, descriptors, norm_keypoints, mask)


def make_sp_segnetvit_fn(mesh: Mesh, config: SegNetViTConfig):
    """Sequence-parallel SegNetViT forward over a mesh 'seq' axis.

    The long-context extension SURVEY.md §5 documents (the reference has
    none — it *reduces* tokens instead, nets/adagml.py:344-374): tokens
    shard over 'seq', parameters replicate. Each device projects qkv for
    its token block, applies rotary locally, then ONE all-gather per
    layer delivers the stacked (k, v) of all blocks; attention runs local
    queries x full keys, and the MLP + seg head are token-local (zero
    further communication). Collective cost: n_layers all-gathers of
    [B_loc, N, 2*hidden] — asserted from compiled HLO in
    tests/test_model_axis.py.

    Returns ``fn(variables, descs, nk, mask) -> logits`` (un-jitted);
    token count must divide the 'seq' axis size.
    """
    cfg = config
    assert not cfg.with_sc
    h, hd = cfg.num_heads, cfg.hidden_dim // cfg.num_heads
    scale = hd**-0.5
    eps = 1e-6

    def fwd(v, descs, nk, m_full):
        p = v["params"]
        b, n_loc, _ = descs.shape

        proj = nk @ p["kenc"]["Wr"]["kernel"]  # local tokens only
        cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)[:, None]
        sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)[:, None]

        def rot_half(t):
            tp = t.reshape(*t.shape[:-1], -1, 2)
            return jnp.stack([-tp[..., 1], tp[..., 0]], axis=-1).reshape(
                t.shape
            )

        x = descs @ p["input_proj"]["kernel"] + p["input_proj"]["bias"]

        for i in range(cfg.n_layers):
            g = p[f"gnn_{i}"]
            qkv = x @ g["qkv"]["kernel"] + g["qkv"]["bias"]
            qkv = jnp.moveaxis(qkv.reshape(b, n_loc, h, hd, 3), 2, 1)
            q, k, vv = qkv[..., 0], qkv[..., 1], qkv[..., 2]
            q = q * cos + rot_half(q) * sin
            k = k * cos + rot_half(k) * sin  # rotary BEFORE the gather
            kv = jnp.concatenate([k, vv], axis=-1)  # one gather, not two
            kv_full = jax.lax.all_gather(
                kv, "seq", axis=2, tiled=True
            )  # [B, h, N, 2hd]
            k_full, v_full = kv_full[..., :hd], kv_full[..., hd:]
            logits = (
                jnp.einsum(
                    "bhid,bhjd->bhij", q, k_full,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            logits = jnp.where(m_full[:, None, None, :], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1).astype(v_full.dtype)
            msg = jnp.einsum(
                "bhij,bhjd->bhid", attn, v_full,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            msg = jnp.moveaxis(msg, 1, 2).reshape(b, n_loc, cfg.hidden_dim)
            msg = msg @ g["proj"]["kernel"] + g["proj"]["bias"]
            y = jnp.concatenate([x, msg], axis=-1)
            y = y @ g["mlp_0"]["kernel"] + g["mlp_0"]["bias"]
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - mu * mu
            y = (y - mu) * jax.lax.rsqrt(var + eps)
            y = y * g["mlp_ln"]["scale"] + g["mlp_ln"]["bias"]
            y = jax.nn.gelu(y, approximate=False)
            x = x + (y @ g["mlp_3"]["kernel"] + g["mlp_3"]["bias"])

        y = x @ p["seg_0"]["kernel"] + p["seg_0"]["bias"]
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - mu * mu
        y = (y - mu) * jax.lax.rsqrt(var + eps)
        y = y * p["seg_ln"]["scale"] + p["seg_ln"]["bias"]
        y = jax.nn.gelu(y, approximate=False)
        return y @ p["seg_3"]["kernel"] + p["seg_3"]["bias"]

    return jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(
            P(),  # parameters replicated
            P("data", "seq", None),
            P("data", "seq", None),
            P("data"),  # full key mask on every seq shard
        ),
        out_specs=P("data", "seq", None),
        check_vma=False,
    )


def sp_segnetvit_forward(
    mesh: Mesh,
    config: SegNetViTConfig,
    variables,
    descriptors: jax.Array,
    norm_keypoints: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Sequence+data-parallel logits, equal to the replicated forward."""
    if mask is None:
        mask = jnp.ones(descriptors.shape[:2], bool)
    fn = make_sp_segnetvit_fn(mesh, config)
    return jax.jit(fn)(variables, descriptors, norm_keypoints, mask)
