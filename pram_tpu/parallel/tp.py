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


def _rot_half(t):
    """Interleaved-pair rotation (models/common.py:rotate_half)."""
    tp = t.reshape(*t.shape[:-1], -1, 2)
    return jnp.stack([-tp[..., 1], tp[..., 0]], axis=-1).reshape(t.shape)



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

        x = descs @ p["input_proj"]["kernel"] + p["input_proj"]["bias"]

        for i in range(cfg.n_layers):
            g = p[f"gnn_{i}"]
            qkv = x @ g["qkv"]["kernel"] + g["qkv"]["bias"]  # local heads
            qkv = jnp.moveaxis(
                qkv.reshape(b, n, h_loc, hd, 3), 2, 1
            )  # [B, h_loc, N, hd, 3]
            q, k, vv = qkv[..., 0], qkv[..., 1], qkv[..., 2]
            q = q * cos + _rot_half(q) * sin
            k = k * cos + _rot_half(k) * sin
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

        x = descs @ p["input_proj"]["kernel"] + p["input_proj"]["bias"]

        for i in range(cfg.n_layers):
            g = p[f"gnn_{i}"]
            qkv = x @ g["qkv"]["kernel"] + g["qkv"]["bias"]
            qkv = jnp.moveaxis(qkv.reshape(b, n_loc, h, hd, 3), 2, 1)
            q, k, vv = qkv[..., 0], qkv[..., 1], qkv[..., 2]
            q = q * cos + _rot_half(q) * sin
            k = k * cos + _rot_half(k) * sin  # rotary BEFORE the gather
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


def make_tp_sp_segnetvit_fn(mesh: Mesh, config: SegNetViTConfig, variables):
    """Composed 3-axis parallelism: batch over 'data', tokens over 'seq',
    heads + seg head over 'model' — the TP and SP formulations above in
    ONE shard_map.

    Per layer: each device projects qkv for its token block restricted to
    its local heads, applies rotary, and ONE 'seq' all-gather delivers
    the stacked (k, v) of all token blocks — sized 1/msize of the pure-SP
    gather because only local heads ride it. Attention runs local queries
    x full keys on local heads; the row-sharded output projection costs
    ONE 'model' psum. MLP replicated/token-local; seg head exactly the TP
    formulation (distributed LN + logit psums). Collective schedule:
    n_layers 'seq' all-gathers + (n_layers + 2) 'model' all-reduces,
    asserted from compiled HLO in tests/test_model_axis.py.

    Parameters use the SAME layout as ``segnetvit_tp_specs`` (qkv/seg_0
    column-sharded, proj/seg_3 row-sharded), so TP checkpoints drive this
    forward unchanged. Returns ``fn(variables, descs, nk, mask) ->
    logits`` (un-jitted).
    """
    cfg = config
    assert not cfg.with_sc
    msize = mesh.shape["model"]
    h, hd = cfg.num_heads, cfg.hidden_dim // cfg.num_heads
    assert h % msize == 0
    assert cfg.output_dim % msize == 0
    h_loc = h // msize
    scale = hd**-0.5
    eps = 1e-6

    def fwd(v, descs, nk, m_full):
        p = v["params"]
        b, n_loc, _ = descs.shape

        proj = nk @ p["kenc"]["Wr"]["kernel"]  # local tokens
        cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)[:, None]
        sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)[:, None]

        x = descs @ p["input_proj"]["kernel"] + p["input_proj"]["bias"]

        for i in range(cfg.n_layers):
            g = p[f"gnn_{i}"]
            qkv = x @ g["qkv"]["kernel"] + g["qkv"]["bias"]  # local heads
            qkv = jnp.moveaxis(qkv.reshape(b, n_loc, h_loc, hd, 3), 2, 1)
            q, k, vv = qkv[..., 0], qkv[..., 1], qkv[..., 2]
            q = q * cos + _rot_half(q) * sin
            k = k * cos + _rot_half(k) * sin  # rotary BEFORE the gather
            kv = jnp.concatenate([k, vv], axis=-1)
            kv_full = jax.lax.all_gather(
                kv, "seq", axis=2, tiled=True
            )  # [B, h_loc, N, 2hd]
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
            msg = jnp.moveaxis(msg, 1, 2).reshape(b, n_loc, h_loc * hd)
            # row-sharded output projection -> ONE 'model' psum per layer
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

        # seg head: TP formulation, token-local over the 'seq' shard
        y = x @ p["seg_0"]["kernel"] + p["seg_0"]["bias"]
        stats = jnp.stack(
            [jnp.sum(y, axis=-1), jnp.sum(jnp.square(y), axis=-1)], -1
        )
        stats = jax.lax.psum(stats, "model")
        mu = stats[..., 0:1] / cfg.output_dim
        var = stats[..., 1:2] / cfg.output_dim - mu * mu
        y = (y - mu) * jax.lax.rsqrt(var + eps)
        y = y * p["seg_ln"]["scale"] + p["seg_ln"]["bias"]
        y = jax.nn.gelu(y, approximate=False)
        return (
            jax.lax.psum(y @ p["seg_3"]["kernel"], "model")
            + p["seg_3"]["bias"]
        )

    specs = segnetvit_tp_specs(variables, msize)
    return jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(
            specs,
            P("data", "seq", None),
            P("data", "seq", None),
            P("data"),  # full key mask on every shard
        ),
        out_specs=P("data", "seq", None),
        check_vma=False,
    )


def _segnetvit_layer_math(g, x, cos, sin, mask, *, heads, eps=1e-6):
    """One SegNetViT transformer layer, explicit XLA math (the per-device
    computation shared by the SP/TP/PP shard_map forwards; mirrors
    models/common.py:SelfAttentionBlock's XLA path head-for-head)."""
    b, n, hidden = x.shape
    hd = hidden // heads
    scale = hd**-0.5

    qkv = x @ g["qkv"]["kernel"] + g["qkv"]["bias"]
    qkv = jnp.moveaxis(qkv.reshape(b, n, heads, hd, 3), 2, 1)
    q, k, vv = qkv[..., 0], qkv[..., 1], qkv[..., 2]
    q = q * cos + _rot_half(q) * sin
    k = k * cos + _rot_half(k) * sin
    logits = (
        jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        )
        * scale
    )
    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
    msg = jnp.einsum(
        "bhij,bhjd->bhid", attn, vv, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    msg = jnp.moveaxis(msg, 1, 2).reshape(b, n, hidden)
    msg = msg @ g["proj"]["kernel"] + g["proj"]["bias"]
    y = jnp.concatenate([x, msg], axis=-1)
    y = y @ g["mlp_0"]["kernel"] + g["mlp_0"]["bias"]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - mu * mu
    y = (y - mu) * jax.lax.rsqrt(var + eps)
    y = y * g["mlp_ln"]["scale"] + g["mlp_ln"]["bias"]
    y = jax.nn.gelu(y, approximate=False)
    return x + (y @ g["mlp_3"]["kernel"] + g["mlp_3"]["bias"])


def stack_segnetvit_layers(variables, n_layers: int):
    """Split SegNetViT variables into (stacked layer params, io params).

    The stacked pytree has each ``gnn_i`` leaf stacked on a new leading
    layer axis — shard it ``P('pipe')`` so each pipeline stage holds a
    contiguous block of layers; everything else (kenc, input_proj, seg
    head) replicates.
    """
    p = variables["params"]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0),
        *[p[f"gnn_{i}"] for i in range(n_layers)],
    )
    io = {k: v for k, v in p.items() if not k.startswith("gnn_")}
    return stacked, io


def make_pp_segnetvit_fn(
    mesh: Mesh, config: SegNetViTConfig, n_micro: int
):
    """Pipeline-parallel SegNetViT forward over a mesh 'pipe' axis
    (GPipe schedule under shard_map).

    The layer stack is split into ``psize`` contiguous stages, each
    stage's parameters living only on its device (``P('pipe')`` on the
    stacked layer axis — the memory win: 1/psize of the transformer
    stack per device). The batch is cut into ``n_micro`` microbatches;
    at schedule step t, stage s processes microbatch t - s, so the
    pipeline fills in psize - 1 bubble steps and then streams. One
    ``ppermute`` per step hands activations to the next stage
    (n_micro + psize - 1 total) and ONE masked psum replicates the last
    stage's logits. Input projection / rotary / head parameters
    replicate (they are a rounding error next to the stack).

    The reference has nothing comparable (DP-only, train.py:64-108);
    this is the 'pp' member of the dp/tp/sp/pp family, pinned equal to
    the replicated forward in tests/test_model_axis.py.

    Bubble COST is compute, not just schedule slots (VERDICT r4): under
    SPMD shard_map every device executes every step, so the psize - 1
    fill steps run ``run_stage`` on clamped microbatch slices whose
    results are masked out — (psize-1)/(n_micro+psize-1) of all stage
    compute is wasted work, e.g. 25% at n_micro=2, psize=2; only the
    segmentation head is lax.cond-gated off during bubbles. Raise
    n_micro to amortize (the standard GPipe trade: bubble fraction
    ~ (psize-1)/n_micro at the cost of smaller per-step matmuls).

    Returns ``fn(stacked, io, descs, nk, mask) -> logits`` (un-jitted);
    build inputs with :func:`stack_segnetvit_layers`. Batch must divide
    n_micro; n_layers must divide the 'pipe' axis size.
    """
    cfg = config
    assert not cfg.with_sc
    psize = mesh.shape["pipe"]
    assert cfg.n_layers % psize == 0
    l_loc = cfg.n_layers // psize
    heads = cfg.num_heads
    eps = 1e-6
    steps = n_micro + psize - 1
    fwd_perm = [(i, i + 1) for i in range(psize - 1)]

    def fwd(stacked, io, descs, nk, mask):
        b, n, _ = descs.shape
        assert b % n_micro == 0
        mb = b // n_micro
        s = jax.lax.axis_index("pipe")

        proj = nk @ io["kenc"]["Wr"]["kernel"]
        cos_all = jnp.repeat(jnp.cos(proj), 2, axis=-1)[:, None]
        sin_all = jnp.repeat(jnp.sin(proj), 2, axis=-1)[:, None]
        x_all = descs @ io["input_proj"]["kernel"] + io["input_proj"]["bias"]

        def micro(t_arr, full):
            # microbatch slice at clamped index (bubble steps reuse a
            # valid slice; their results are masked out)
            start = jnp.clip(t_arr, 0, n_micro - 1) * mb
            return jax.lax.dynamic_slice_in_dim(full, start, mb, axis=0)

        def run_stage(h, cos, sin, m):
            def body(carry, g):
                return (
                    _segnetvit_layer_math(
                        g, carry, cos, sin, m, heads=heads
                    ),
                    None,
                )

            out, _ = jax.lax.scan(body, h, stacked)
            return out

        carry = jnp.zeros((mb, n, cfg.hidden_dim), x_all.dtype)
        out_sum = jnp.zeros((b, n, cfg.n_class), jnp.float32)

        for t in range(steps):
            recv = jax.lax.ppermute(carry, "pipe", fwd_perm)
            my_t = t - s  # microbatch index this stage works on
            inject = micro(my_t, x_all)
            h = jnp.where((s == 0)[None, None, None], inject, recv)
            cos = micro(my_t, cos_all)
            sin = micro(my_t, sin_all)
            m = micro(my_t, mask)
            h = run_stage(h, cos, sin, m)
            carry = h

            # head only on the last stage, only on valid schedule steps
            # (bubble steps skip the head compute entirely via lax.cond)
            valid = (s == psize - 1) & (my_t >= 0) & (my_t < n_micro)

            def head(h):
                y = h @ io["seg_0"]["kernel"] + io["seg_0"]["bias"]
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = (
                    jnp.mean(jnp.square(y), axis=-1, keepdims=True)
                    - mu * mu
                )
                y = (y - mu) * jax.lax.rsqrt(var + eps)
                y = y * io["seg_ln"]["scale"] + io["seg_ln"]["bias"]
                y = jax.nn.gelu(y, approximate=False)
                return (
                    y @ io["seg_3"]["kernel"] + io["seg_3"]["bias"]
                ).astype(jnp.float32)

            logits = jax.lax.cond(
                valid,
                head,
                lambda h: jnp.zeros((mb, n, cfg.n_class), jnp.float32),
                h,
            )
            pad = jnp.zeros((b - mb, n, cfg.n_class), jnp.float32)
            placed = jnp.concatenate([logits, pad], axis=0)
            shift = jnp.clip(my_t, 0, n_micro - 1) * mb
            placed = jnp.roll(placed, shift, axis=0)
            out_sum = out_sum + placed

        # replicate the last stage's assembled logits everywhere
        out = jax.lax.psum(out_sum, "pipe")
        return out.astype(x_all.dtype)

    return jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(
            P("pipe"),  # stacked layer axis (prefix spec for the pytree)
            P(),  # io params replicated
            P("data"),
            P("data"),
            P("data"),
        ),
        out_specs=P("data"),
        check_vma=False,
    )


def make_sp_gml_fn(mesh: Mesh, config, match_threshold=None):
    """Sequence-parallel GML matcher forward over a mesh 'seq' axis.

    Long-context matching beyond one chip's VMEM/HBM comfort zone: both
    keypoint sets shard their tokens over 'seq' while parameters
    replicate. The reference has no equivalent — at large token counts it
    *reduces* tokens instead (AdaGML pooling, nets/adagml.py:344-374);
    this keeps every keypoint and scales the quadratic attention work
    across devices.

    Collective schedule (asserted from compiled HLO in
    tests/test_model_axis.py):

    - ONE all-gather per self-attention layer: both sides' rotary-encoded
      (k, v) stacked into a single ``[B, h, n0_loc + n1_loc, 2*hd]``
      gather; attention then runs local queries x full keys per side.
    - ONE all-gather per cross-attention layer: the shared-projection
      (qk, v) pair of both sides, gathered the same way. Direction 0->1
      softmaxes local rows over full side-1 keys; direction 1->0
      softmaxes the full side-0 axis of the locally-held columns — both
      are exact, not approximations.
    - ONE all-gather for ``mdesc1`` before the similarity matrix (the
      ``[B, n0_loc, M]`` sim block stays row-sharded).
    - ONE psum per Sinkhorn iteration (the column-marginal reduction over
      the row-sharded transport kernel; 20 total, each ``[B, M+1]`` —
      bytes-trivial next to the per-layer gathers). The dustbin row is
      computed replicated: its row-softmax is uniform ``1/(M+1)``
      regardless of the learned score, so its column contribution is
      added AFTER the psum exactly once.

    The per-device math mirrors the XLA paths of models/common.py
    (SelfAttentionBlock / CrossAttentionBlock) and ops/sinkhorn.py
    head-for-head, so the assembled plan is pinned equal to the
    replicated ``GML.apply`` plan (reference semantics:
    nets/gml.py:189-319).

    Returns ``fn(variables, d0, d1, nk0, nk1, mask0, mask1) ->
    (plan_rows, dustbin_row)`` (un-jitted): ``plan_rows`` is the
    ``[B, N0, M+1]`` valid-row block sharded over 'seq', ``dustbin_row``
    the replicated ``[B, M+1]`` last row. Both token counts must divide
    the 'seq' axis size.

    With ``match_threshold`` set, the returned fn instead performs the
    mutual-max readout (ops/matching.py:mutual_matches) DISTRIBUTED —
    the ``[N0, M]`` plan never leaves its row shards; the column
    argmax reduces over 'seq' via one small [S, B, M] gather and the
    side-0 row results are re-assembled with [B, N0]-sized gathers —
    and returns a replicated ``MatchResult``, pinned equal to
    ``extract_matches`` of the replicated plan.
    """
    cfg = config
    ssize = mesh.shape["seq"]
    h = cfg.num_heads
    hd = cfg.hidden_dim // h
    scale = hd**-0.5
    eps_ln = 1e-6  # nn.LayerNorm default
    eps_sk = 1e-8  # ops/sinkhorn.py:_EPS
    d_out = cfg.hidden_dim

    def layer_norm(y, scale_p, bias_p):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - mu * mu
        y = (y - mu) * jax.lax.rsqrt(var + eps_ln)
        return y * scale_p + bias_p

    def concat_mlp(g, x, msg):
        """Shared concat-MLP residual (models/common.py XLA path)."""
        msg = msg @ g["proj"]["kernel"] + g["proj"]["bias"]
        y = jnp.concatenate([x, msg], axis=-1)
        y = y @ g["mlp_0"]["kernel"] + g["mlp_0"]["bias"]
        y = layer_norm(y, g["mlp_ln"]["scale"], g["mlp_ln"]["bias"])
        y = jax.nn.gelu(y, approximate=False)
        return x + (y @ g["mlp_3"]["kernel"] + g["mlp_3"]["bias"])

    def split_heads(t, b, n):
        return jnp.moveaxis(t.reshape(b, n, h, hd), 2, 1)

    def merge_heads(t, b, n):
        return jnp.moveaxis(t, 1, 2).reshape(b, n, cfg.hidden_dim)

    def gather_sides(t0, t1, n0_loc, n1_loc):
        """One untiled all-gather of both sides' per-head tensors.

        ``t0``/``t1``: [B, h, n_loc, C]. Returns the device-order-correct
        full-token tensors ([B, h, N0, C], [B, h, N1, C]) — the untiled
        gather keeps the device axis explicit so the two sides'
        interleaved blocks can be re-separated.
        """
        cat = jnp.concatenate([t0, t1], axis=2)
        g = jax.lax.all_gather(cat, "seq", axis=0, tiled=False)
        # [S, B, h, n0_loc + n1_loc, C] -> per side [B, h, S*n_loc, C]
        def unblock(part, n_loc):
            part = jnp.moveaxis(part, 0, 2)  # [B, h, S, n_loc, C]
            b_, h_ = part.shape[0], part.shape[1]
            return part.reshape(b_, h_, ssize * n_loc, part.shape[-1])

        return unblock(g[:, :, :, :n0_loc], n0_loc), unblock(
            g[:, :, :, n0_loc:], n1_loc
        )

    def fwd(v, d0, d1, nk0, nk1, m0_full, m1_full):
        p = v["params"]
        b, n0_loc, _ = d0.shape
        n1_loc = d1.shape[1]

        # rotary from the local keypoints (before any gather)
        def enc(nk):
            proj = nk @ p["poseenc"]["Wr"]["kernel"]
            cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)[:, None]
            sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)[:, None]
            return cos, sin

        cos0, sin0 = enc(nk0)
        cos1, sin1 = enc(nk1)

        wi, bi = p["input_proj"]["kernel"], p["input_proj"]["bias"]
        x0 = d0 @ wi + bi
        x1 = d1 @ wi + bi

        for i in range(cfg.n_layers):
            # --- self attention (per side, shared weights) ---
            g = p[f"self_attn_{i}"]

            def qkv_side(x, cos, sin, n_loc):
                qkv = x @ g["qkv"]["kernel"] + g["qkv"]["bias"]
                qkv = jnp.moveaxis(qkv.reshape(b, n_loc, h, hd, 3), 2, 1)
                q, k, vv = qkv[..., 0], qkv[..., 1], qkv[..., 2]
                q = q * cos + _rot_half(q) * sin
                k = k * cos + _rot_half(k) * sin
                return q, jnp.concatenate([k, vv], axis=-1)

            q0, kv0 = qkv_side(x0, cos0, sin0, n0_loc)
            q1, kv1 = qkv_side(x1, cos1, sin1, n1_loc)
            kv0_full, kv1_full = gather_sides(kv0, kv1, n0_loc, n1_loc)

            def attend_self(q, kv_full, m_full, x):
                k_full, v_full = kv_full[..., :hd], kv_full[..., hd:]
                logits = (
                    jnp.einsum(
                        "bhid,bhjd->bhij", q, k_full,
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )
                logits = jnp.where(
                    m_full[:, None, None, :], logits,
                    jnp.asarray(-1e9, logits.dtype),
                )
                attn = jax.nn.softmax(logits, axis=-1).astype(v_full.dtype)
                return jnp.einsum(
                    "bhij,bhjd->bhid", attn, v_full,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)

            msg0 = merge_heads(attend_self(q0, kv0_full, m0_full, x0), b, n0_loc)
            msg1 = merge_heads(attend_self(q1, kv1_full, m1_full, x1), b, n1_loc)
            x0 = concat_mlp(g, x0, msg0)
            x1 = concat_mlp(g, x1, msg1)

            # --- symmetric cross attention (shared to_qk) ---
            g = p[f"cross_attn_{i}"]
            root = scale**0.5

            def qk_v_side(x, n_loc):
                qk = (x @ g["to_qk"]["kernel"] + g["to_qk"]["bias"]) * root
                vv = x @ g["to_v"]["kernel"] + g["to_v"]["bias"]
                return split_heads(qk, b, n_loc), split_heads(vv, b, n_loc)

            qk0, v0 = qk_v_side(x0, n0_loc)
            qk1, v1 = qk_v_side(x1, n1_loc)
            qkv0_full, qkv1_full = gather_sides(
                jnp.concatenate([qk0, v0], axis=-1),
                jnp.concatenate([qk1, v1], axis=-1),
                n0_loc,
                n1_loc,
            )
            qk0_full, v0_full = qkv0_full[..., :hd], qkv0_full[..., hd:]
            qk1_full, v1_full = qkv1_full[..., :hd], qkv1_full[..., hd:]

            # 0 -> 1: local side-0 rows over the full side-1 keys
            sim0 = jnp.einsum(
                "bhid,bhjd->bhij", qk0, qk1_full,
                preferred_element_type=jnp.float32,
            )
            attn01 = jax.nn.softmax(
                jnp.where(
                    m1_full[:, None, None, :], sim0,
                    jnp.asarray(-1e9, sim0.dtype),
                ),
                axis=-1,
            ).astype(v1_full.dtype)
            m0_msg = jnp.einsum(
                "bhij,bhjd->bhid", attn01, v1_full,
                preferred_element_type=jnp.float32,
            ).astype(x0.dtype)

            # 1 -> 0: full side-0 axis of the locally-held columns
            sim1 = jnp.einsum(
                "bhid,bhjd->bhij", qk0_full, qk1,
                preferred_element_type=jnp.float32,
            )
            attn10 = jax.nn.softmax(
                jnp.where(
                    m0_full[:, None, :, None], sim1,
                    jnp.asarray(-1e9, sim1.dtype),
                ),
                axis=-2,
            ).astype(v0_full.dtype)
            m1_msg = jnp.einsum(
                "bhij,bhid->bhjd", attn10, v0_full,
                preferred_element_type=jnp.float32,
            ).astype(x1.dtype)

            x0 = concat_mlp(g, x0, merge_heads(m0_msg, b, n0_loc))
            x1 = concat_mlp(g, x1, merge_heads(m1_msg, b, n1_loc))

        # --- matching head (last out_proj only; nets/gml.py:279-280) ---
        o = p[f"out_proj_{cfg.n_layers - 1}"]
        md0 = (x0 @ o["kernel"] + o["bias"]) / d_out**0.25
        md1 = (x1 @ o["kernel"] + o["bias"]) / d_out**0.25
        md1_full = jax.lax.all_gather(md1, "seq", axis=1, tiled=True)
        sim = jnp.einsum(
            "bnd,bmd->bnm", md0, md1_full,
            preferred_element_type=jnp.float32,
        )

        # --- Sinkhorn, rows sharded over 'seq' (ops/sinkhorn.py math) ---
        dustbin = p["bin_score"]
        m_cols = sim.shape[-1]
        aug = jnp.concatenate(
            [sim, jnp.broadcast_to(dustbin, (b, n0_loc, 1)).astype(sim.dtype)],
            axis=-1,
        )
        p_loc = jax.nn.softmax(aug, axis=-1)  # [B, n0_loc, M+1]
        # the dustbin ROW of the augmented matrix is a constant row, so its
        # row-softmax is exactly uniform 1/(M+1): computed replicated.
        inv_mp1 = 1.0 / (m_cols + 1)

        idx = jax.lax.axis_index("seq")
        m0_loc = jax.lax.dynamic_slice_in_dim(
            m0_full, idx * n0_loc, n0_loc, axis=1
        )
        r_loc = m0_loc.astype(sim.dtype)
        n_valid = jnp.sum(m0_full.astype(sim.dtype), axis=-1) + 1.0
        c = jnp.concatenate(
            [
                m1_full.astype(sim.dtype),
                (jnp.sum(m1_full.astype(sim.dtype), axis=-1) + 1.0)[:, None],
            ],
            axis=-1,
        )  # [B, M+1]

        def body(carry, _):
            _, vv = carry
            u = r_loc / (jnp.einsum("bnm,bm->bn", p_loc, vv) + eps_sk)
            u_dust = n_valid / (jnp.sum(vv, axis=-1) * inv_mp1 + eps_sk)
            colsum = jax.lax.psum(
                jnp.einsum("bnm,bn->bm", p_loc, u), "seq"
            )
            colsum = colsum + u_dust[:, None] * inv_mp1
            vv = c / (colsum + eps_sk)
            return (jnp.concatenate([u, u_dust[:, None]], -1), vv), None

        u0 = jnp.ones((b, n0_loc + 1), sim.dtype)
        v0_init = jnp.ones((b, m_cols + 1), sim.dtype)
        (uv, vfin), _ = jax.lax.scan(
            body, (u0, v0_init), None, length=cfg.sinkhorn_iterations
        )
        u_rows, u_dust = uv[:, :n0_loc], uv[:, n0_loc]
        plan_rows = p_loc * u_rows[:, :, None] * vfin[:, None, :]
        dust_row = (u_dust[:, None] * inv_mp1) * vfin
        return plan_rows, dust_row

    def fwd_match(v, d0, d1, nk0, nk1, m0_full, m1_full):
        from pram_tpu.ops.matching import MatchResult

        plan_rows, _ = fwd(v, d0, d1, nk0, nk1, m0_full, m1_full)
        scores = plan_rows[:, :, :-1]  # [B, n0_loc, M] dustbin col dropped
        b, n0_loc, m = scores.shape
        lo = jax.lax.axis_index("seq") * n0_loc

        # row maxima: local (full columns present)
        max0_loc = jnp.max(scores, axis=2)
        idx0_loc = jnp.argmax(scores, axis=2).astype(jnp.int32)

        # column maxima: local block reduction, then a small [S, B, M]
        # gather; first-device-wins on ties = global first-occurrence,
        # matching jnp.argmax semantics
        colmax_loc = jnp.max(scores, axis=1)
        colarg_loc = lo + jnp.argmax(scores, axis=1).astype(jnp.int32)
        gm = jax.lax.all_gather(colmax_loc, "seq", axis=0, tiled=False)
        ga = jax.lax.all_gather(colarg_loc, "seq", axis=0, tiled=False)
        s_star = jnp.argmax(gm, axis=0)[None]  # [1, B, M]
        max1 = jnp.take_along_axis(gm, s_star, axis=0)[0]
        indices1 = jnp.take_along_axis(ga, s_star, axis=0)[0]

        # side-0 mutual check on local rows (global row ids)
        ar0 = lo + jnp.arange(n0_loc, dtype=jnp.int32)[None, :]
        mutual0 = ar0 == jnp.take_along_axis(indices1, idx0_loc, axis=1)
        zero = jnp.zeros((), scores.dtype)
        mscores0_loc = jnp.where(mutual0, max0_loc, zero)
        valid0_loc = mutual0 & (mscores0_loc > match_threshold)
        matches0_loc = jnp.where(
            valid0_loc, idx0_loc, jnp.full((), -1, jnp.int32)
        )

        # assemble full side-0 rows ([B, N0]-sized gathers, tiny next to
        # the [N0, M] plan that never leaves its shards)
        def row_gather(t):
            return jax.lax.all_gather(t, "seq", axis=1, tiled=True)

        idx0_full = row_gather(idx0_loc)
        mscores0 = row_gather(mscores0_loc)
        valid0 = row_gather(valid0_loc)
        matches0 = row_gather(matches0_loc)

        # side-1 mutual check (replicated)
        ar1 = jnp.arange(m, dtype=jnp.int32)[None, :]
        mutual1 = ar1 == jnp.take_along_axis(idx0_full, indices1, axis=1)
        mscores1 = jnp.where(
            mutual1,
            jnp.take_along_axis(mscores0, indices1, axis=1),
            zero,
        )
        valid1 = mutual1 & jnp.take_along_axis(valid0, indices1, axis=1)
        matches1 = jnp.where(
            valid1, indices1, jnp.full((), -1, jnp.int32)
        )
        del max1  # kept for clarity of the reduction; not in the result
        return MatchResult(matches0, matches1, mscores0, mscores1)

    if match_threshold is None:
        body = fwd
        out_specs = (P("data", "seq", None), P("data"))
    else:
        from pram_tpu.ops.matching import MatchResult

        body = fwd_match
        out_specs = MatchResult(
            P("data"), P("data"), P("data"), P("data")
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),  # parameters replicated
            P("data", "seq", None),
            P("data", "seq", None),
            P("data", "seq", None),
            P("data", "seq", None),
            P("data"),  # full row mask on every seq shard
            P("data"),  # full column mask on every seq shard
        ),
        out_specs=out_specs,
        check_vma=False,
    )


def make_sp_adagml_fn(mesh: Mesh, config):
    """Sequence-parallel AdaGML forward over a mesh 'seq' axis.

    VERDICT r4 #8 asked for SP over AdaGML's *full-token prefix* (the
    layers before the first prune) or an impossibility argument. This
    goes further: in the masking formulation (models/adagml.py — the
    reference's dynamic token pruning at nets/adagml.py:344-374 recast
    as mask updates over STATIC shapes), pruning never changes token
    counts, so the ENTIRE adaptive stack is sequence-shardable — pruned
    tokens keep their slot and their shard; only their mask bit drops.

    Collective schedule on top of the SP-GML base (one stacked-KV
    all-gather per self- and per cross-attention, make_sp_gml_fn):

    - ONE ``[B, 2*(N0 + N1)]`` psum per ADAPTIVE layer (layers 1..L-1;
      the reference prunes from layer 1, nets/adagml.py:527): the four
      received-attention partial sums (self/cross x side0/side1)
      concatenated — each shard holds partial sums over its LOCAL
      queries for ALL global keys, so one collective completes all
      pooling statistics.
    - ONE ``[B, n0_loc + n1_loc] -> [B, N0 + N1]`` all-gather of the
      pooling confidences per adaptive layer: mask/stop updates then
      evaluate REPLICATED on every shard (identical inputs -> identical
      masks — no divergence across shards by construction).

    Both extras are [B, tokens]-sized — bytes-trivial next to the
    per-layer [B, h, tokens, 2*hd] KV gathers.

    The per-device math mirrors the XLA paths of models/adagml.py
    (_SelfAttnStats/_CrossAttnStats/PoolingLayer + the stop/prune logic)
    head-for-head; parity vs the replicated ``AdaGML.apply`` —
    transport plan, stop_layer, AND final pruned masks — is pinned in
    tests/test_sp_adagml.py. Requires ``with_sinkhorn`` (the reference
    eval configuration); the dual-softmax head's column softmax would
    need one extra psum — not implemented until a config needs it.

    Returns ``fn(variables, d0, d1, nk0, nk1, mask0, mask1) ->
    (plan_rows, dust_row, stop_layer, mask0_final, mask1_final)``
    (un-jitted): ``plan_rows`` is the ``[B, n0_loc, M+1]`` row block
    sharded over 'seq'; the rest replicated. Per-layer confidences (a
    training-only output) are not returned — this formulation is the
    serving-scale path; training uses the replicated module.
    """
    cfg = config
    if not cfg.with_sinkhorn:
        raise ValueError(
            "make_sp_adagml_fn covers the sinkhorn head (the reference "
            "eval config); dual-softmax needs an extra column psum"
        )
    ssize = mesh.shape["seq"]
    h = cfg.num_heads
    hd = cfg.hidden_dim // h
    scale = hd**-0.5
    eps_ln = 1e-6  # nn.LayerNorm default
    eps_sk = 1e-8  # ops/sinkhorn.py:_EPS
    d_out = cfg.hidden_dim

    from pram_tpu.models.adagml import confidence_threshold

    def layer_norm(y, scale_p, bias_p):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - mu * mu
        y = (y - mu) * jax.lax.rsqrt(var + eps_ln)
        return y * scale_p + bias_p

    def concat_mlp(g, x, msg):
        msg = msg @ g["proj"]["kernel"] + g["proj"]["bias"]
        y = jnp.concatenate([x, msg], axis=-1)
        y = y @ g["mlp_0"]["kernel"] + g["mlp_0"]["bias"]
        y = layer_norm(y, g["mlp_ln"]["scale"], g["mlp_ln"]["bias"])
        y = jax.nn.gelu(y, approximate=False)
        return x + (y @ g["mlp_3"]["kernel"] + g["mlp_3"]["bias"])

    def split_heads(t, b, n):
        return jnp.moveaxis(t.reshape(b, n, h, hd), 2, 1)

    def merge_heads(t, b, n):
        return jnp.moveaxis(t, 1, 2).reshape(b, n, cfg.hidden_dim)

    def gather_sides(t0, t1, n0_loc, n1_loc):
        """One untiled all-gather of both sides' per-head tensors."""
        cat = jnp.concatenate([t0, t1], axis=2)
        g = jax.lax.all_gather(cat, "seq", axis=0, tiled=False)

        def unblock(part, n_loc):
            part = jnp.moveaxis(part, 0, 2)  # [B, h, S, n_loc, C]
            b_, h_ = part.shape[0], part.shape[1]
            return part.reshape(b_, h_, ssize * n_loc, part.shape[-1])

        return unblock(g[:, :, :, :n0_loc], n0_loc), unblock(
            g[:, :, :, n0_loc:], n1_loc
        )

    def gather_rows(t0, t1, n0_loc, n1_loc):
        """[B, n0_loc] + [B, n1_loc] -> ([B, N0], [B, N1]) in one gather."""
        cat = jnp.concatenate([t0, t1], axis=1)
        g = jax.lax.all_gather(cat, "seq", axis=0, tiled=False)

        def unblock(part, n_loc):
            part = jnp.moveaxis(part, 0, 1)  # [B, S, n_loc]
            return part.reshape(part.shape[0], ssize * n_loc)

        return unblock(g[:, :, :n0_loc], n0_loc), unblock(
            g[:, :, n0_loc:], n1_loc
        )

    def pool_conf(g, x, score):
        """PoolingLayer math (models/adagml.py:73-94) on local tokens."""
        s = score @ g["score_enc_0"]["kernel"] + g["score_enc_0"]["bias"]
        s = layer_norm(
            s, g["score_enc_ln"]["scale"], g["score_enc_ln"]["bias"]
        )
        s = jax.nn.gelu(s, approximate=False)
        s = s @ g["score_enc_3"]["kernel"] + g["score_enc_3"]["bias"]
        xp = x @ g["proj"]["kernel"] + g["proj"]["bias"]
        y = jnp.concatenate([xp, s], axis=-1)
        y = y @ g["predict_0"]["kernel"] + g["predict_0"]["bias"]
        y = layer_norm(y, g["predict_ln"]["scale"], g["predict_ln"]["bias"])
        y = jax.nn.gelu(y, approximate=False)
        y = y @ g["predict_3"]["kernel"] + g["predict_3"]["bias"]
        return jax.nn.sigmoid(y)[..., 0]

    def fwd(v, d0, d1, nk0, nk1, m0_full, m1_full):
        p = v["params"]
        b, n0_loc, _ = d0.shape
        n1_loc = d1.shape[1]
        n0 = ssize * n0_loc
        n1 = ssize * n1_loc
        idx = jax.lax.axis_index("seq")
        f32 = jnp.float32

        def loc0(t_full):
            return jax.lax.dynamic_slice_in_dim(
                t_full, idx * n0_loc, n0_loc, axis=1
            )

        def loc1(t_full):
            return jax.lax.dynamic_slice_in_dim(
                t_full, idx * n1_loc, n1_loc, axis=1
            )

        def enc(nk):
            proj = nk @ p["poseenc"]["Wr"]["kernel"]
            cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)[:, None]
            sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)[:, None]
            return cos, sin

        cos0, sin0 = enc(nk0)
        cos1, sin1 = enc(nk1)

        wi, bi = p["input_proj"]["kernel"], p["input_proj"]["bias"]
        x0 = d0 @ wi + bi
        x1 = d1 @ wi + bi

        orig_total = jnp.sum(m0_full.astype(f32), -1) + jnp.sum(
            m1_full.astype(f32), -1
        )
        stopped = jnp.zeros((b,), bool)
        stop_layer = jnp.full((b,), cfg.n_layers - 1, jnp.int32)

        for ni in range(cfg.n_layers):
            x0_in, x1_in = x0, x1  # pre-layer features (freeze source)

            # --- self attention with received-attention partials ---
            g = p[f"self_attn_{ni}"]

            def qkv_side(x, cos, sin, n_loc):
                qkv = x @ g["qkv"]["kernel"] + g["qkv"]["bias"]
                qkv = jnp.moveaxis(qkv.reshape(b, n_loc, h, hd, 3), 2, 1)
                q, k, vv = qkv[..., 0], qkv[..., 1], qkv[..., 2]
                q = q * cos + _rot_half(q) * sin
                k = k * cos + _rot_half(k) * sin
                return q, jnp.concatenate([k, vv], axis=-1)

            q0, kv0 = qkv_side(x0, cos0, sin0, n0_loc)
            q1, kv1 = qkv_side(x1, cos1, sin1, n1_loc)
            kv0_full, kv1_full = gather_sides(kv0, kv1, n0_loc, n1_loc)

            def attend_self(q, kv_full, m_full, qm_loc, x):
                k_full, v_full = kv_full[..., :hd], kv_full[..., hd:]
                logits = (
                    jnp.einsum(
                        "bhid,bhjd->bhij", q, k_full,
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )
                logits = jnp.where(
                    m_full[:, None, None, :], logits,
                    jnp.asarray(-1e9, logits.dtype),
                )
                attn = jax.nn.softmax(logits, axis=-1)
                # partial received-attention: mean over heads, sum over
                # the shard's VALID queries, for all global keys [B, N]
                stat_part = jnp.einsum(
                    "bhij,bi->bj", attn, qm_loc.astype(jnp.float32)
                ) / float(h)
                msg = jnp.einsum(
                    "bhij,bhjd->bhid", attn.astype(v_full.dtype), v_full,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                return msg, stat_part

            qm0_loc = loc0(m0_full)
            qm1_loc = loc1(m1_full)
            msg0, s00_part = attend_self(q0, kv0_full, m0_full, qm0_loc, x0)
            msg1, s11_part = attend_self(q1, kv1_full, m1_full, qm1_loc, x1)
            nx0 = concat_mlp(g, x0, merge_heads(msg0, b, n0_loc))
            nx1 = concat_mlp(g, x1, merge_heads(msg1, b, n1_loc))

            # --- symmetric cross attention with stats ---
            g = p[f"cross_attn_{ni}"]
            root = scale**0.5

            def qk_v_side(x, n_loc):
                qk = (x @ g["to_qk"]["kernel"] + g["to_qk"]["bias"]) * root
                vv = x @ g["to_v"]["kernel"] + g["to_v"]["bias"]
                return split_heads(qk, b, n_loc), split_heads(vv, b, n_loc)

            qk0, v0 = qk_v_side(nx0, n0_loc)
            qk1, v1 = qk_v_side(nx1, n1_loc)
            qkv0_full, qkv1_full = gather_sides(
                jnp.concatenate([qk0, v0], axis=-1),
                jnp.concatenate([qk1, v1], axis=-1),
                n0_loc,
                n1_loc,
            )
            qk0_full, v0_full = qkv0_full[..., :hd], qkv0_full[..., hd:]
            qk1_full, v1_full = qkv1_full[..., :hd], qkv1_full[..., hd:]

            # 0 -> 1: local side-0 query rows over full side-1 keys.
            # attn01's queries are side 0 => its received-attention stat
            # feeds side-1 tokens (all global columns present locally).
            sim0 = jnp.einsum(
                "bhid,bhjd->bhij", qk0, qk1_full,
                preferred_element_type=jnp.float32,
            )
            attn01 = jax.nn.softmax(
                jnp.where(
                    m1_full[:, None, None, :], sim0,
                    jnp.asarray(-1e9, sim0.dtype),
                ),
                axis=-1,
            )
            s10_part = jnp.einsum(
                "bhij,bi->bj", attn01, qm0_loc.astype(jnp.float32)
            ) / float(h)  # [B, N1]
            m0_msg = jnp.einsum(
                "bhij,bhjd->bhid", attn01.astype(v1_full.dtype), v1_full,
                preferred_element_type=jnp.float32,
            ).astype(nx0.dtype)

            # 1 -> 0: full side-0 axis of the locally-held side-1 columns.
            # attn10's queries are side 1 => its stat feeds side-0 tokens.
            sim1 = jnp.einsum(
                "bhid,bhjd->bhij", qk0_full, qk1,
                preferred_element_type=jnp.float32,
            )
            attn10 = jax.nn.softmax(
                jnp.where(
                    m0_full[:, None, :, None], sim1,
                    jnp.asarray(-1e9, sim1.dtype),
                ),
                axis=-2,
            )
            s01_part = jnp.einsum(
                "bhij,bj->bi", attn10, qm1_loc.astype(jnp.float32)
            ) / float(h)  # [B, N0]
            m1_msg = jnp.einsum(
                "bhij,bhid->bhjd", attn10.astype(v0_full.dtype), v0_full,
                preferred_element_type=jnp.float32,
            ).astype(nx1.dtype)

            nx0 = concat_mlp(g, nx0, merge_heads(m0_msg, b, n0_loc))
            nx1 = concat_mlp(g, nx1, merge_heads(m1_msg, b, n1_loc))

            # freeze descriptors for batches that already stopped
            keep = stopped[:, None, None]
            x0 = jnp.where(keep, x0_in, nx0)
            x1 = jnp.where(keep, x1_in, nx1)

            # pooling + mask/stop updates only where they can take effect
            # (the replicated model prunes from layer 1 on; layer-0
            # confidences are a training-only output this serving path
            # does not return, models/adagml.py:397-430)
            if cfg.adaptive and ni >= 1:
                # --- ONE [B, 2*(N0+N1)] psum: all four received-attention
                # partials at once (self/cross enter the pooling input as
                # separate channels) ---
                stats = jax.lax.psum(
                    jnp.concatenate(
                        [s00_part, s01_part, s10_part, s11_part], axis=-1
                    ),
                    "seq",
                )
                nv0 = jnp.maximum(
                    jnp.sum(m0_full.astype(f32), -1, keepdims=True), 1.0
                )
                nv1 = jnp.maximum(
                    jnp.sum(m1_full.astype(f32), -1, keepdims=True), 1.0
                )
                s00 = stats[:, :n0] / nv0
                s01 = stats[:, n0 : 2 * n0] / nv1
                s10 = stats[:, 2 * n0 : 2 * n0 + n1] / nv0
                s11 = stats[:, 2 * n0 + n1 :] / nv1

                # --- pooling confidences on local tokens, then one small
                # gather so mask/stop updates run replicated ---
                g = p[f"pooling_{ni}"]
                conf0_loc = pool_conf(
                    g, nx0, jnp.stack([loc0(s00), loc0(s01)], axis=-1)
                )
                conf1_loc = pool_conf(
                    g, nx1, jnp.stack([loc1(s11), loc1(s10)], axis=-1)
                )
                conf0, conf1 = gather_rows(
                    conf0_loc, conf1_loc, n0_loc, n1_loc
                )

                th = confidence_threshold(ni, cfg.n_layers)
                cnt0 = jnp.sum(m0_full.astype(jnp.int32), -1)
                cnt1 = jnp.sum(m1_full.astype(jnp.int32), -1)
                prune0 = (cnt0 >= cfg.n_min_tokens) & ~stopped
                prune1 = (cnt1 >= cfg.n_min_tokens) & ~stopped
                below = jnp.sum(
                    ((conf0 < th) & m0_full).astype(f32), -1
                ) + jnp.sum(((conf1 < th) & m1_full).astype(f32), -1)
                m0_full = jnp.where(
                    prune0[:, None], m0_full & (conf0 > th), m0_full
                )
                m1_full = jnp.where(
                    prune1[:, None], m1_full & (conf1 > th), m1_full
                )
                pos = 1.0 - below / jnp.maximum(orig_total, 1.0)
                now_stop = pos > cfg.stop_ratio
                stop_layer = jnp.where(~stopped & now_stop, ni, stop_layer)
                stopped = stopped | now_stop

        # --- head: out_proj selected by stop_layer (one-hot over layers,
        # models/adagml.py:432-442), then the row-sharded sinkhorn ---
        onehot = jax.nn.one_hot(stop_layer, cfg.n_layers, dtype=x0.dtype)

        def md_select(x):
            md_all = jnp.stack(
                [
                    x @ p[f"out_proj_{i}"]["kernel"]
                    + p[f"out_proj_{i}"]["bias"]
                    for i in range(cfg.n_layers)
                ],
                axis=0,
            )
            return jnp.einsum("lbnd,bl->bnd", md_all, onehot) / d_out**0.25

        md0 = md_select(x0)
        md1_full = jax.lax.all_gather(md_select(x1), "seq", axis=1, tiled=True)
        sim = jnp.einsum(
            "bnd,bmd->bnm", md0, md1_full,
            preferred_element_type=jnp.float32,
        )

        # row-sharded Sinkhorn with the FINAL pruned masks (the replicated
        # model feeds its post-pruning masks, models/adagml.py:448-453);
        # identical math to make_sp_gml_fn's tail
        dustbin = p["bin_score"]
        m_cols = sim.shape[-1]
        aug = jnp.concatenate(
            [sim, jnp.broadcast_to(dustbin, (b, n0_loc, 1)).astype(sim.dtype)],
            axis=-1,
        )
        p_loc = jax.nn.softmax(aug, axis=-1)
        inv_mp1 = 1.0 / (m_cols + 1)

        m0_loc = loc0(m0_full)
        r_loc = m0_loc.astype(sim.dtype)
        n_valid = jnp.sum(m0_full.astype(sim.dtype), axis=-1) + 1.0
        c = jnp.concatenate(
            [
                m1_full.astype(sim.dtype),
                (jnp.sum(m1_full.astype(sim.dtype), axis=-1) + 1.0)[:, None],
            ],
            axis=-1,
        )

        def body(carry, _):
            _, vv = carry
            u = r_loc / (jnp.einsum("bnm,bm->bn", p_loc, vv) + eps_sk)
            u_dust = n_valid / (jnp.sum(vv, axis=-1) * inv_mp1 + eps_sk)
            colsum = jax.lax.psum(
                jnp.einsum("bnm,bn->bm", p_loc, u), "seq"
            )
            colsum = colsum + u_dust[:, None] * inv_mp1
            vv = c / (colsum + eps_sk)
            return (jnp.concatenate([u, u_dust[:, None]], -1), vv), None

        u0 = jnp.ones((b, n0_loc + 1), sim.dtype)
        v0_init = jnp.ones((b, m_cols + 1), sim.dtype)
        (uv, vfin), _ = jax.lax.scan(
            body, (u0, v0_init), None, length=cfg.sinkhorn_iterations
        )
        u_rows, u_dust = uv[:, :n0_loc], uv[:, n0_loc]
        plan_rows = p_loc * u_rows[:, :, None] * vfin[:, None, :]
        dust_row = (u_dust[:, None] * inv_mp1) * vfin
        return plan_rows, dust_row, stop_layer, m0_full, m1_full

    return jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(
            P(),  # parameters replicated
            P("data", "seq", None),
            P("data", "seq", None),
            P("data", "seq", None),
            P("data", "seq", None),
            P("data"),  # full masks on every seq shard
            P("data"),
        ),
        out_specs=(
            P("data", "seq", None),
            P("data"),
            P("data"),
            P("data"),
            P("data"),
        ),
        check_vma=False,
    )


def make_sp_train_apply(mesh: Mesh, config: SegNetViTConfig):
    """Trainer hook for sequence-parallel training (`--sp` on the train
    CLI): ``apply_fn(params, batch) -> logits`` wrapping
    :func:`make_sp_segnetvit_fn` so `train.trainer.make_train_step` can
    differentiate straight through the shard_map (the all-gather
    transpose is a reduce-scatter; parameter grads psum over 'seq' and
    'data' — exactly the DP gradient all-reduce fused with the SP
    schedule). Loss/optimizer semantics are unchanged from the
    replicated step (pinned in tests/test_train_parallel.py).
    """
    fn = make_sp_segnetvit_fn(mesh, config)

    def apply_fn(params, batch):
        descs = batch["seg_descriptors"]
        mask = batch.get("mask")
        if mask is None:
            mask = jnp.ones(descs.shape[:2], bool)
        return fn({"params": params}, descs, batch["norm_keypoints"], mask)

    return apply_fn


def make_pp_train_setup(mesh: Mesh, config: SegNetViTConfig, n_micro: int):
    """Trainer hooks for pipeline-parallel training (`--pp`).

    Returns ``(params_transform, param_specs, apply_fn)``:

    - ``params_transform(params)``: reshape the flax param dict into
      ``{'stacked': per-layer-stacked gnn params, 'io': the rest}``
      (:func:`stack_segnetvit_layers`) — the form the GPipe forward
      consumes and the form the optimizer state shards in.
    - ``param_specs(params_t)``: PartitionSpec tree — the stacked layer
      axis ``P('pipe')`` (1/psize of the transformer stack AND its Adam
      moments per device), io replicated.
    - ``apply_fn(params, batch) -> logits`` wrapping
      :func:`make_pp_segnetvit_fn`; grads flow through the ppermute
      transpose (reverse permute), so the pipeline *trains* — parameter
      updates are pinned equal to the replicated trainer in
      tests/test_train_parallel.py.

    adamw is elementwise, so updating the stacked form is exactly
    updating each layer separately; checkpoint trees saved in this form
    restore with the same (mesh, n_micro) setup.
    """
    fn = make_pp_segnetvit_fn(mesh, config, n_micro)

    def params_transform(params):
        stacked, io = stack_segnetvit_layers(
            {"params": params}, config.n_layers
        )
        return {"stacked": stacked, "io": io}

    def param_specs(params_t):
        return {
            "stacked": jax.tree_util.tree_map(
                lambda _: P("pipe"), params_t["stacked"]
            ),
            "io": jax.tree_util.tree_map(lambda _: P(), params_t["io"]),
        }

    def apply_fn(params, batch):
        descs = batch["seg_descriptors"]
        mask = batch.get("mask")
        if mask is None:
            mask = jnp.ones(descs.shape[:2], bool)
        return fn(
            params["stacked"], params["io"], descs,
            batch["norm_keypoints"], mask,
        )

    return params_transform, param_specs, apply_fn


def trainer_parallel_setup(
    network: str,
    config,
    *,
    sp: int = 1,
    pp: int = 1,
    n_micro: int = 2,
    n_tokens: int = 0,
    batch_size: int = 0,
    devices=None,
):
    """Validate + build the mesh and trainer hooks for `--sp` / `--pp`.

    The reference wires its only parallelism (DDP) into its train CLI
    (train.py:64-108); this holds the SP/PP extensions to the same
    standard. Returns ``(mesh, hooks)`` with hooks =
    ``{'apply_fn', 'params_transform', 'param_specs'}`` (the latter two
    None for SP). Raises ValueError (fail-loud, like the --tp no-match
    check) when the requested layout cannot apply.
    """
    import numpy as np

    if (sp > 1) == (pp > 1):
        raise ValueError("exactly one of --sp/--pp must be > 1 here")
    if network.lower() != "segnetvit":
        raise ValueError(
            f"--sp/--pp are defined for the attention recognizer "
            f"(segnetvit); got '{network}' (parallel/tp.py formulations)"
        )
    if getattr(config, "with_sc", False):
        raise ValueError("--sp/--pp cover the seg head (with_sc off)")

    devs = np.asarray(devices if devices is not None else jax.devices())
    size = sp if sp > 1 else pp
    if devs.size % size:
        raise ValueError(
            f"--{'sp' if sp > 1 else 'pp'} {size} does not divide the "
            f"{devs.size} available devices"
        )
    data = devs.size // size
    grid = devs[: data * size].reshape(data, size)

    if sp > 1:
        if n_tokens % sp:
            raise ValueError(
                f"--sp {sp}: token count {n_tokens} (max_keypoints) must "
                f"divide the seq axis"
            )
        mesh = Mesh(grid, axis_names=("data", "seq"))
        return mesh, {
            "apply_fn": make_sp_train_apply(mesh, config),
            "params_transform": None,
            "param_specs": None,
        }

    if config.n_layers % pp:
        raise ValueError(
            f"--pp {pp}: n_layers {config.n_layers} must split into "
            f"equal stages"
        )
    if batch_size % data or (batch_size // data) % n_micro:
        raise ValueError(
            f"--pp {pp}: batch_size {batch_size} must divide into "
            f"{data} data shards x {n_micro} microbatches"
        )
    mesh = Mesh(grid, axis_names=("data", "pipe"))
    transform, specs, apply_fn = make_pp_train_setup(mesh, config, n_micro)
    return mesh, {
        "apply_fn": apply_fn,
        "params_transform": transform,
        "param_specs": specs,
    }


def sp_gml_plan(
    mesh: Mesh,
    config,
    variables,
    desc0: jax.Array,
    desc1: jax.Array,
    norm_kpts0: jax.Array,
    norm_kpts1: jax.Array,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
) -> jax.Array:
    """Sequence+data-parallel GML transport plan ``[B, N0+1, M+1]``,
    equal to the replicated ``GML.apply(...)["plan"]`` (pinned in
    tests/test_model_axis.py)."""
    b, n0 = desc0.shape[:2]
    n1 = desc1.shape[1]
    if mask0 is None:
        mask0 = jnp.ones((b, n0), bool)
    if mask1 is None:
        mask1 = jnp.ones((b, n1), bool)
    fn = jax.jit(make_sp_gml_fn(mesh, config))
    rows, dust = fn(
        variables, desc0, desc1, norm_kpts0, norm_kpts1, mask0, mask1
    )
    return jnp.concatenate([rows, dust[:, None, :]], axis=1)
