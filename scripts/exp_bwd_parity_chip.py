"""On-chip gradient parity for the Pallas backward kernels (r5 gate).

The r4 negative result (clamp-only softmax: interpret-green, broke recall
on hardware with trained weights) set the validation bar for flipping any
kernel default: parity must hold ON THE CHIP with REAL weights, not just
in interpret mode with random init. This script computes recognizer
training-step gradients with PRAM_ATTN_BWD / PRAM_MLP_BWD on vs off on
the real backend and reports the worst relative parameter-gradient
deviation for each flag combination.

Usage:  python scripts/exp_bwd_parity_chip.py
Prints one JSON line: max relative grad deviation per flag set (the
fused-forward trace is identical in all runs; only the backward differs).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def grads_with(flags, params, batch):
    """Recognizer CE-loss grads with the given backward-kernel env flags."""
    for k in ("PRAM_ATTN_BWD", "PRAM_MLP_BWD"):
        os.environ[k] = flags.get(k, "0")
    import jax
    import jax.numpy as jnp

    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig

    rec = SegNetViT(SegNetViTConfig(n_class=113))
    descs, nk, mask, labels = batch

    def loss_fn(p):
        logits = rec.apply({"params": p}, descs, nk, mask)["prediction"]
        lab = jnp.clip(labels, 0, 112)
        ce = -jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ce = jnp.take_along_axis(ce, lab[..., None], -1)[..., 0]
        return jnp.mean(jnp.where(mask, ce, 0.0))

    # fresh jit per flag set (trace-time flags); donate nothing
    g = jax.jit(jax.grad(loss_fn))(params)
    return jax.tree_util.tree_map(lambda a: jax.device_get(a), g)


def main():
    from pram_tpu.utils.chip import wait_for_chip

    if not wait_for_chip(max_wait_s=int(os.environ.get("WAIT_S", "600"))):
        print(json.dumps({"error": "chip unavailable"}))
        return
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.RandomState(0)
    b, n, d = 8, 512, 256

    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig

    rec = SegNetViT(SegNetViTConfig(n_class=113))
    descs = jnp.asarray(rng.randn(b, n, d).astype(np.float32)).astype(
        jnp.bfloat16
    )
    nk = jnp.asarray((rng.rand(b, n, 2) - 0.5).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, n) > 0.1)
    labels = jnp.asarray(rng.randint(0, 113, (b, n)).astype(np.int32))
    params = rec.init(
        jax.random.PRNGKey(0), descs[:1, :8].astype(jnp.float32),
        nk[:1, :8], mask[:1, :8],
    )["params"]
    # trained weights when present (the r4 bar: parity with REAL weights)
    wpath = os.path.join(repo, "weights", "segnetvit_synthetic.msgpack")
    trained = False
    if os.path.exists(wpath):
        rec_s = SegNetViT(SegNetViTConfig(descriptor_dim=128, n_class=113))
        tmpl = rec_s.init(
            jax.random.PRNGKey(3),
            jnp.zeros((1, 8, 128), jnp.float32),
            jnp.zeros((1, 8, 2), jnp.float32),
        )["params"]
        with open(wpath, "rb") as f:
            loaded = serialization.from_bytes(tmpl, f.read())
        # trained net is 128-d; keep the random 256-d init but splice all
        # shape-compatible leaves so the transformer stack runs trained
        flat_p = jax.tree_util.tree_leaves_with_path(params)
        loaded_map = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(loaded)
        }
        spliced = 0

        def splice(path, leaf):
            nonlocal spliced
            cand = loaded_map.get(jax.tree_util.keystr(path))
            if cand is not None and cand.shape == leaf.shape:
                spliced += 1
                return jnp.asarray(cand)
            return leaf

        params = jax.tree_util.tree_map_with_path(splice, params)
        trained = spliced > 0
    # bf16 compute params like the trainer (masters stay f32 there)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 and a.ndim >= 2
        else a,
        params,
    )

    batch = (descs, nk, mask, labels)
    base = grads_with({}, params, batch)

    out = {"trained_weights_spliced": trained}
    for name, flags in (
        ("attn_bwd", {"PRAM_ATTN_BWD": "1"}),
        ("mlp_bwd", {"PRAM_MLP_BWD": "1"}),
        ("both", {"PRAM_ATTN_BWD": "1", "PRAM_MLP_BWD": "1"}),
    ):
        g = grads_with(flags, params, batch)
        worst = 0.0
        for (pa, a), (_, bb) in zip(
            jax.tree_util.tree_leaves_with_path(base),
            jax.tree_util.tree_leaves_with_path(g),
        ):
            af = np.asarray(a, np.float32)
            bf = np.asarray(bb, np.float32)
            denom = max(np.abs(af).max(), 1e-6)
            worst = max(worst, float(np.abs(af - bf).max() / denom))
        out[f"max_rel_dev_{name}"] = round(worst, 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
