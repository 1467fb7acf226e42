"""Augmented training step: frozen extractor inside the compiled step.

Rebuild of Trainer.preprocess_input (trainer.py:96-130): the reference
re-extracts recognition-token descriptors each step by running the *frozen*
SFD2 on (photometrically jittered) images and resampling descriptors at the
dataset keypoints. Here that whole augmentation — jitter, frozen forward,
bilinear resampling, recognition forward, loss, grads — is ONE jit-compiled
function; the extractor's parameters sit behind stop_gradient so only the
recognition head trains (matching the reference's .eval() + no_grad frozen
net).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from pram_tpu.models.sfd2 import preprocess_image
from pram_tpu.ops.sampling import sample_descriptors
from pram_tpu.train.losses import seg_accuracy, seg_loss_weighted
from pram_tpu.train.trainer import TrainConfig, TrainState, lr_schedule, make_optimizer


def photometric_jitter(key, images, brightness=0.5, contrast=0.5):
    """Per-image brightness/contrast jitter (basicdataset.py:299-302: the
    cv2.addWeighted formulation img*contrast + brightness, clipped)."""
    b, h, w, c = images.shape
    kb, kc = jax.random.split(key)
    delta_b = jax.random.uniform(
        kb, (b, 1, 1, 1), minval=-brightness, maxval=brightness
    )
    factor_c = 1.0 + jax.random.uniform(
        kc, (b, 1, 1, 1), minval=-contrast, maxval=contrast
    )
    return jnp.clip(images * factor_c + delta_b, 0.0, 1.0)


def make_augmented_train_step(
    rec_model,
    extractor_model,
    extractor_vars,
    cfg: TrainConfig,
    mesh=None,
    use_mid_feature: bool = True,
    norm_desc: bool = False,
    jitter_brightness: float = 0.5,
    jitter_contrast: float = 0.5,
    compute_dtype=None,
):
    """Train step over raw images + dataset keypoints.

    Batch dict: ``image [B,H,W,3]`` in [0,1] (H, W divisible by 8),
    ``keypoints [B,N,2]``, ``norm_keypoints [B,N,2]``, ``gt_seg [B,N]``,
    ``mask [B,N]``.

    ``compute_dtype``: mixed-precision training — parameters/optimizer stay
    f32 masters, the recognition forward+backward run with activations and
    param casts in this dtype (bf16 on TPU halves the matmul cost and lets
    the fused attention/MLP kernels carry the training forward via their
    custom-VJP wrappers, ops/train_vjp.py); loss/softmax stay f32.
    """
    tx = make_optimizer(cfg)
    frozen_vars = jax.tree_util.tree_map(
        jax.lax.stop_gradient, extractor_vars
    )

    # run the frozen extractor in its parameter dtype (bf16 extractors are
    # the TPU default; convs require matching operand dtypes). Mixed-dtype
    # checkpoints (f32 BN stats next to bf16 conv kernels) mean the FIRST
    # leaf can lie — take the dtype from a conv-kernel-shaped leaf
    # (ndim >= 2) instead (ADVICE r3 #5).
    # (and int8 extractors carry s8 kernels + float scales: only FLOAT
    # conv-kernel-shaped leaves can vote — the image must enter in the
    # stem's float dtype either way)
    _leaves = jax.tree_util.tree_leaves(extractor_vars)
    _extractor_dtype = next(
        (
            l.dtype
            for l in _leaves
            if getattr(l, "ndim", 0) >= 2
            and jnp.issubdtype(l.dtype, jnp.floating)
        ),
        _leaves[0].dtype,
    )

    def descriptors_from_images(key, images, kpts):
        images = photometric_jitter(
            key, images, jitter_brightness, jitter_contrast
        )
        out = extractor_model.apply(
            frozen_vars,
            preprocess_image(images).astype(_extractor_dtype),
        )
        fmap = out["mid_features"] if use_mid_feature else out["desc_map"]

        def per_image(k, f):
            return sample_descriptors(
                k, jnp.transpose(f, (2, 0, 1)), 4, normalize=norm_desc
            )

        return jax.vmap(per_image)(kpts, fmap)

    def loss_fn(params, key, batch):
        descs = descriptors_from_images(
            key, batch["image"], batch["keypoints"]
        )
        descs = jax.lax.stop_gradient(descs)
        nk = batch["norm_keypoints"]
        if compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype)
                if a.dtype == jnp.float32
                else a,
                params,
            )
            descs = descs.astype(compute_dtype)
            nk = nk.astype(compute_dtype)
        out = rec_model.apply(
            {"params": params},
            descs,
            nk,
            batch.get("mask"),
        )
        logits = out["prediction"].astype(jnp.float32)
        loss = seg_loss_weighted(
            logits, batch["gt_seg"], batch.get("mask"),
            weight_background=cfg.weight_background,
        )
        corr, incorr = seg_accuracy(logits, batch["gt_seg"], batch.get("mask"))
        return loss, {"loss": loss, "acc_corr": corr, "acc_incorr": incorr}

    def step(state: TrainState, key, batch: Dict[str, jax.Array]):
        # the recognition model differentiates through the fused kernels via
        # their custom-VJP wrappers (ops/train_vjp.py): kernel forward,
        # recompute-XLA backward. The frozen SFD2 forward carries no
        # tangents (stop_gradient'ed params), so its fused stem/NMS kernels
        # are untouched primal ops.
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, key, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["lr"] = lr_schedule(cfg)(state.iteration)
        return (
            state.replace(
                params=params, opt_state=opt_state,
                iteration=state.iteration + 1,
            ),
            metrics,
        )

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
