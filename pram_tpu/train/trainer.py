"""Data-parallel recognition trainer (pjit over a device mesh).

TPU-native rebuild of the reference Trainer (trainer.py:26-404) and its DDP
harness (train.py:64-108): instead of NCCL process groups + DistributedDataParallel,
the train step is one jit-compiled function whose batch is sharded over the
``data`` axis of a jax.sharding.Mesh and whose parameters are replicated —
XLA inserts the gradient all-reduce over ICI automatically. SyncBatchNorm is
unnecessary (the recognition models are norm-free across the batch).

Matched semantics:
- AdamW + manual exponential LR decay with floor:
  lr(it) = clip(lr * decay_rate^(it - decay_iter), min_lr, lr)
  (trainer.py:199-205)
- background-weighted seg CE (trainer.py:154, tools/metrics.py:131)
- per-epoch checkpoint with {epoch, iteration, model, min_loss} + best copy
  (trainer.py:379-399) via Orbax
- optional on-the-fly descriptor augmentation through the frozen extractor
  (trainer.py:96-130) as a jit preprocessing stage
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pram_tpu.train.losses import seg_accuracy, seg_loss_weighted


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference configs/config_train_*_sfd2.yaml)."""

    lr: float = 1e-4
    min_lr: float = 1e-5
    decay_rate: float = 0.999992
    decay_iter: int = 300000
    weight_decay: float = 0.01
    epochs: int = 200
    its_per_epoch: int = 1000
    batch_size: int = 32
    weight_background: float = 0.1
    seed: int = 0


class TrainState(struct.PyTreeNode):
    """Carried training state (the semantic fields of the reference
    checkpoint: epoch/iteration/model/min_loss, trainer.py:379-399)."""

    params: Any
    opt_state: Any
    iteration: jax.Array  # int32
    epoch: jax.Array  # int32
    min_loss: jax.Array  # f32


def lr_schedule(cfg: TrainConfig) -> Callable[[jax.Array], jax.Array]:
    """clip(lr * decay_rate^(it - decay_iter), min_lr, lr) — trainer.py:199-205."""

    def fn(it):
        lr = cfg.lr * cfg.decay_rate ** (it.astype(jnp.float32) - cfg.decay_iter)
        return jnp.clip(lr, cfg.min_lr, cfg.lr)

    return fn


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=lr_schedule(cfg), weight_decay=cfg.weight_decay
    )


def make_train_step(
    model,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    sharded_params: bool = False,
    apply_fn: Optional[Callable[[Any, Dict[str, jax.Array]], jax.Array]] = None,
):
    """Build the jit-compiled DP train step.

    Batch dict: ``seg_descriptors [B,N,D]``, ``norm_keypoints [B,N,2]``,
    ``gt_seg [B,N]``, ``mask [B,N]`` — the arrays BasicDataset emits
    (dataset/basicdataset.py:167-330), already padded/fixed-shape.

    With a mesh, batches are sharded over the ``data`` axis and parameters
    replicated; XLA's SPMD partitioner inserts the gradient all-reduce.

    With ``sharded_params=True`` (a ('data','model') mesh and a state from
    ``init_train_state(..., mesh=mesh, param_specs=...)``), parameters AND
    their Adam moments stay model-axis-sharded through the step: the jit
    follows the state's input shardings instead of forcing replication, so
    a head too large to replicate trains with 1/msize of its params +
    optimizer state per device (tests/test_model_axis.py).

    ``apply_fn(params, batch) -> logits`` replaces the default
    ``model.apply`` forward — the hook the SP/PP trainer integrations use
    (parallel/tp.py:trainer_parallel_setup): the shard_map forward sits
    inside the differentiated loss, loss/optimizer semantics unchanged
    (tests/test_train_parallel.py pins step-for-step parity).
    """
    tx = make_optimizer(cfg)

    def loss_fn(params, batch):
        if apply_fn is not None:
            logits = apply_fn(params, batch)
        else:
            out = model.apply(
                {"params": params},
                batch["seg_descriptors"],
                batch["norm_keypoints"],
                batch.get("mask"),
            )
            logits = out["prediction"]
        loss = seg_loss_weighted(
            logits,
            batch["gt_seg"],
            batch.get("mask"),
            weight_background=cfg.weight_background,
        )
        corr, incorr = seg_accuracy(logits, batch["gt_seg"], batch.get("mask"))
        return loss, {"loss": loss, "acc_corr": corr, "acc_incorr": incorr}

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        # the recognizers' fused attention/MLP kernels differentiate via
        # their custom-VJP wrappers (kernel forward, recompute-XLA
        # backward, ops/train_vjp.py) — no XLA-only override needed
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch)
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            iteration=state.iteration + 1,
        )
        metrics["lr"] = lr_schedule(cfg)(state.iteration)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    data = NamedSharding(mesh, P("data"))
    if sharded_params:
        # follow the state's own (model-axis) shardings; only pin the batch
        return jax.jit(
            step,
            in_shardings=(None, data),
            donate_argnums=(0,) if donate else (),
        )
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def init_train_state(
    model, cfg: TrainConfig, example_batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
    param_specs: Any = None,
    params_transform: Optional[Callable[[Any], Any]] = None,
) -> TrainState:
    """Fresh TrainState; with ``mesh`` + ``param_specs`` (a PartitionSpec
    pytree matching params, e.g. parallel/tp.py:segnetvit_tp_specs),
    parameters are placed model-axis-sharded and the Adam moments inherit
    the sharding through ``tx.init`` (zeros_like preserves placement).

    ``params_transform`` reshapes the freshly-initialized params before
    placement (the PP integration stacks per-layer params onto a leading
    layer axis, parallel/tp.py:make_pp_train_setup); ``param_specs`` may
    then be a callable evaluated on the transformed tree."""
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    variables = model.init(
        rng,
        example_batch["seg_descriptors"],
        example_batch["norm_keypoints"],
        example_batch.get("mask"),
    )
    params = variables["params"]
    if params_transform is not None:
        params = params_transform(params)
    if callable(param_specs):
        param_specs = param_specs(params)
    if mesh is not None and param_specs is not None:
        params = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params,
            param_specs,
        )
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        iteration=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        min_loss=jnp.asarray(jnp.inf, jnp.float32),
    )


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over local devices (reference DDP parity)."""
    devs = np.asarray(jax.devices()[:n_devices] if n_devices else jax.devices())
    return Mesh(devs, axis_names=("data",))


class Trainer:
    """Epoch-loop trainer with Orbax checkpointing and text/TB-style logging.

    The shape of the loop mirrors Trainer.train/process_epoch
    (trainer.py:132-253,353-404); host-side concerns (logging cadence,
    checkpoint layout, best-copy, resume) carry the same semantics.
    """

    def __init__(
        self,
        model,
        cfg: TrainConfig,
        example_batch,
        save_dir: Optional[str] = None,
        mesh: Optional[Mesh] = None,
        log_fn: Callable[[str], None] = print,
        param_specs: Any = None,
        apply_fn: Optional[Callable] = None,
        params_transform: Optional[Callable] = None,
    ):
        """``param_specs`` (with a ('data','model') mesh): PartitionSpec
        pytree for model-axis-sharded params + optimizer state (e.g.
        parallel/tp.py:segnetvit_tp_specs). ``apply_fn`` /
        ``params_transform``: the SP/PP trainer hooks
        (parallel/tp.py:trainer_parallel_setup) — see make_train_step /
        init_train_state."""
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.save_dir = save_dir
        self.log_fn = log_fn
        self.state = init_train_state(
            model, cfg, example_batch, mesh=mesh, param_specs=param_specs,
            params_transform=params_transform,
        )
        self.step_fn = make_train_step(
            model, cfg, mesh, sharded_params=param_specs is not None,
            apply_fn=apply_fn,
        )
        self._ckptr = None
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()

    # -- checkpointing (trainer.py:45-57,379-399 semantics)
    def save_checkpoint(self, tag: str = None):
        if self._ckptr is None:
            return
        epoch = int(self.state.epoch)
        name = tag or f"epoch_{epoch:04d}"
        path = os.path.abspath(os.path.join(self.save_dir, name))
        self._ckptr.save(path, self.state, force=True)
        self._ckptr.wait_until_finished()

    def restore_checkpoint(self, path: str):
        self.state = self._ckptr.restore(
            os.path.abspath(path), self.state
        )

    def process_epoch(self, batch_iter) -> Dict[str, float]:
        """One epoch over an iterator of host batches; returns mean metrics."""
        agg: Dict[str, list] = {}
        for bidx, batch in enumerate(batch_iter):
            self.state, metrics = self.step_fn(self.state, batch)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(float(v))
        means = {k: float(np.mean(v)) for k, v in agg.items()}
        self.log_fn(
            "Epoch [{:d}/{:d}] loss {:.4f} acc_corr {:.4f} acc_incorr {:.4f}".format(
                int(self.state.epoch), self.cfg.epochs,
                means.get("loss", float("nan")),
                means.get("acc_corr", float("nan")),
                means.get("acc_incorr", float("nan")),
            )
        )
        return means

    def train(self, epoch_batches: Callable[[int], Any]):
        """Full loop: ``epoch_batches(epoch)`` yields an epoch's batches."""
        start = int(self.state.epoch)
        for epoch in range(start, self.cfg.epochs):
            means = self.process_epoch(epoch_batches(epoch))
            self.state = self.state.replace(epoch=self.state.epoch + 1)
            loss = means.get("loss", float("inf"))
            if np.isfinite(loss):
                if loss < float(self.state.min_loss):
                    self.state = self.state.replace(
                        min_loss=jnp.asarray(loss, jnp.float32)
                    )
                    self.save_checkpoint("best")
                self.save_checkpoint()
            else:
                # NaN/inf epoch skip hook (trainer.py:367-369)
                self.log_fn(f"skip checkpoint at epoch {epoch}: loss={loss}")
