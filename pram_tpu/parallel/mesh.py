"""Mesh construction and sharding helpers.

TPU-native replacement of the reference's NCCL process-group setup
(train.py:64-68: hardcoded localhost master, one process per GPU via
mp.spawn). On TPU: one process per host, ``jax.distributed.initialize()``
discovers peers from the runtime environment, and parallelism is expressed
as a jax.sharding.Mesh — DP over the 'data' axis is the first-class strategy
(the reference's only one, SURVEY.md §2.3); the mesh helper also supports a
trailing 'model' axis for sharding large recognition heads (an extension
beyond reference parity, used by shard_params_for_model_axis).

Collectives ride ICI inside a slice and DCN across slices automatically via
XLA's SPMD partitioner — there are no explicit NCCL calls to translate.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host init (no-op single-host). Safe to call repeatedly.

    Must run before anything initializes the XLA backend — so the
    already-initialized check inspects jax's distributed client state
    instead of calling jax.process_count() (which would itself initialize
    the backend and make jax.distributed.initialize impossible; caught by
    tests/test_multihost.py).
    """
    if coordinator_address is None and num_processes in (None, 1):
        return
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized (by us or the runtime)
    except Exception:
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # belt-and-braces for the documented safe-to-call-repeatedly
        # contract: if the private global_state probe above ever stops
        # working (jax._src move), the already-initialized case must still
        # be a no-op rather than a crash (ADVICE r3 #4)
        if "already initialized" not in str(e).lower():
            raise


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """('data',) or ('data', 'model') mesh over the given/all devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if data is None:
        data = devs.size // model
    assert data * model <= devs.size, (
        f"mesh {data}x{model} needs {data * model} devices, have {devs.size}"
    )
    devs = devs[: data * model].reshape(data, model)
    if model == 1:
        return Mesh(devs[:, 0], axis_names=("data",))
    return Mesh(devs, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over 'data' (per-device batch slices)."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Place a host batch onto the mesh, sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def shard_params_for_model_axis(mesh: Mesh, variables, min_size: int = 4096):
    """Tensor-parallel parameter placement over the mesh's 'model' axis.

    An extension beyond reference parity (the reference is DP-only,
    SURVEY.md §2.3), for recognition heads too large to replicate — e.g. an
    Aachen-scale seg head or a much wider hidden dim. Every 2D kernel whose
    output dim divides the 'model' axis (and is worth sharding) is placed
    column-sharded; everything else replicates. Under jit, XLA's SPMD
    partitioner propagates the shardings through the matmuls and inserts
    the all-gathers/reduces over ICI — outputs are bit-equal to the
    replicated forward (tests/test_model_axis.py).

    For the explicit formulation — head-sharded attention + sharded seg
    head under shard_map with a known, HLO-asserted collective schedule —
    see parallel/tp.py.
    """
    assert "model" in mesh.axis_names, "mesh has no 'model' axis"
    msize = mesh.shape["model"]
    col = NamedSharding(mesh, P(None, "model"))
    repl = NamedSharding(mesh, P())

    def place(x):
        if (
            hasattr(x, "ndim") and x.ndim == 2
            and x.shape[-1] % msize == 0 and x.size >= min_size
        ):
            return jax.device_put(x, col)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, variables)
