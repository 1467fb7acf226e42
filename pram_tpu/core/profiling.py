"""Profiling hooks: stage timers + jax.profiler traces.

The reference's observability is per-stage wall clock dicts
(loc_by_rec_eval.py:78-84,259-268, frame.py:63-66). Here the same stage-time
dict is a context-manager API, and hardware-level traces come from
``jax.profiler`` (viewable in TensorBoard / Perfetto) — the TPU equivalent
of profiling a CUDA stream.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named stage (feat/rec/loc/ref/total)."""

    def __init__(self):
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, block=None):
        """Time a stage; pass ``block`` (array/pytree) to synchronize on it."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                import jax

                jax.block_until_ready(block)
            self.times[name].append(time.perf_counter() - t0)

    def means_ms(self) -> Dict[str, float]:
        return {
            k: 1000.0 * sum(v) / max(len(v), 1)
            for k, v in self.times.items()
        }

    def summary(self) -> str:
        return ", ".join(
            f"{k}={v:.2f}ms" for k, v in self.means_ms().items()
        )


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
