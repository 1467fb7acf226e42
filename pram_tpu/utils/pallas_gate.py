"""Process-wide trace-time kill switch for every Pallas kernel gate.

Why this exists: FLOP accounting (utils/flops.compiled_flops) lowers the
traced program for the CPU backend, where the client-side
``lowered.cost_analysis()`` counts every dot/conv correctly. The chip
PJRT plugin's cost analysis silently drops the attention ``N x N``
matmuls — measured r5: 31.7 vs 355.9 GF/frame on the 4096-token
recognizer twin, an 11x undercount — and Pallas custom calls are opaque
to it anyway. But Mosaic kernels refuse to even LOWER for CPU ("Only
interpret mode is supported on CPU backend"), so the flop-twin trace
needs a way to force every kernel gate to its XLA fallback — including
gates that check ``jax.default_backend() == "tpu"``, which stays true in
the chip process while lowering for CPU.

The flag is read at TRACE time (the same contract as
``models/common.fused_attention_disabled``): wrap the ``.lower()`` /
``model.apply`` call, not the executed computation.
"""

_DISABLED = False


class pallas_disabled:
    """Context manager: every Pallas gate returns False while tracing."""

    def __enter__(self):
        global _DISABLED
        self._prev = _DISABLED
        _DISABLED = True
        return self

    def __exit__(self, *exc):
        global _DISABLED
        _DISABLED = self._prev
        return False


def pallas_ok() -> bool:
    """False inside a ``pallas_disabled()`` block."""
    return not _DISABLED


def tpu_pallas_ok() -> bool:
    """The standard Pallas gate: on a TPU backend and not force-disabled."""
    if _DISABLED:
        return False
    import jax

    return jax.default_backend() == "tpu"
