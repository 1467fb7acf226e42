"""Mixed-precision helpers.

TPU compute runs fastest in bfloat16 on the MXU; geometry (keypoint
coordinates, Sinkhorn marginals, PnP) stays float32. The models in this
package accumulate matmuls in f32 (preferred_element_type) so casting the
parameter tree + activations to bf16 is sufficient and keeps checkpoints in
f32 on disk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_variables(tree, dtype=jnp.bfloat16):
    """Cast all float32 leaves of a variable tree to ``dtype``."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        tree,
    )


def cast_inputs(tree, dtype=jnp.bfloat16):
    """Cast float arrays in an input pytree (dicts/tuples) to ``dtype``."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )
