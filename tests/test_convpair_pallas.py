"""Parity of the fused conv-pair kernel vs the unfused XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.ops.convpair_pallas import fused_conv_pair
from pram_tpu.ops.stem_pallas import fold_bn


def _params(rng, cin, cmid, cout):
    def t(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)

    k1, b1 = t(3, 3, cin, cmid), t(cmid)
    bn1 = (t(cmid) * 0.2 + 1.0, t(cmid), t(cmid) * 0.1,
           jnp.abs(t(cmid)) + 0.5)
    k2, b2 = t(3, 3, cmid, cout) * 0.5, t(cout)
    bn2 = (t(cout) * 0.2 + 1.0, t(cout), t(cout) * 0.1,
           jnp.abs(t(cout)) + 0.5)
    return k1, b1, bn1, k2, b2, bn2


def _xla_pair(x, k1, b1, bn1, k2, b2, bn2):
    def conv(x, k, b):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.maximum(y + b, 0.0)

    k1f, b1f = fold_bn(k1, b1, *bn1)
    k2f, b2f = fold_bn(k2, b2, *bn2)
    return conv(conv(x, k1f, b1f), k2f, b2f)


@pytest.mark.parametrize("h,w,b", [(24, 12, 1), (48, 20, 2)])
def test_fused_conv_pair_matches_xla(rng, h, w, b):
    cin, cmid, cout = 8, 16, 24  # small dims for the interpreter
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    params = _params(rng, cin, cmid, cout)
    ref = _xla_pair(x, *params)
    got = fused_conv_pair(x, *params, interpret=True)
    assert got.shape == (b, h, w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_conv_pair_bf16_shifted_path(rng):
    """bf16 selects the pre-shifted gather buffers; results match f32 XLA
    at bf16 tolerance."""
    cin, cmid, cout = 8, 16, 24
    x32 = rng.randn(2, 24, 12, cin).astype(np.float32) * 0.5
    params = _params(rng, cin, cmid, cout)
    ref = _xla_pair(jnp.asarray(x32), *params)
    got = fused_conv_pair(
        jnp.asarray(x32).astype(jnp.bfloat16), *params, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=0.1, atol=0.05
    )
