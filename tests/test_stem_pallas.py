"""Parity of the fused Pallas stem vs the unfused flax XLA path.

The kernel (ops/stem_pallas.py) restructures conv1a+BN+ReLU+conv1b+BN+ReLU
(reference nets/sfd2.py:141-145) into MXU matmuls over a parity-split planar
layout; these tests pin it element-wise to the ConvBNReLU chain on random
weights, including tile boundaries (multi-tile heights) and batch > 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.models.sfd2 import ResNet4x
from pram_tpu.ops.stem_pallas import fold_bn, fused_stem


def _random_stem_params(rng):
    def t(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.5)

    k1, b1 = t(3, 3, 3, 64), t(64)
    bn1 = (t(64) * 0.2 + 1.0, t(64), t(64) * 0.1, jnp.abs(t(64)) + 0.5)
    k2, b2 = t(3, 3, 64, 64) * 0.2, t(64)
    bn2 = (t(64) * 0.2 + 1.0, t(64), t(64) * 0.1, jnp.abs(t(64)) + 0.5)
    return k1, b1, bn1, k2, b2, bn2


def _xla_stem(image, k1, b1, bn1, k2, b2, bn2):
    """Unfused reference: conv+folded-BN+relu twice (pure XLA)."""

    def conv(x, k, b, stride):
        y = jax.lax.conv_general_dilated(
            x, k, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.maximum(y + b, 0.0)

    k1f, b1f = fold_bn(k1, b1, *bn1)
    k2f, b2f = fold_bn(k2, b2, *bn2)
    a = conv(image, k1f, b1f, 1)
    return conv(a, k2f, b2f, 2)


@pytest.mark.parametrize("h,w,b", [(32, 16, 1), (48, 20, 2), (64, 32, 1)])
def test_fused_stem_matches_xla(rng, h, w, b):
    image = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    params = _random_stem_params(rng)
    ref = _xla_stem(image, *params)
    got = fused_stem(image, *params, interpret=True)
    assert got.shape == (b, h // 2, w // 2, 64)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_resnet4x_pallas_stem_matches_module_path(rng):
    """The full model with use_pallas_stem on equals the module path
    (covers the fused stem AND the fused conv3 pair)."""
    import pram_tpu.ops.convpair_pallas as cp
    import pram_tpu.ops.stem_pallas as sp

    image = jnp.asarray(rng.randn(1, 32, 16, 3).astype(np.float32))
    model_off = ResNet4x(use_pallas_stem=False)
    variables = model_off.init(jax.random.PRNGKey(0), image)
    ref = model_off.apply(variables, image)

    # force the pallas paths through the interpreter on CPU
    orig_stem = sp.fused_stem
    orig_pair = cp.fused_conv_pair

    sp.fused_stem = lambda *a, **kw: orig_stem(*a, interpret=True, **kw)
    cp.fused_conv_pair = lambda *a, **kw: orig_pair(*a, interpret=True, **kw)
    try:
        model_on = ResNet4x(use_pallas_stem=True)
        got = model_on.apply(variables, image)
    finally:
        sp.fused_stem = orig_stem
        cp.fused_conv_pair = orig_pair

    for key in ("score_map", "desc_map", "mid_features", "logits"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), rtol=2e-4, atol=2e-4,
            err_msg=key,
        )


def test_fused_stem_rows8_bf16(rng):
    """bf16 selects th=16 whose 36 A-rows run the mixed 4x8 + 1x4 conv1a
    block schedule — the copy-halved path the bench uses at 480x640."""
    import pram_tpu.ops.stem_pallas as sp

    h, w, b = 64, 16, 1  # h2 = 32 -> th = 16 (bf16), schedule 8,8,8,8,4
    image32 = rng.randn(b, h, w, 3).astype(np.float32) * 0.5
    image = jnp.asarray(image32).astype(jnp.bfloat16)
    params = _random_stem_params(rng)
    ref = _xla_stem(image.astype(jnp.float32), *params)
    got = fused_stem(image, *params, interpret=True)
    assert got.shape == (b, h // 2, w // 2, 64)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref),
        rtol=0.1, atol=0.08,  # bf16 conv chain tolerance
    )
