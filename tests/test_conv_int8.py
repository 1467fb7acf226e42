"""Int8 im2col conv kernel (ops/conv_int8_pallas.py) vs the XLA s8 path.

The kernel quantizes its input tile in VMEM with the same static scale and
must reproduce models/sfd2_int8.py:_qlayer (quantize -> s8 conv -> dequant
+ bias + ReLU) exactly in integer space; the float tail differs only by
f32-vs-bf16 rounding of the dequantize.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pram_tpu.ops.conv_int8_pallas import (
    conv3x3_int8,
    conv3x3_int8_supported,
)


def _xla_ref(x, wq, sa, ws, bias, relu):
    """models/sfd2_int8.py:_qlayer semantics, f32 dequantize."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sa), -127, 127).astype(
        jnp.int8
    )
    y = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (sa * ws)[None, None, None, :] + bias[None, None, None, :]
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("cin,cout,relu", [(128, 256, True), (256, 128, False)])
def test_conv3x3_int8_matches_xla(rng, cin, cout, relu):
    b, h, w = 2, 16, 24
    assert conv3x3_int8_supported(h, w, cin, cout)
    x = jnp.asarray(
        np.abs(rng.randn(b, h, w, cin)).astype(np.float32)
    )  # post-ReLU activations are non-negative
    wf = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05
    absmax = np.abs(wf).reshape(-1, cout).max(0)
    ws = np.maximum(absmax, 1e-12) / 127.0
    wq = jnp.asarray(
        np.clip(np.round(wf / ws), -127, 127).astype(np.int8)
    )
    ws = jnp.asarray(ws.astype(np.float32))
    bias = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    sa = float(np.abs(np.asarray(x)).max() / 127.0)

    ref = _xla_ref(x, wq, sa, ws, bias, relu)
    got = conv3x3_int8(
        x, wq, sa, ws, bias, relu=relu, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_int8_traced_scale(rng):
    """in_scale arriving as a traced jnp scalar (qparams leaf) works."""
    b, h, w, cin, cout = 1, 8, 16, 128, 128
    x = jnp.asarray(np.abs(rng.randn(b, h, w, cin)).astype(np.float32))
    wq = jnp.asarray(
        rng.randint(-127, 128, (3, 3, cin, cout)).astype(np.int8)
    )
    ws = jnp.full((cout,), 0.01, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)
    sa = jnp.asarray(float(np.abs(np.asarray(x)).max() / 127.0))

    ref = _xla_ref(x, wq, sa, ws, bias, True)
    got = jax.jit(
        lambda x_, s_: conv3x3_int8(
            x_, wq, s_, ws, bias, relu=True, interpret=True
        )
    )(x, sa)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_supported_gate():
    assert not conv3x3_int8_supported(16, 24, 64, 128)  # thin channels
    assert not conv3x3_int8_supported(12, 24, 128, 128)  # H % 8
    assert not conv3x3_int8_supported(8, 4096, 512, 512)  # VMEM


def _xla_ref_s2(x, wq, sa, ws, bias, relu):
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sa), -127, 127).astype(
        jnp.int8
    )
    y = jax.lax.conv_general_dilated(
        xq, wq, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (sa * ws)[None, None, None, :] + bias[None, None, None, :]
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize(
    "h,w,cin,cout", [(16, 24, 128, 128), (24, 40, 256, 256), (8, 16, 128, 256)]
)
def test_conv3x3s2_int8_matches_xla(rng, h, w, cin, cout):
    from pram_tpu.ops.conv_int8_pallas import (
        conv3x3s2_int8,
        conv3x3s2_int8_supported,
    )

    assert conv3x3s2_int8_supported(h, w, cin, cout)
    b = 2
    x = jnp.asarray(np.abs(rng.randn(b, h, w, cin)).astype(np.float32))
    wf = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05
    absmax = np.abs(wf).reshape(-1, cout).max(0)
    ws = np.maximum(absmax, 1e-12) / 127.0
    wq = jnp.asarray(np.clip(np.round(wf / ws), -127, 127).astype(np.int8))
    ws = jnp.asarray(ws.astype(np.float32))
    bias = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    sa = float(np.abs(np.asarray(x)).max() / 127.0)

    ref = _xla_ref_s2(x, wq, sa, ws, bias, True)
    got = conv3x3s2_int8(x, wq, sa, ws, bias, relu=True, interpret=True)
    assert got.shape == ref.shape == (b, h // 2, w // 2, cout)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_s2_supported_gate():
    from pram_tpu.ops.conv_int8_pallas import conv3x3s2_int8_supported

    assert conv3x3s2_int8_supported(240, 320, 128, 128)  # conv2b @480x640
    assert conv3x3s2_int8_supported(120, 160, 256, 256)  # convPa_0
    assert not conv3x3s2_int8_supported(16, 23, 128, 128)  # odd W
    assert not conv3x3s2_int8_supported(16, 24, 64, 128)  # thin channels
