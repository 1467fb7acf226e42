"""Int8 SFD2 inference path: BN-fold exactness + quantization error bounds.

On-hardware speed/recall for this path is measured by scripts/exp_int8.py
(the rendered guard is the correctness gate); these tests pin the numerics
on CPU: folding BN must be exact, and int8 with calibrated scales must stay
within tight error bounds of the float model on in-distribution inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pram_tpu.models.sfd2 import ResNet4x
from pram_tpu.models.sfd2_int8 import quantize_extractor


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    model = ResNet4x(use_pallas_stem=False)
    img = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    # give batch_stats non-trivial values so BN folding is actually tested
    variables = jax.device_get(variables)
    stats = variables["batch_stats"]

    # gentle perturbation: large mean shifts kill every ReLU and the float
    # model itself degenerates to zeros (making the comparison vacuous)
    def perturb(t):
        return jax.tree_util.tree_map(
            lambda a: a + rng.randn(*a.shape).astype(np.float32) * 0.02, t
        )

    variables = {
        "params": variables["params"],
        "batch_stats": perturb(stats),
    }
    int8_model, qparams = quantize_extractor(model, variables, img)
    return model, variables, int8_model, qparams, img


def test_outputs_close_to_float(setup):
    model, variables, int8_model, qparams, img = setup
    ref = model.apply(variables, img)
    out = int8_model.apply(qparams, img)
    assert set(out) == set(ref)
    # descriptors: unit-norm, compare by cosine
    cos = (
        np.asarray(ref["desc_map"], np.float32)
        * np.asarray(out["desc_map"], np.float32)
    ).sum(-1)
    assert cos.min() > 0.995
    # score map correlation (softmax output, small dynamic range)
    a = np.asarray(ref["score_map"], np.float32).ravel()
    b = np.asarray(out["score_map"], np.float32).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.995
    assert np.abs(a - b).max() < 5e-3


def test_weights_are_int8(setup):
    _, _, _, qparams, _ = setup
    qp = qparams["int8"]
    int8_keys = [k for k in qp if k.endswith("_wq")]
    assert len(int8_keys) == 17  # 4 backbone + 9 res-block + 4 head convs
    for k in int8_keys:
        v = qp[k]
        leaves = v if isinstance(v, list) else [v]
        for leaf in leaves:
            assert leaf.dtype == jnp.int8


def test_mid_features_feed_recognition(setup):
    """seg_descriptors (mid_features) must come out at the stride-4 grid
    with 256 channels, matching what `extract` samples for recognition."""
    _, _, int8_model, qparams, img = setup
    out = int8_model.apply(qparams, img)
    b, h, w, _ = img.shape
    assert out["mid_features"].shape == (b, h // 4, w // 4, 256)
    assert out["desc_map"].shape == (b, h // 4, w // 4, 128)
    assert out["score_map"].shape == (b, h, w)


def test_conv_kernel_path_matches_xla_int8(setup, monkeypatch):
    """PRAM_INT8_CONV=1 routes the stride-1 C>=128 convs through the
    Pallas im2col s8 kernel (interpret-forced on CPU); same quantized
    configuration, near-identical output to the XLA s8 path."""
    from pram_tpu.ops import conv_int8_pallas as cip

    _, _, int8_model, qparams, img = setup
    ref = int8_model.apply(qparams, img)

    monkeypatch.setenv("PRAM_INT8_CONV", "1")
    monkeypatch.setattr(cip, "_INTERPRET", True)
    out = int8_model.apply(qparams, img)

    # the kernel divides by the scale exactly like the XLA path, so the
    # two int8 paths quantize bit-identically; remaining differences are
    # only the f32-vs-compute-dtype dequantize tail
    np.testing.assert_allclose(
        np.asarray(out["desc_map"]), np.asarray(ref["desc_map"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["score_map"]), np.asarray(ref["score_map"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["mid_features"]), np.asarray(ref["mid_features"]),
        rtol=1e-4, atol=1e-4,
    )


def test_conv_kernel_path_close_to_float(setup, monkeypatch):
    from pram_tpu.ops import conv_int8_pallas as cip

    model, variables, int8_model, qparams, img = setup
    ref = model.apply(variables, img)
    monkeypatch.setenv("PRAM_INT8_CONV", "1")
    monkeypatch.setattr(cip, "_INTERPRET", True)
    out = int8_model.apply(qparams, img)
    cos = (
        np.asarray(ref["desc_map"], np.float32)
        * np.asarray(out["desc_map"], np.float32)
    ).sum(-1)
    assert cos.min() > 0.995
    a = np.asarray(ref["score_map"], np.float32).ravel()
    b = np.asarray(out["score_map"], np.float32).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.995
    assert np.abs(a - b).max() < 5e-3
