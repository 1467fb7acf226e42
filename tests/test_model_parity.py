"""Parity tests: flax models + weight converters == torch reference math.

Random-initialized torch mirrors (tests/torch_mirrors.py, same state_dict
layout as the reference checkpoints) are converted with
pram_tpu.models.convert and must produce the same outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_mirrors import TorchGML, TorchSFD2, TorchSegNetViT

from pram_tpu.models.convert import (
    convert_gml,
    convert_segnetvit,
    convert_sfd2,
)
from pram_tpu.models.gml import GML, GMLConfig
from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig


def state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_segnetvit_parity(rng):
    torch.manual_seed(0)
    n_layers, n_class = 3, 17
    tmodel = TorchSegNetViT(n_layers=n_layers, n_class=n_class).eval()
    desc = rng.randn(2, 64, 256).astype(np.float32)
    nk = (rng.rand(2, 64, 2) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(desc), torch.from_numpy(nk)).numpy()

    cfg = SegNetViTConfig(n_layers=n_layers, n_class=n_class)
    model = SegNetViT(cfg)
    variables = convert_segnetvit(state_dict_np(tmodel), n_layers=n_layers)
    out = model.apply(variables, jnp.asarray(desc), jnp.asarray(nk))
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref, atol=2e-4, rtol=1e-4
    )


def test_segnetvit_mask_equals_unpadded(rng):
    torch.manual_seed(1)
    n_layers, n_class, n = 2, 9, 40
    tmodel = TorchSegNetViT(n_layers=n_layers, n_class=n_class).eval()
    variables = convert_segnetvit(state_dict_np(tmodel), n_layers=n_layers)
    cfg = SegNetViTConfig(n_layers=n_layers, n_class=n_class)
    model = SegNetViT(cfg)

    desc = rng.randn(1, n, 256).astype(np.float32)
    nk = (rng.rand(1, n, 2) * 2 - 1).astype(np.float32)
    out_small = model.apply(variables, jnp.asarray(desc), jnp.asarray(nk))

    npad = 64
    desc_p = np.concatenate(
        [desc, rng.randn(1, npad - n, 256).astype(np.float32)], axis=1
    )
    nk_p = np.concatenate(
        [nk, (rng.rand(1, npad - n, 2) * 2 - 1).astype(np.float32)], axis=1
    )
    mask = np.zeros((1, npad), bool)
    mask[:, :n] = True
    out_pad = model.apply(
        variables, jnp.asarray(desc_p), jnp.asarray(nk_p), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(out_pad["prediction"])[:, :n],
        np.asarray(out_small["prediction"]),
        atol=1e-4,
        rtol=1e-4,
    )


def test_gml_parity(rng):
    torch.manual_seed(2)
    n_layers = 2
    tmodel = TorchGML(n_layers=n_layers).eval()
    d0 = rng.randn(1, 32, 128).astype(np.float32)
    d1 = rng.randn(1, 48, 128).astype(np.float32)
    nk0 = (rng.rand(1, 32, 2) * 2 - 1).astype(np.float32)
    nk1 = (rng.rand(1, 48, 2) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        ref_plan = tmodel(
            torch.from_numpy(d0),
            torch.from_numpy(d1),
            torch.from_numpy(nk0),
            torch.from_numpy(nk1),
        ).numpy()

    model = GML(GMLConfig(n_layers=n_layers))
    variables = convert_gml(state_dict_np(tmodel), n_layers=n_layers)
    out = model.apply(
        variables,
        jnp.asarray(d0),
        jnp.asarray(d1),
        jnp.asarray(nk0),
        jnp.asarray(nk1),
    )
    np.testing.assert_allclose(
        np.asarray(out["plan"]), ref_plan, atol=2e-4, rtol=1e-3
    )


def test_sfd2_parity(rng):
    torch.manual_seed(3)
    tmodel = TorchSFD2().eval()
    img = rng.rand(1, 3, 64, 80).astype(np.float32)
    with torch.no_grad():
        score_t, desc_t, mid_t = tmodel(torch.from_numpy(img))

    from pram_tpu.models.sfd2 import ResNet4x

    model = ResNet4x()
    variables = convert_sfd2(state_dict_np(tmodel))
    out = model.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out["score_map"]), score_t.numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["desc_map"]),
        desc_t.numpy().transpose(0, 2, 3, 1),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["mid_features"]),
        mid_t.numpy().transpose(0, 2, 3, 1),
        atol=1e-3,
    )


def test_sfd2_extract_shapes(rng):
    from pram_tpu.models.sfd2 import ResNet4x, extract

    model = ResNet4x()
    img = jnp.asarray(rng.rand(1, 64, 80, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = extract(model, variables, img, max_keypoints=256, conf_th=1e-4)
    assert out["keypoints"].xy.shape == (1, 256, 2)
    assert out["descriptors"].shape == (1, 256, 128)
    assert out["seg_descriptors"].shape == (1, 256, 256)
    # descriptors of valid keypoints are unit-norm
    mask = np.asarray(out["keypoints"].mask[0])
    if mask.any():
        norms = np.linalg.norm(np.asarray(out["descriptors"][0])[mask], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_adagml_smoke(rng):
    from pram_tpu.models.adagml import AdaGML, AdaGMLConfig

    cfg = AdaGMLConfig(n_layers=2, n_min_tokens=8)
    model = AdaGML(cfg)
    d0 = jnp.asarray(rng.randn(1, 24, 128).astype(np.float32))
    d1 = jnp.asarray(rng.randn(1, 24, 128).astype(np.float32))
    nk0 = jnp.asarray((rng.rand(1, 24, 2) * 2 - 1).astype(np.float32))
    nk1 = jnp.asarray((rng.rand(1, 24, 2) * 2 - 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), d0, d1, nk0, nk1)
    out = model.apply(variables, d0, d1, nk0, nk1)
    assert out["plan"].shape == (1, 25, 25)
    # plan mass on masked-out tokens must be ~0
    m0 = np.asarray(out["mask0"][0])
    plan = np.asarray(out["plan"][0])
    if (~m0).any():
        assert plan[:-1][~m0].max() < 1e-5


def test_gm_smoke(rng):
    from pram_tpu.models.gm import GM, GMConfig

    model = GM(GMConfig(n_layers=2))
    d0 = jnp.asarray(rng.randn(1, 16, 128).astype(np.float32))
    d1 = jnp.asarray(rng.randn(1, 20, 128).astype(np.float32))
    nk0 = jnp.asarray((rng.rand(1, 16, 2) * 2 - 1).astype(np.float32))
    nk1 = jnp.asarray((rng.rand(1, 20, 2) * 2 - 1).astype(np.float32))
    s0 = jnp.asarray(rng.rand(1, 16).astype(np.float32))
    s1 = jnp.asarray(rng.rand(1, 20).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), d0, d1, nk0, nk1, s0, s1)
    out = model.apply(variables, d0, d1, nk0, nk1, s0, s1)
    assert out["plan"].shape == (1, 17, 21)


def test_nn_matcher(rng):
    from pram_tpu.models.nn_matcher import mutual_nn_match

    d = rng.randn(1, 10, 32).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    perm = rng.permutation(10)
    d1 = d[:, perm]
    res = mutual_nn_match(jnp.asarray(d), jnp.asarray(d1))
    m0 = np.asarray(res.matches0[0])
    # matching a permuted copy of itself recovers the permutation
    inv = np.empty(10, int)
    inv[perm] = np.arange(10)
    np.testing.assert_array_equal(m0, inv)
