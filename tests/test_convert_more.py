"""Converter parity for SuperPoint and AdaGML (random-weight torch mirrors)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_mirrors import TorchAdaGML, TorchSuperPoint

from pram_tpu.models.adagml import AdaGML, AdaGMLConfig
from pram_tpu.models.convert import convert_adagml, convert_superpoint
from pram_tpu.models.superpoint import SuperPoint


def state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_superpoint_parity(rng):
    torch.manual_seed(5)
    tmodel = TorchSuperPoint().eval()
    img = rng.rand(1, 1, 64, 80).astype(np.float32)
    with torch.no_grad():
        score_t, desc_t, mid_t = tmodel(torch.from_numpy(img))

    model = SuperPoint()
    variables = convert_superpoint(state_dict_np(tmodel))
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


def test_adagml_converter_parity_no_pruning(rng):
    """With adaptive pruning disabled, the converted AdaGML's plan equals the
    torch mirror's full-path plan (validates all converted weights incl. the
    pooling heads loading without error)."""
    torch.manual_seed(6)
    n_layers = 2
    tmodel = TorchAdaGML(n_layers=n_layers).eval()
    d0 = rng.randn(1, 24, 128).astype(np.float32)
    d1 = rng.randn(1, 32, 128).astype(np.float32)
    nk0 = (rng.rand(1, 24, 2) * 2 - 1).astype(np.float32)
    nk1 = (rng.rand(1, 32, 2) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        ref_plan = tmodel(
            torch.from_numpy(d0), torch.from_numpy(d1),
            torch.from_numpy(nk0), torch.from_numpy(nk1),
        ).numpy()

    cfg = AdaGMLConfig(n_layers=n_layers, adaptive=False)
    model = AdaGML(cfg)
    variables = convert_adagml(state_dict_np(tmodel), n_layers=n_layers)
    out = model.apply(
        variables,
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(nk0), jnp.asarray(nk1),
    )
    np.testing.assert_allclose(
        np.asarray(out["plan"]), ref_plan, atol=3e-4, rtol=1e-3
    )
    # nothing pruned with adaptive=False
    assert np.asarray(out["mask0"]).all()
    assert np.asarray(out["mask1"]).all()


def test_segnet_parity(rng):
    """SegNet GNN variant: converted weights reproduce the torch forward,
    incl. the reference's strided-channel attention head split."""
    from tests.torch_mirrors import TorchSegNet

    from pram_tpu.models.convert import convert_segnet
    from pram_tpu.models.segnet import SegNet, SegNetConfig

    torch.manual_seed(8)
    n_layers, n_class = 2, 9
    tmodel = TorchSegNet(n_class=n_class, n_layers=n_layers).eval()
    desc = rng.randn(1, 40, 256).astype(np.float32)
    nk = (rng.rand(1, 40, 2) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(desc), torch.from_numpy(nk)).numpy()

    model = SegNet(SegNetConfig(n_layers=n_layers, n_class=n_class))
    variables = convert_segnet(state_dict_np(tmodel), n_layers=n_layers)
    out = model.apply(variables, jnp.asarray(desc), jnp.asarray(nk))
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref, atol=5e-4, rtol=1e-3
    )
