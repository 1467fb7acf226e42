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


def test_gm_wiring_parity(rng):
    """GM (the working version of the reference's intended architecture)
    reproduces a torch mirror's transport plan after weight conversion."""
    from tests.torch_mirrors import TorchGM

    from pram_tpu.models.convert import _conv1d, _point_mlp
    from pram_tpu.models.gm import GM, GMConfig

    torch.manual_seed(11)
    n_layers = 2
    tmodel = TorchGM(n_layers=n_layers).eval()
    sd = state_dict_np(tmodel)

    params = {
        "kenc": _point_mlp(sd, "kenc.encoder", 5)[0],  # channels [3,32,64,128,256,128]
        "bin_score": sd["bin_score"],
    }
    for i in range(2 * n_layers):
        p = f"gnn.layers.{i}"
        params[f"gnn_{i}"] = {
            "proj_q": _conv1d(sd, f"{p}.attn.proj.0"),
            "proj_k": _conv1d(sd, f"{p}.attn.proj.1"),
            "proj_v": _conv1d(sd, f"{p}.attn.proj.2"),
            "merge": _conv1d(sd, f"{p}.attn.merge"),
            "mlp": _point_mlp(sd, f"{p}.mlp", 2)[0],
        }
    for i in range(n_layers):
        params[f"final_proj_{i}"] = _conv1d(sd, f"final_proj.{i}")
    variables = {"params": params}

    d0 = rng.randn(1, 20, 128).astype(np.float32)
    d1 = rng.randn(1, 28, 128).astype(np.float32)
    nk0 = (rng.rand(1, 20, 2) * 2 - 1).astype(np.float32)
    nk1 = (rng.rand(1, 28, 2) * 2 - 1).astype(np.float32)
    s0 = rng.rand(1, 20).astype(np.float32)
    s1 = rng.rand(1, 28).astype(np.float32)
    with torch.no_grad():
        ref_plan = tmodel(
            torch.from_numpy(d0), torch.from_numpy(d1),
            torch.from_numpy(nk0), torch.from_numpy(nk1),
            torch.from_numpy(s0), torch.from_numpy(s1),
        ).numpy()

    model = GM(GMConfig(n_layers=n_layers))
    out = model.apply(
        variables,
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(nk0), jnp.asarray(nk1),
        jnp.asarray(s0), jnp.asarray(s1),
    )
    np.testing.assert_allclose(
        np.asarray(out["plan"]), ref_plan, atol=5e-4, rtol=1e-3
    )
