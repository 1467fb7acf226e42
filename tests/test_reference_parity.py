"""Direct parity against the ACTUAL reference modules in /root/reference.

Unlike tests/test_model_parity.py (hand-written torch mirrors), these tests
import the real nets/*.py, run them with random weights, convert the real
state_dict with pram_tpu.models.convert, and assert element-wise agreement.
This is the strongest checkpoint-compatibility statement available without
the pretrained .pth files: if these pass, a real checkpoint converts too.
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pram_tpu.models.convert import (
    convert_adagml,
    convert_gml,
    convert_segnet,
    convert_segnetvit,
    convert_sfd2,
)

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_nets():
    """Import the real reference nets package (with a torchvision stub).

    nets/sfd2.py:12 imports torchvision.transforms only for the module-level
    norm_RGB (unused by the forward paths tested here); the stub provides
    Compose/Normalize so the import succeeds in this torchvision-free image.
    """
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tf.Compose = lambda ts: (lambda x: x)
        tf.Normalize = lambda mean, std: (lambda x: x)
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
    import nets.adagml
    import nets.gml
    import nets.segnet
    import nets.segnetvit
    import nets.sfd2

    # nets/adagml.py:45-48 hardcodes device='cuda' in sink_algorithm;
    # nets/gml.py:38-46 is the identical math with a device-agnostic global.
    # Substitute so the reference runs on this CPU-only torch build.
    nets.adagml.sink_algorithm = nets.gml.sink_algorithm

    return types.SimpleNamespace(
        segnetvit=nets.segnetvit,
        gml=nets.gml,
        adagml=nets.adagml,
        segnet=nets.segnet,
        sfd2=nets.sfd2,
    )


def state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_segnetvit_reference_parity(ref_nets, rng):
    torch.manual_seed(10)
    n_layers, n_class = 3, 17
    tmodel = ref_nets.segnetvit.SegNetViT(
        {"n_layers": n_layers, "n_class": n_class}
    ).eval()
    desc = rng.randn(2, 64, 256).astype(np.float32)
    nk = (rng.rand(2, 64, 2) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(
            {
                "seg_descriptors": torch.from_numpy(desc),
                "norm_keypoints": torch.from_numpy(nk),
            }
        )["prediction"].numpy()

    from pram_tpu.models.segnetvit import SegNetViT, SegNetViTConfig

    model = SegNetViT(SegNetViTConfig(n_layers=n_layers, n_class=n_class))
    variables = convert_segnetvit(state_dict_np(tmodel), n_layers=n_layers)
    out = model.apply(variables, jnp.asarray(desc), jnp.asarray(nk))
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref, atol=2e-4, rtol=1e-4
    )


@pytest.mark.parametrize("norm_fn", ["in", "bn"])
def test_segnet_reference_parity(ref_nets, rng, norm_fn):
    torch.manual_seed(11)
    n_layers, n_class = 3, 17
    tmodel = ref_nets.segnet.SegNet(
        {"n_layers": n_layers, "n_class": n_class, "norm_fn": norm_fn}
    ).eval()
    desc = rng.randn(2, 48, 256).astype(np.float32)
    nk = (rng.rand(2, 48, 2) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(
            {
                "seg_descriptors": torch.from_numpy(desc),
                "norm_keypoints": torch.from_numpy(nk),
            }
        )["prediction"].numpy()

    from pram_tpu.models.segnet import SegNet, SegNetConfig

    model = SegNet(
        SegNetConfig(n_layers=n_layers, n_class=n_class, norm_fn=norm_fn)
    )
    variables = convert_segnet(state_dict_np(tmodel), n_layers=n_layers)
    out = model.apply(variables, jnp.asarray(desc), jnp.asarray(nk))
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref, atol=3e-4, rtol=1e-3
    )


def test_gml_reference_parity(ref_nets, rng):
    torch.manual_seed(12)
    tmodel = ref_nets.gml.GML({}).eval()  # full 9 layers, real defaults
    n0, n1 = 40, 56
    d0 = rng.randn(1, n0, 128).astype(np.float32)
    d1 = rng.randn(1, n1, 128).astype(np.float32)
    nk0 = (rng.rand(1, n0, 2) * 2 - 1).astype(np.float32)
    nk1 = (rng.rand(1, n1, 2) * 2 - 1).astype(np.float32)
    data = {
        "descriptors0": torch.from_numpy(d0),
        "descriptors1": torch.from_numpy(d1),
        "keypoints0": torch.from_numpy(nk0),
        "keypoints1": torch.from_numpy(nk1),
        "norm_keypoints0": torch.from_numpy(nk0),
        "norm_keypoints1": torch.from_numpy(nk1),
    }
    with torch.no_grad():
        ref = tmodel.produce_matches(data)

    from pram_tpu.models.gml import GML, GMLConfig, extract_matches

    model = GML(GMLConfig())
    variables = convert_gml(state_dict_np(tmodel), n_layers=9)
    out = model.apply(
        variables,
        jnp.asarray(d0),
        jnp.asarray(d1),
        jnp.asarray(nk0),
        jnp.asarray(nk1),
    )
    res = extract_matches(out["plan"], threshold=0.2)
    np.testing.assert_array_equal(
        np.asarray(res.matches0[0]), ref["matches0"][0].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(res.matches1[0]), ref["matches1"][0].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(res.scores0[0]),
        ref["matching_scores0"][0].numpy(),
        atol=1e-4,
    )


def test_adagml_reference_parity(ref_nets, rng):
    """Real AdaGML with pruning ENABLED (n_min_tokens below the token count):
    the reference physically shrinks tensors; the masking formulation must
    produce the same full-size match vectors."""
    torch.manual_seed(13)
    n_min = 48
    tmodel = ref_nets.adagml.AdaGML({"n_min_tokens": n_min}).eval()
    # default-init pooling confidences cluster on one side of the layer
    # threshold, which prunes EVERY token (and crashes the reference's
    # zero-size .max at nets/adagml.py:500). Spread the final predict
    # layer so per-token confidences straddle the threshold, exercising
    # real partial pruning. Weights are modified BEFORE conversion, so
    # converter parity still covers the full state_dict.
    with torch.no_grad():
        for pool in tmodel.pooling:
            pool.predict[3].weight.mul_(8.0)
            pool.predict[3].bias.fill_(0.4)
    n0 = n1 = 64
    d0 = rng.randn(1, n0, 128).astype(np.float32)
    d1 = rng.randn(1, n1, 128).astype(np.float32)
    nk0 = (rng.rand(1, n0, 2) * 2 - 1).astype(np.float32)
    nk1 = (rng.rand(1, n1, 2) * 2 - 1).astype(np.float32)
    data = {
        "descriptors0": torch.from_numpy(d0),
        "descriptors1": torch.from_numpy(d1),
        "keypoints0": torch.from_numpy(nk0),
        "keypoints1": torch.from_numpy(nk1),
        "scores0": torch.ones(1, n0),
        "scores1": torch.ones(1, n1),
        "norm_keypoints0": torch.from_numpy(nk0),
        "norm_keypoints1": torch.from_numpy(nk1),
    }
    with torch.no_grad():
        ref = tmodel.produce_matches(data)

    from pram_tpu.models.adagml import AdaGML, AdaGMLConfig, extract_matches

    model = AdaGML(AdaGMLConfig(n_min_tokens=n_min))
    variables = convert_adagml(state_dict_np(tmodel), n_layers=9)
    out = model.apply(
        variables,
        jnp.asarray(d0),
        jnp.asarray(d1),
        jnp.asarray(nk0),
        jnp.asarray(nk1),
    )
    res = extract_matches(out["plan"], threshold=0.2)
    np.testing.assert_array_equal(
        np.asarray(res.matches0[0]), ref["matches0"][0].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(res.scores0[0]),
        ref["matching_scores0"][0].numpy(),
        atol=1e-4,
    )


def test_sfd2_reference_forward_parity(ref_nets, rng):
    torch.manual_seed(14)
    tmodel = ref_nets.sfd2.ResNet4x().eval()
    img = rng.rand(1, 3, 64, 80).astype(np.float32)
    with torch.no_grad():
        ref = tmodel({"image": torch.from_numpy(img)})

    from pram_tpu.models.sfd2 import ResNet4x

    model = ResNet4x()
    variables = convert_sfd2(state_dict_np(tmodel))
    out = model.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out["score_map"]), ref["scores"].numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["desc_map"]),
        ref["dense_features"].numpy().transpose(0, 2, 3, 1),
        atol=1e-4,
    )


def test_sfd2_reference_extract_parity(ref_nets, rng):
    """extract_local_global keypoint/descriptor set equality (random weights,
    dynamic reference output vs my fixed-shape padded output)."""
    torch.manual_seed(15)
    tmodel = ref_nets.sfd2.ResNet4x().eval()
    img = rng.rand(1, 3, 64, 80).astype(np.float32)
    conf_th = 0.005
    with torch.no_grad():
        ref = tmodel.extract_local_global(
            {"image": torch.from_numpy(img)},
            config={
                "conf_th": conf_th,
                "remove_borders": 4,
                "min_keypoints": 0,
                "max_keypoints": 4096,
            },
        )
    k_ref = ref["keypoints"][0].numpy()  # [K, 2] (x, y)
    s_ref = ref["scores"][0].numpy()
    d_ref = ref["descriptors"][0].numpy().T  # [K, C]

    from pram_tpu.models.sfd2 import ResNet4x, extract

    model = ResNet4x()
    variables = convert_sfd2(state_dict_np(tmodel))
    out = extract(
        model,
        variables,
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        max_keypoints=4096,
        conf_th=conf_th,
        border=4,
        min_keypoints=0,
    )
    mask = np.asarray(out["keypoints"].mask[0])
    k_my = np.asarray(out["keypoints"].xy[0])[mask]
    s_my = np.asarray(out["keypoints"].scores[0])[mask]
    d_my = np.asarray(out["descriptors"][0])[mask]

    assert k_my.shape[0] == k_ref.shape[0]
    order_ref = np.lexsort((k_ref[:, 0], k_ref[:, 1]))
    order_my = np.lexsort((k_my[:, 0], k_my[:, 1]))
    np.testing.assert_allclose(
        k_my[order_my], k_ref[order_ref], atol=1e-3
    )
    np.testing.assert_allclose(
        s_my[order_my], s_ref[order_ref], atol=3e-4
    )
    np.testing.assert_allclose(
        d_my[order_my], d_ref[order_ref], atol=2e-3
    )


def test_descriptor_compressor_reference_parity(ref_nets, rng):
    """DescriptorCompressor (nets/sfd2.py:357-383): 1x1 Conv1d + L2 norm,
    128 -> 64, converted through convert_descriptor_compressor."""
    from pram_tpu.models.convert import convert_descriptor_compressor
    from pram_tpu.models.sfd2 import DescriptorCompressor

    torch.manual_seed(16)
    tmodel = ref_nets.sfd2.DescriptorCompressor(128, 64).eval()
    x = rng.randn(1, 128, 50).astype(np.float32)  # torch layout [B, C, N]
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()  # [B, 64, N]

    comp = DescriptorCompressor(outdim=64)
    variables = convert_descriptor_compressor(state_dict_np(tmodel))
    out = comp.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))  # [B, N, 64]
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref, atol=1e-5
    )


def test_aux_losses_match_reference_metrics(rng):
    """cls CE/KL + scene-coordinate losses vs the real tools/metrics.py.

    These are unused by the reference training pipeline but part of its
    metric surface (tools/metrics.py:151-216); pinned here for completeness.
    """
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from tools import metrics as ref_metrics

    from pram_tpu.train.losses import (
        cls_loss_ce, cls_loss_kl, sc_loss_geo, sc_loss_l1,
    )

    b, c, s, n = 4, 9, 3, 16
    pred2 = rng.randn(b, c).astype(np.float32)
    tgt1 = rng.randint(0, c, size=(b,))
    ref = ref_metrics.compute_cls_loss_ce(
        torch.from_numpy(pred2), torch.from_numpy(tgt1)
    ).item()
    got = float(cls_loss_ce(jnp.asarray(pred2), jnp.asarray(tgt1)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    pred3 = rng.randn(b, c, s).astype(np.float32)
    tgt2 = rng.randint(0, c, size=(b, s))
    ref = ref_metrics.compute_cls_loss_ce(
        torch.from_numpy(pred3), torch.from_numpy(tgt2)
    ).item()
    got = float(cls_loss_ce(jnp.asarray(pred3), jnp.asarray(tgt2)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    tlog = rng.randn(b, c).astype(np.float32)
    ref = ref_metrics.compute_cls_loss_kl(
        torch.from_numpy(pred2), torch.from_numpy(tlog)
    ).item()
    got = float(cls_loss_kl(jnp.asarray(pred2), jnp.asarray(tlog)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)

    p = rng.randn(b, n, 3).astype(np.float32)
    t = rng.randn(b, n, 3).astype(np.float32)
    mask = rng.rand(b, 3) > 0.3  # reference masks the per-axis means
    ref = ref_metrics.compute_sc_loss_l1(
        torch.from_numpy(p), torch.from_numpy(t), mask=torch.from_numpy(mask)
    ).item()
    got = float(sc_loss_l1(jnp.asarray(p), jnp.asarray(t), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    predc = rng.randn(b, 3, n).astype(np.float32)
    P = np.tile(np.eye(4, dtype=np.float32)[None, :3], (b, 1, 1))
    P[:, :, 3] = rng.rand(b, 3) + np.array([0, 0, 5.0], np.float32)
    K = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 100.0
    p2ds = rng.rand(b, n, 2).astype(np.float32) * 10
    mean_xyz = rng.randn(b, 3).astype(np.float32)
    scale_xyz = (rng.rand(b, 3) + 0.5).astype(np.float32)
    ref = ref_metrics.compute_sc_loss_geo(
        torch.from_numpy(predc), torch.from_numpy(P), torch.from_numpy(K),
        torch.from_numpy(p2ds), torch.from_numpy(mean_xyz),
        torch.from_numpy(scale_xyz), max_value=20,
    ).item()
    got = float(sc_loss_geo(
        jnp.asarray(predc), jnp.asarray(P), jnp.asarray(K),
        jnp.asarray(p2ds), jnp.asarray(mean_xyz), jnp.asarray(scale_xyz),
        max_value=20.0,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_superpoint_reference_parity(ref_nets, rng, monkeypatch):
    """Direct parity vs the real nets/superpoint.py:99-240 (VERDICT r2 #7).

    The reference constructor demands a weight file (superpoint.py:141-143);
    load is bypassed so the module keeps its fresh random torch init —
    exactly the recipe the other direct-parity tests use, minus the file.
    Covers the dense forward (score/desc maps) and the extract_local_global
    keypoint/descriptor sets.
    """
    import nets.superpoint as ref_sp

    torch.manual_seed(17)
    with monkeypatch.context() as mp:
        mp.setattr(torch, "load", lambda *a, **k: {})
        mp.setattr(
            torch.nn.Module, "load_state_dict",
            lambda self, sd, strict=True: None,
        )
        tmodel = ref_sp.SuperPoint(
            {
                "weight_path": "/nonexistent.pth",
                "max_keypoints": 4096,
                "min_keypoints": 0,
            }
        ).eval()

    img = rng.rand(1, 1, 64, 80).astype(np.float32)
    # nets/superpoint.py:91 picks grid_sample's align_corners by sniffing
    # torch.__version__[2] — written for torch 1.x ('1.9.0'[2]='9' > 2 ->
    # True); on this torch (2.13) it silently flips to the False default,
    # diverging from its own coordinate math and from sfd2's explicit
    # align_corners=True (nets/sfd2.py:61). Pin the intended branch.
    with torch.no_grad(), monkeypatch.context() as mp:
        mp.setattr(torch, "__version__", "1.9.0")
        ref = tmodel.extract_local_global({"image": torch.from_numpy(img)})
    k_ref = ref["keypoints"][0].numpy()  # [K, 2] (x, y)
    s_ref = ref["scores"][0].numpy()
    d_ref = ref["descriptors"][0].numpy().T  # [K, C]

    from pram_tpu.models.convert import convert_superpoint
    from pram_tpu.models.superpoint import SuperPoint, extract

    model = SuperPoint()
    variables = convert_superpoint(state_dict_np(tmodel))

    # dense maps
    out = model.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out["score_map"]), ref["score_map"].numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["desc_map"]),
        ref["desc_map"].numpy().transpose(0, 2, 3, 1),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["mid_features"]),
        ref["mid_features"].numpy().transpose(0, 2, 3, 1),
        atol=1e-4,
    )

    # extraction set-equality (dynamic reference output vs padded mine)
    eout = extract(
        model,
        variables,
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        max_keypoints=4096,
        conf_th=0.001,
        border=4,
        min_keypoints=0,
        nms_radius=3,
    )
    mask = np.asarray(eout["keypoints"].mask[0])
    k_my = np.asarray(eout["keypoints"].xy[0])[mask]
    s_my = np.asarray(eout["keypoints"].scores[0])[mask]
    d_my = np.asarray(eout["descriptors"][0])[mask]

    assert k_my.shape[0] == k_ref.shape[0]
    order_ref = np.lexsort((k_ref[:, 0], k_ref[:, 1]))
    order_my = np.lexsort((k_my[:, 0], k_my[:, 1]))
    np.testing.assert_allclose(k_my[order_my], k_ref[order_ref], atol=1e-3)
    np.testing.assert_allclose(s_my[order_my], s_ref[order_ref], atol=3e-4)
    np.testing.assert_allclose(d_my[order_my], d_ref[order_ref], atol=2e-3)
