"""Torch-checkpoint to flax-variables converters.

The reference ships pretrained torch checkpoints (sfd2 ...resnet4x.79.pth,
imp_gml.920.pth, imp_adagml.80.pth, <dataset>_segnetvit.199.pth — see
reference localization/match_features_batch.py:22-40, README). These
functions map their ``state_dict`` layouts onto the flax module trees defined
in this package, so pretrained weights work unchanged on TPU.

Layout conventions:
- torch Conv2d ``[O, I/g, kH, kW]`` -> flax ``[kH, kW, I/g, O]``
- torch Linear ``[O, I]``           -> flax kernel ``[I, O]``
- torch BatchNorm weight/bias/running_mean/running_var ->
  flax scale/bias (params) + mean/var (batch_stats)
- torch LayerNorm weight/bias -> flax scale/bias

Inputs are ``{name: np.ndarray}`` dicts (call ``.numpy()`` on tensors or use
``load_torch_state_dict`` which handles torch deserialization host-side).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str, key: str = None) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy on host (CPU torch only).

    The reference stores extractor weights under ``state_dict``
    (nets/sfd2.py:594) and matcher/recognition weights under ``model``
    (localization/matchers/gml.py) or at top level.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and key in ckpt:
        ckpt = ckpt[key]
    elif isinstance(ckpt, dict):
        for k in ("state_dict", "model"):
            if k in ckpt and isinstance(ckpt[k], dict):
                ckpt = ckpt[k]
                break
    out = {}
    for name, tensor in ckpt.items():
        name = name.removeprefix("module.")  # DDP wrapper
        out[name] = tensor.detach().cpu().numpy()
    return out


def _conv(sd, name):
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))
    p = {"kernel": w}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _linear(sd, name):
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _bn(sd, name) -> Tuple[dict, dict]:
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {
        "mean": sd[f"{name}.running_mean"],
        "var": sd[f"{name}.running_var"],
    }
    return params, stats


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def convert_sfd2(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the reference ResNet4x state_dict (nets/sfd2.py:127-170) to flax."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for blk in ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b"):
        p_bn, s_bn = _bn(sd, f"{blk}.1")
        params[blk] = {"conv": _conv(sd, f"{blk}.0"), "bn": p_bn}
        stats[blk] = {"bn": s_bn}

    for i in range(3):
        t = f"conv4.{i}"
        rp, rs = {}, {}
        for j in (1, 2, 3):
            rp[f"conv{j}"] = _conv(sd, f"{t}.conv{j}")
            p_bn, s_bn = _bn(sd, f"{t}.bn{j}")
            rp[f"bn{j}"] = p_bn
            rs[f"bn{j}"] = s_bn
        params[f"res_{i}"] = rp
        stats[f"res_{i}"] = rs

    for head in ("convPa", "convDa"):
        params[f"{head}_0"] = _conv(sd, f"{head}.0")
        p_bn, s_bn = _bn(sd, f"{head}.1")
        params[f"{head}_bn"] = p_bn
        stats[f"{head}_bn"] = s_bn
        params[f"{head}_3"] = _conv(sd, f"{head}.3")
    params["convPb"] = _conv(sd, "convPb")
    params["convDb"] = _conv(sd, "convDb")
    return {"params": params, "batch_stats": stats}


def convert_superpoint(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the reference SuperPoint state_dict (nets/superpoint.py:123-138)."""
    params = {}
    for name in (
        "conv1a",
        "conv1b",
        "conv2a",
        "conv2b",
        "conv3a",
        "conv3b",
        "conv4a",
        "conv4b",
        "convPa",
        "convPb",
        "convDa",
        "convDb",
    ):
        params[name] = _conv(sd, name)
    return {"params": params}


def _self_attn_block(sd, prefix):
    return {
        "qkv": _linear(sd, f"{prefix}.qkv"),
        "proj": _linear(sd, f"{prefix}.proj"),
        "mlp_0": _linear(sd, f"{prefix}.mlp.0"),
        "mlp_ln": _ln(sd, f"{prefix}.mlp.1"),
        "mlp_3": _linear(sd, f"{prefix}.mlp.3"),
    }


def _cross_attn_block(sd, prefix):
    return {
        "to_qk": _linear(sd, f"{prefix}.to_qk"),
        "to_v": _linear(sd, f"{prefix}.to_v"),
        "proj": _linear(sd, f"{prefix}.proj"),
        "mlp_0": _linear(sd, f"{prefix}.mlp.0"),
        "mlp_ln": _ln(sd, f"{prefix}.mlp.1"),
        "mlp_3": _linear(sd, f"{prefix}.mlp.3"),
    }


def convert_segnetvit(sd: Dict[str, np.ndarray], n_layers: int = 15) -> Dict:
    """Map the reference SegNetViT state_dict (nets/segnetvit.py:124-172)."""
    params: Dict[str, Any] = {
        "input_proj": _linear(sd, "input_proj"),
        "kenc": {"Wr": {"kernel": np.ascontiguousarray(sd["kenc.Wr.weight"].T)}},
        "seg_0": _linear(sd, "seg.0"),
        "seg_ln": _ln(sd, "seg.1"),
        "seg_3": _linear(sd, "seg.3"),
    }
    for i in range(n_layers):
        params[f"gnn_{i}"] = _self_attn_block(sd, f"gnn.layers.{i}")
    if "sc.0.weight" in sd:
        params["sc_0"] = _linear(sd, "sc.0")
        params["sc_ln"] = _ln(sd, "sc.1")
        params["sc_3"] = _linear(sd, "sc.3")
    return {"params": params}


def _conv1d(sd, name):
    """torch Conv1d [O, I, 1] -> Dense kernel [I, O]."""
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"][:, :, 0].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _point_mlp(sd, prefix, n_convs):
    """Reference MLP helper (Conv1d + norm + act; nets/layers.py:15-35):
    convs sit at Sequential indices 0, 3, 6, ...; InstanceNorm1d has no
    parameters, BatchNorm1d (norm_fn='bn') contributes affine params and
    running stats at indices 1, 4, ...

    Returns (params, batch_stats); batch_stats is {} for the 'in' case.
    """
    params = {
        f"lin_{i}": _conv1d(sd, f"{prefix}.{3 * i}") for i in range(n_convs)
    }
    stats = {}
    for i in range(n_convs - 1):
        bn = f"{prefix}.{3 * i + 1}"
        if f"{bn}.running_mean" in sd:
            params[f"norm_{i}"] = {
                "scale": sd[f"{bn}.weight"],
                "bias": sd[f"{bn}.bias"],
            }
            stats[f"norm_{i}"] = {
                "mean": sd[f"{bn}.running_mean"],
                "var": sd[f"{bn}.running_var"],
            }
    return params, stats


def convert_segnet(sd: Dict[str, np.ndarray], n_layers: int = 9) -> Dict:
    """Map the reference SegNet state_dict (nets/segnet.py:32-84) to flax."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(name, pair):
        p, s = pair
        params[name] = p
        if s:
            stats[name] = s

    # kenc: channels [in]+[32,64,128,256]+[256] -> 5 convs
    put("kenc", _point_mlp(sd, "kenc.encoder", 5))
    put("seg", _point_mlp(sd, "seg", 2))
    for i in range(n_layers):
        p = f"gnn.layers.{i}"
        mlp_p, mlp_s = _point_mlp(sd, f"{p}.mlp", 2)
        params[f"gnn_{i}"] = {
            "proj_q": _conv1d(sd, f"{p}.attn.proj.0"),
            "proj_k": _conv1d(sd, f"{p}.attn.proj.1"),
            "proj_v": _conv1d(sd, f"{p}.attn.proj.2"),
            "merge": _conv1d(sd, f"{p}.attn.merge"),
            "mlp": mlp_p,
        }
        if mlp_s:
            stats[f"gnn_{i}"] = {"mlp": mlp_s}
    if "sc.0.weight" in sd:
        put("sc", _point_mlp(sd, "sc", 2))
    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_gml(sd: Dict[str, np.ndarray], n_layers: int = 9) -> Dict:
    """Map the reference GML state_dict (nets/gml.py:211-240)."""
    params: Dict[str, Any] = {
        "input_proj": _linear(sd, "input_proj"),
        "poseenc": {
            "Wr": {"kernel": np.ascontiguousarray(sd["poseenc.Wr.weight"].T)}
        },
        "bin_score": sd["bin_score"],
    }
    for i in range(n_layers):
        params[f"self_attn_{i}"] = _self_attn_block(sd, f"self_attn.{i}")
        params[f"cross_attn_{i}"] = _cross_attn_block(sd, f"cross_attn.{i}")
        params[f"out_proj_{i}"] = _linear(sd, f"out_proj.{i}")
    return {"params": params}


def convert_adagml(sd: Dict[str, np.ndarray], n_layers: int = 9) -> Dict:
    """Map the reference AdaGML state_dict (nets/adagml.py:251-288)."""
    out = convert_gml(sd, n_layers)
    for i in range(n_layers):
        p = f"pooling.{i}"
        out["params"][f"pooling_{i}"] = {
            "score_enc_0": _linear(sd, f"{p}.score_enc.0"),
            "score_enc_ln": _ln(sd, f"{p}.score_enc.1"),
            "score_enc_3": _linear(sd, f"{p}.score_enc.3"),
            "proj": _linear(sd, f"{p}.proj"),
            "predict_0": _linear(sd, f"{p}.predict.0"),
            "predict_ln": _ln(sd, f"{p}.predict.1"),
            "predict_3": _linear(sd, f"{p}.predict.3"),
        }
    return out


def convert_descriptor_compressor(sd: Dict[str, np.ndarray]) -> Dict:
    """Map the reference DescriptorCompressor state_dict (nets/sfd2.py:357-365):
    a single 1x1 Conv1d 'conv' with bias."""
    return {"params": {"conv": _conv1d(sd, "conv")}}
