"""Int8 inference path for the frozen SFD2 extractor (VERDICT r3 #3).

The dense SFD2 forward is the pipeline's largest stage (~45 of 82 ms/b32 at
480x640 bf16, ~66% MXU per-conv roofline — ROUND_NOTES r3). The v5e MXU
runs s8 x s8 -> s32 at 2x the bf16 rate, so the only lever left on this
conv stack (short of a different architecture) is int8.

Design (frozen extractor only — this is an INFERENCE path):
- BatchNorm is folded into the conv weights/biases first (the extractor is
  frozen even during reference training, trainer.py:118, so folding is
  exact).
- Weights: symmetric per-output-channel int8 (scale = absmax/127).
- Activations: symmetric per-tensor int8 with STATIC scales calibrated on
  a handful of forward passes (quantize_extractor). ReLU outputs are
  non-negative but share the symmetric grid for MXU s8 compatibility.
- The stem (conv1a/conv1b on the 3-channel image) stays bf16 — thin-input
  convs are not MXU-bound and run in the fused Pallas stem kernel.
- Final 1x1 heads (convPb 65-way logits, convDb descriptors) stay bf16:
  their FLOPs are negligible and the descriptor L2-normalization is
  precision-sensitive.

The quantized forward mirrors ResNet4x.__call__ (models/sfd2.py:306-373)
output-for-output, so `extract` works unchanged via duck-typing
(Int8ResNet4x.apply). Correctness gate: the image-level rendered guard
(engine/rendered_guard.py) must hold recall 1.0 with the quantized
extractor; scripts/exp_int8.py reports the quantization-error numbers.

Reference hot spot being attacked: nets/sfd2.py:127-272.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-5


def _fold_bn(kernel, bias, bn):
    """Fold inference-mode BN into (kernel, bias). bn = (scale, bias, mean, var)."""
    g, b, mu, var = bn
    f = g / jnp.sqrt(var + _BN_EPS)
    return kernel * f, (bias - mu) * f + b if bias is not None else -mu * f + b


def _quant_w(kernel):
    """Symmetric per-output-channel int8 (last axis = out features)."""
    absmax = jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_conv_enabled() -> bool:
    """Trace-time flag for the Pallas im2col s8 conv (PRAM_INT8_CONV=1).

    Off by default until chip-validated; accuracy is gated by the
    image-level rendered guard, which runs whatever configuration the
    bench runs (engine/rendered_guard.py)."""
    import os

    return os.environ.get("PRAM_INT8_CONV", "0") == "1"


def _use_conv_kernel(x, cout, strides) -> bool:
    if strides not in ((1, 1), (2, 2)) or not int8_conv_enabled():
        return False
    from pram_tpu.ops import conv_int8_pallas as cip
    from pram_tpu.utils.pallas_gate import pallas_ok

    if not pallas_ok():
        return False
    if jax.default_backend() != "tpu" and not cip._INTERPRET:
        return False
    gate = (
        cip.conv3x3_int8_supported
        if strides == (1, 1)
        else cip.conv3x3s2_int8_supported
    )
    return gate(x.shape[1], x.shape[2], x.shape[3], cout)


def _conv_i8(xq, wq, strides=(1, 1)):
    return jax.lax.conv_general_dilated(
        xq, wq, strides, [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _conv_f(x, w, strides=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, strides, [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _expand_grouped(kernel, groups=32, split=128):
    """Grouped [3,3,ipg,F] kernel -> list of dense block-diagonal splits
    (the measured-faster formulation, models/sfd2.py _GroupedConv3x3Dense)."""
    kh, kw, ipg, f = kernel.shape
    c = ipg * groups
    opg = f // groups
    split = min(split, c)
    gs = split // ipg
    n_split = groups // gs
    kg = kernel.reshape(kh, kw, ipg, n_split, gs, opg)
    eye = jnp.eye(gs, dtype=kernel.dtype)
    return [
        jnp.einsum("hwigo,Gg->hwGigo", kg[:, :, :, si], eye).reshape(
            kh, kw, split, gs * opg
        )
        for si in range(n_split)
    ], split


class Int8ResNet4x:
    """Duck-typed stand-in for ResNet4x in `extract` (same apply contract).

    Construct via :func:`quantize_extractor`. ``apply(qparams, image)``
    returns the same output dict as the float model.
    """

    def __init__(self, outdim: int = 128, use_pallas_stem: Optional[bool] = None):
        self.outdim = outdim
        self.use_pallas_stem = use_pallas_stem

    # conv layers quantized (name -> stride); heads handled separately
    _LAYERS = (
        ("conv2a", 1), ("conv2b", 2), ("conv3a", 1), ("conv3b", 1),
    )

    def _stem(self, qp, image):
        h, w = image.shape[1], image.shape[2]
        stem_ok = image.shape[-1] == 3 and h % 16 == 0 and w % 2 == 0
        from pram_tpu.utils.pallas_gate import pallas_ok, tpu_pallas_ok

        use = (
            (self.use_pallas_stem and pallas_ok())
            if self.use_pallas_stem is not None
            else tpu_pallas_ok()
        )
        if use and stem_ok:
            from pram_tpu.ops.stem_pallas import fused_stem

            return fused_stem(
                image,
                qp["conv1a_kernel"], qp["conv1a_bias"], qp["conv1a_bn"],
                qp["conv1b_kernel"], qp["conv1b_bias"], qp["conv1b_bn"],
            )
        g1, b1, m1, v1 = qp["conv1a_bn"]
        k1f, c1f = _fold_bn(qp["conv1a_kernel"], qp["conv1a_bias"],
                            (g1, b1, m1, v1))
        x = jnp.maximum(_conv_f(image, k1f) + c1f, 0)
        g2, b2, m2, v2 = qp["conv1b_bn"]
        k2f, c2f = _fold_bn(qp["conv1b_kernel"], qp["conv1b_bias"],
                            (g2, b2, m2, v2))
        return jnp.maximum(_conv_f(x, k2f, (2, 2)) + c2f, 0)

    def _qlayer(self, qp, name, x, strides):
        """Quantize x with the layer's static input scale, int8 conv,
        dequantize + bias + ReLU (BN already folded into wq/bias)."""
        sa = qp[f"{name}_in_scale"]
        if _use_conv_kernel(x, qp[f"{name}_wq"].shape[-1], strides):
            from pram_tpu.ops.conv_int8_pallas import (
                conv3x3_int8,
                conv3x3s2_int8,
            )

            kernel = conv3x3_int8 if strides == (1, 1) else conv3x3s2_int8
            return kernel(
                x, qp[f"{name}_wq"], sa, qp[f"{name}_wscale"],
                qp[f"{name}_bias"], relu=True,
            )
        xq = jnp.clip(jnp.round(x / sa), -127, 127).astype(jnp.int8)
        y = _conv_i8(xq, qp[f"{name}_wq"], strides)
        scale = (sa * qp[f"{name}_wscale"]).astype(x.dtype)
        return jnp.maximum(y.astype(x.dtype) * scale
                           + qp[f"{name}_bias"].astype(x.dtype), 0)

    def _qres(self, qp, name, x):
        identity = x
        y = self._q1x1(qp, f"{name}_conv1", x, relu=True)
        # grouped 3x3 as dense block-diagonal int8 splits
        sa = qp[f"{name}_conv2_in_scale"]
        split = qp[f"{name}_conv2_wq"][0].shape[2]
        oc = qp[f"{name}_conv2_wq"][0].shape[-1]
        if _use_conv_kernel(y[..., :split], oc, (1, 1)):
            from pram_tpu.ops.conv_int8_pallas import conv3x3_int8

            outs = [
                conv3x3_int8(
                    y[..., si * split : (si + 1) * split], wq, sa,
                    qp[f"{name}_conv2_wscale"][si * oc : (si + 1) * oc],
                    qp[f"{name}_conv2_bias"][si * oc : (si + 1) * oc],
                    relu=True,
                )
                for si, wq in enumerate(qp[f"{name}_conv2_wq"])
            ]
            y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)
        else:
            yq = jnp.clip(jnp.round(y / sa), -127, 127).astype(jnp.int8)
            outs = []
            for si, wq in enumerate(qp[f"{name}_conv2_wq"]):
                outs.append(
                    _conv_i8(yq[..., si * split : (si + 1) * split], wq)
                )
            y32 = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)
            scale2 = (sa * qp[f"{name}_conv2_wscale"]).astype(x.dtype)
            y = jnp.maximum(
                y32.astype(x.dtype) * scale2
                + qp[f"{name}_conv2_bias"].astype(x.dtype),
                0,
            )
        y = self._q1x1(qp, f"{name}_conv3", y, relu=False)
        return jnp.maximum(y + identity, 0)

    def _qhead3x3(self, qp, name, x):
        """3x3 s1 head conv, dequant + bias, NO ReLU (convPa_3/convDa_3)."""
        sa = qp[f"{name}_in_scale"]
        if _use_conv_kernel(x, qp[f"{name}_wq"].shape[-1], (1, 1)):
            from pram_tpu.ops.conv_int8_pallas import conv3x3_int8

            return conv3x3_int8(
                x, qp[f"{name}_wq"], sa, qp[f"{name}_wscale"],
                qp[f"{name}_bias"], relu=False,
            )
        cq = jnp.clip(jnp.round(x / sa), -127, 127).astype(jnp.int8)
        return _conv_i8(cq, qp[f"{name}_wq"]).astype(x.dtype) * (
            sa * qp[f"{name}_wscale"]
        ).astype(x.dtype) + qp[f"{name}_bias"].astype(x.dtype)

    def _q1x1(self, qp, name, x, relu):
        sa = qp[f"{name}_in_scale"]
        xq = jnp.clip(jnp.round(x / sa), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, qp[f"{name}_wq"],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scale = (sa * qp[f"{name}_wscale"]).astype(x.dtype)
        y = y.astype(x.dtype) * scale + qp[f"{name}_bias"].astype(x.dtype)
        return jnp.maximum(y, 0) if relu else y

    def apply(self, qparams, image: jax.Array) -> dict:
        from pram_tpu.models.sfd2 import pixel_shuffle_score

        qp = qparams["int8"]
        x = self._stem(qp, image)
        for name, stride in self._LAYERS:
            x = self._qlayer(qp, name, x, (stride, stride))
        for i in range(3):
            x = self._qres(qp, f"res_{i}", x)
        out4 = x

        # detector head
        cpa = self._qlayer(qp, "convPa_0", out4, (2, 2))
        cpa = self._qhead3x3(qp, "convPa_3", cpa)
        logits = (
            jax.lax.dot_general(
                cpa, qp["convPb_w"].astype(x.dtype),
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + qp["convPb_b"]
        ).astype(x.dtype)
        full_semi = jax.nn.softmax(logits, axis=-1)
        score_map = pixel_shuffle_score(full_semi[..., :-1])

        # descriptor head
        cda = self._qlayer(qp, "convDa_0", out4, (1, 1))
        cda = self._qhead3x3(qp, "convDa_3", cda)
        desc = (
            jax.lax.dot_general(
                cda, qp["convDb_w"].astype(x.dtype),
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + qp["convDb_b"]
        ).astype(x.dtype)
        norm = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
        desc = desc / jnp.maximum(norm, 1e-12)

        return {
            "score_map": score_map,
            "desc_map": desc,
            "mid_features": out4,
            "logits": logits,
        }


def quantize_extractor(
    model, variables, calib_images: jax.Array
) -> Tuple[Int8ResNet4x, Dict]:
    """Fold BN, quantize weights, calibrate activation scales.

    Args:
      model: the float ResNet4x (for structure/outdim).
      variables: its variables (params + batch_stats), any float dtype.
      calib_images: ``[B, H, W, 3]`` preprocessed images for activation
        ranges (a handful of representative frames suffices).

    Returns:
      (Int8ResNet4x, qparams) ready for ``extract(int8_model, qparams, ...)``.
    """
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), variables["params"]
    )
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32),
        variables.get("batch_stats", {}),
    )

    def bn_of(path):
        p = params
        s = stats
        for k in path.split("/"):
            p = p[k]
            s = s[k]
        return (p["scale"], p["bias"], s["mean"], s["var"])

    def conv_of(path):
        p = params
        for k in path.split("/"):
            p = p[k]
        return p["kernel"], p.get("bias")

    qp: Dict = {}
    # stem stays float (runs in the fused Pallas stem kernel)
    for nm in ("conv1a", "conv1b"):
        k, b = conv_of(f"{nm}/conv")
        qp[f"{nm}_kernel"] = k
        qp[f"{nm}_bias"] = b
        qp[f"{nm}_bn"] = bn_of(f"{nm}/bn")

    # ---- float forward with BN folded, capturing per-layer input maxima
    maxima: Dict[str, float] = {}

    def track(name, x):
        maxima[name] = float(jnp.max(jnp.abs(x)))
        return x

    def fold(name):
        k, b = conv_of(f"{name}/conv")
        return _fold_bn(k, b if b is not None else jnp.zeros(k.shape[-1]),
                        bn_of(f"{name}/bn"))

    stem = Int8ResNet4x(use_pallas_stem=False)
    x = stem._stem(qp, calib_images.astype(jnp.float32))
    folded: Dict[str, Tuple] = {}
    for nm, stride in Int8ResNet4x._LAYERS:
        kf, bf = fold(nm)
        folded[nm] = (kf, bf)
        track(nm, x)
        x = jnp.maximum(_conv_f(x, kf, (stride, stride)) + bf, 0)
    for i in range(3):
        nm = f"res_{i}"
        identity = x
        k1 = params[nm]["conv1"]["kernel"][0, 0]  # 1x1 -> [C, F]
        k1f, b1f = _fold_bn(k1, jnp.zeros(k1.shape[-1]), bn_of(f"{nm}/bn1"))
        track(f"{nm}_conv1", x)
        y = jnp.maximum(jnp.einsum("bhwc,cf->bhwf", x, k1f) + b1f, 0)
        k2 = params[nm]["conv2"]["kernel"]
        k2f, b2f = _fold_bn(k2, jnp.zeros(k2.shape[-1]), bn_of(f"{nm}/bn2"))
        track(f"{nm}_conv2", y)
        splits, split = _expand_grouped(k2f)
        y32 = [
            _conv_f(y[..., si * split : (si + 1) * split], w)
            for si, w in enumerate(splits)
        ]
        y = jnp.maximum(
            (y32[0] if len(y32) == 1 else jnp.concatenate(y32, -1)) + b2f, 0
        )
        k3 = params[nm]["conv3"]["kernel"][0, 0]
        k3f, b3f = _fold_bn(k3, jnp.zeros(k3.shape[-1]), bn_of(f"{nm}/bn3"))
        track(f"{nm}_conv3", y)
        y = jnp.einsum("bhwc,cf->bhwf", y, k3f) + b3f
        x = jnp.maximum(y + identity, 0)
        folded[f"{nm}_conv1"] = (k1f, b1f)
        folded[f"{nm}_conv2"] = (k2f, b2f, splits, split)
        folded[f"{nm}_conv3"] = (k3f, b3f)
    out4 = x

    # heads (convPa_0/convDa_0 have conv bias + BN; _3 convs have bias only)
    kpa, bpa = conv_of("convPa_0")
    kpaf, bpaf = _fold_bn(kpa, bpa, bn_of("convPa_bn"))
    folded["convPa_0"] = (kpaf, bpaf)
    track("convPa_0", out4)
    cpa = jnp.maximum(_conv_f(out4, kpaf, (2, 2)) + bpaf, 0)
    kpa3, bpa3 = conv_of("convPa_3")
    folded["convPa_3"] = (kpa3, bpa3)
    track("convPa_3", cpa)

    kda, bda = conv_of("convDa_0")
    kdaf, bdaf = _fold_bn(kda, bda, bn_of("convDa_bn"))
    folded["convDa_0"] = (kdaf, bdaf)
    track("convDa_0", out4)
    cda = jnp.maximum(_conv_f(out4, kdaf) + bdaf, 0)
    kda3, bda3 = conv_of("convDa_3")
    folded["convDa_3"] = (kda3, bda3)
    track("convDa_3", cda)

    # ---- quantize
    for nm in list(f for f, _ in Int8ResNet4x._LAYERS) + [
        "convPa_0", "convPa_3", "convDa_0", "convDa_3",
    ]:
        kf, bf = folded[nm][:2]
        wq, ws = _quant_w(kf)
        qp[f"{nm}_wq"] = wq
        qp[f"{nm}_wscale"] = ws
        qp[f"{nm}_bias"] = bf
        qp[f"{nm}_in_scale"] = jnp.asarray(
            max(maxima[nm], 1e-6) / 127.0, jnp.float32
        )
    for i in range(3):
        nm = f"res_{i}"
        for tail in ("conv1", "conv3"):
            kf, bf = folded[f"{nm}_{tail}"]
            wq, ws = _quant_w(kf)
            qp[f"{nm}_{tail}_wq"] = wq
            qp[f"{nm}_{tail}_wscale"] = ws
            qp[f"{nm}_{tail}_bias"] = bf
            qp[f"{nm}_{tail}_in_scale"] = jnp.asarray(
                max(maxima[f"{nm}_{tail}"], 1e-6) / 127.0, jnp.float32
            )
        kf, bf, splits, split = folded[f"{nm}_conv2"]
        # per-out-channel scales concatenate across splits (outputs do too)
        scales = []
        qsplits = []
        for w in splits:
            wq, ws = _quant_w(w)
            qsplits.append(wq)
            scales.append(ws)
        qp[f"{nm}_conv2_wq"] = qsplits
        qp[f"{nm}_conv2_wscale"] = jnp.concatenate(scales)
        qp[f"{nm}_conv2_bias"] = bf
        qp[f"{nm}_conv2_in_scale"] = jnp.asarray(
            max(maxima[f"{nm}_conv2"], 1e-6) / 127.0, jnp.float32
        )

    kpb, bpb = conv_of("convPb")
    qp["convPb_w"] = kpb[0, 0]
    qp["convPb_b"] = bpb
    kdb, bdb = conv_of("convDb")
    qp["convDb_w"] = kdb[0, 0]
    qp["convDb_b"] = bdb

    return Int8ResNet4x(outdim=model.outdim), {"int8": qp}


def cast_stem(qvars: Dict, dtype) -> Dict:
    """Cast the float stem (conv1a/conv1b stays un-quantized — thin-input,
    precision-sensitive) to the pipeline's compute dtype in place.

    The int8 tensors (s8 weights, f32 scales) are left alone; only the
    stem kernel/bias/BN run in ``dtype`` so the image enters the network
    the same way as the bf16 path.
    """
    qp = qvars["int8"]
    for nm in ("conv1a", "conv1b"):
        qp[f"{nm}_kernel"] = qp[f"{nm}_kernel"].astype(dtype)
        qp[f"{nm}_bias"] = qp[f"{nm}_bias"].astype(dtype)
        qp[f"{nm}_bn"] = tuple(a.astype(dtype) for a in qp[f"{nm}_bn"])
    return qvars
