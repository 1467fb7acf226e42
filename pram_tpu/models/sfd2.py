"""SFD2 (ResNet4x) detector/descriptor — flax, NHWC, TPU-friendly.

Rebuild of the reference extractor (nets/sfd2.py:127-369): a ResNet-style
backbone at stride 4, a 65-channel softmax + 8x8 pixel-shuffle score decoder
at full resolution, an L2-normalized 128-d descriptor map at stride 4, and a
256-d stride-4 ``mid_features`` map sampled as recognition-token descriptors.

TPU-first choices:
- NHWC layout (XLA's native conv layout on TPU) with grouped 3x3 convs on the
  MXU; batchnorm runs in inference mode with stored statistics (the extractor
  is frozen even during reference training, trainer.py:118).
- Keypoint extraction is fixed-shape: NMS (ops/nms.py) + static top-K with
  validity mask (ops/keypoints.py), fused into one jit with descriptor
  sampling — the whole extract step is a single compiled program.

Weight conversion from the reference torch checkpoint: models/convert.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pram_tpu.ops.keypoints import Keypoints, extract_keypoints
from pram_tpu.ops.nms import simple_nms
from pram_tpu.ops.sampling import sample_descriptors

# ImageNet RGB normalization (nets/sfd2.py:14-17)
RGB_MEAN = (0.485, 0.456, 0.406)
RGB_STD = (0.229, 0.224, 0.225)


class _Conv3x3Params(nn.Module):
    """Bare 3x3 conv parameters with nn.Conv's init and naming.

    Lets a module compute custom conv math (e.g. the space-to-depth
    formulation below) while keeping the exact ``<name>/conv/{kernel,bias}``
    parameter tree the converters and checkpoints expect.
    """

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _conv3x3_s2d(x: jax.Array, kernel: jax.Array, bias: jax.Array):
    """3x3 stride-1 SAME conv via 2x2 space-to-depth phases.

    For thin inputs (3 channels) XLA pads the contraction dim of a direct
    conv to the full MXU width, issuing ~42x the useful FLOPs. Rewriting the
    conv as four 2x2 convs over the 12-channel space-to-depth transform cuts
    the issued (padded) FLOPs ~2.3x while staying bit-equivalent: each output
    phase (py, px) only touches a 2x2 neighbourhood of the transformed map.

    Args:
      x: ``[B, H, W, C]``, H and W even.
      kernel: ``[3, 3, C, F]``.
      bias: ``[F]``.
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    yh, xw = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x2 = xp.reshape(b, yh + 1, 2, xw + 1, 2, c)
    x2 = jnp.transpose(x2, (0, 1, 3, 2, 4, 5)).reshape(
        b, yh + 1, xw + 1, 4 * c
    )

    # phase kernels: k2[py, px][a, bb, (ry, rx, c), f] = kernel[2a+ry-py,
    # 2bb+rx-px, c, f] where the tap index is in range, else 0
    k2 = jnp.zeros((2, 2, 2, 2, 2, 2, c, f), kernel.dtype)
    for py in range(2):
        for px in range(2):
            for a in range(2):
                for bb in range(2):
                    for ry in range(2):
                        for rx in range(2):
                            di = 2 * a + ry - py
                            dj = 2 * bb + rx - px
                            if 0 <= di < 3 and 0 <= dj < 3:
                                k2 = k2.at[py, px, a, bb, ry, rx].set(
                                    kernel[di, dj]
                                )

    phases = []
    for py in range(2):
        row = []
        for px in range(2):
            out = jax.lax.conv_general_dilated(
                x2,
                k2[py, px].reshape(2, 2, 4 * c, f),
                (1, 1),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype,
            )
            row.append(out)
        phases.append(row)
    ph = jnp.stack([jnp.stack(r) for r in phases])  # [py, px, B, Y, X, F]
    y = jnp.transpose(ph, (2, 3, 0, 4, 1, 5)).reshape(b, h, w, f)
    return y + bias


class _BNParams(nn.Module):
    """Bare BatchNorm parameters/stats with nn.BatchNorm's naming.

    Used by the fused Pallas stem path: the parameters live in the same
    ``<name>/bn/{scale,bias}`` + ``batch_stats/<name>/bn/{mean,var}`` slots
    as ConvBNReLU's nn.BatchNorm, so checkpoints and converters are
    path-agnostic.
    """

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None,
            (self.features,),
        )
        var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None,
            (self.features,),
        )
        return scale, bias, mean.value, var.value


class _ConvBNParams(nn.Module):
    """Parameter container matching ConvBNReLU's tree (conv + bn)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel, bias = _Conv3x3Params(
            self.in_features, self.features, name="conv"
        )()
        bn = _BNParams(self.features, name="bn")()
        return kernel, bias, bn


class ConvBNReLU(nn.Module):
    """3x3 conv + BN + ReLU (reference ``conv`` helper, nets/sfd2.py:78-91)."""

    features: int
    stride: int = 1
    use_bn: bool = True
    s2d: bool = False  # space-to-depth conv for thin inputs (stride 1 only)

    @nn.compact
    def __call__(self, x):
        # the reference's conv helper keeps the conv bias even when followed
        # by BN (nets/sfd2.py:86-91 uses torch Conv2d defaults)
        if self.s2d and self.stride == 1 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            kernel, bias = _Conv3x3Params(
                x.shape[-1], self.features, name="conv"
            )()
            x = _conv3x3_s2d(x, kernel, bias)
        else:
            x = nn.Conv(
                self.features,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=1,
                use_bias=True,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, name="bn")(x)
        return nn.relu(x)


class _GroupedConv3x3Dense(nn.Module):
    """Grouped 3x3 conv executed as a dense conv with a block-diagonal kernel.

    XLA lowers feature_group_count=32 (8 ch/group) convs to a fragmented
    schedule on TPU; zero-expanding the grouped kernel into a dense
    [3,3,C,C] block-diagonal one trades 8x redundant FLOPs for full MXU
    tiles — measured ~1.4x faster on the 3-ResBlock stage (30 -> 21 ms at
    batch 32 bf16), bit-identical results. Parameter layout matches
    nn.Conv's grouped kernel ([3, 3, C/g, F]), keeping converter and
    checkpoint compatibility.
    """

    features: int
    groups: int = 32
    # channels per dense split: groups are packed into independent dense
    # convs of this width. 128 matches the MXU lane width, so each split
    # runs at full tile utilization while carrying only split/ipg groups'
    # worth of zero-padding — at 256ch/32g this halves the redundant FLOPs
    # vs one 256-wide block-diagonal conv (measured faster, bit-identical).
    split: int = 128

    @nn.compact
    def __call__(self, x):
        g = self.groups
        c = x.shape[-1]
        ipg = c // g
        opg = self.features // g
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, ipg, self.features),
        )
        split = min(self.split, c)
        gs = split // ipg  # groups per split
        n_split = g // gs
        kg = kernel.reshape(3, 3, ipg, n_split, gs, opg)
        eye = jnp.eye(gs, dtype=kernel.dtype)
        outs = []
        for si in range(n_split):
            dense = jnp.einsum("hwigo,Gg->hwGigo", kg[:, :, :, si], eye).reshape(
                3, 3, split, gs * opg
            )
            outs.append(
                jax.lax.conv_general_dilated(
                    x[..., si * split : (si + 1) * split],
                    dense,
                    (1, 1),
                    [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=x.dtype,
                )
            )
        return outs[0] if n_split == 1 else jnp.concatenate(outs, axis=-1)


class ResBlock(nn.Module):
    """1x1 -> grouped 3x3 -> 1x1 bottleneck with identity (nets/sfd2.py:94-124)."""

    features: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = _GroupedConv3x3Dense(
            self.features, groups=self.groups, name="conv2"
        )(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn3")(y)
        return nn.relu(y + identity)


def pixel_shuffle_score(semi: jax.Array) -> jax.Array:
    """Decode the 64-channel cell scores into a full-resolution map.

    Matches the reference permutation (nets/sfd2.py:188-192): channel
    c = i*8 + j is the score of sub-pixel (row i, col j) in each 8x8 cell.

    Args:
      semi: ``[B, Hc, Wc, 64]`` (NHWC; dustbin channel already dropped).

    Returns:
      ``[B, Hc*8, Wc*8]`` score map.
    """
    b, hc, wc, _ = semi.shape
    s = semi.reshape(b, hc, wc, 8, 8)
    s = jnp.transpose(s, (0, 1, 3, 2, 4))  # [B, Hc, 8, Wc, 8]
    return s.reshape(b, hc * 8, wc * 8)


class ResNet4x(nn.Module):
    """SFD2 backbone + detector/descriptor heads.

    ``__call__`` returns the dense outputs; use :func:`extract` for the
    fused fixed-shape keypoint pipeline.
    """

    inputdim: int = 3
    outdim: int = 128
    # fused Pallas stem (conv1a+conv1b in one kernel, ops/stem_pallas.py):
    # None = auto (on for TPU backends when shapes allow), True/False force.
    use_pallas_stem: Optional[bool] = None

    def _stem_enabled(self, image: jax.Array) -> bool:
        h, w = image.shape[1], image.shape[2]
        shapes_ok = (
            image.shape[-1] == 3 and h % 16 == 0 and w % 2 == 0
        )
        if self.use_pallas_stem is not None:
            return self.use_pallas_stem and shapes_ok
        from pram_tpu.utils.pallas_gate import tpu_pallas_ok

        return shapes_ok and tpu_pallas_ok()

    @nn.compact
    def __call__(self, image: jax.Array) -> dict:
        """Dense forward.

        Args:
          image: ``[B, H, W, 3]`` RGB, already ImageNet-normalized, H and W
            divisible by 8.

        Returns:
          dict with ``score_map`` ``[B, H, W]``, ``desc_map`` ``[B, H/4, W/4,
          outdim]`` (L2-normalized), ``mid_features`` ``[B, H/4, W/4, 256]``,
          ``logits`` ``[B, H/8, W/8, 65]``.
        """
        d1, d2, d3 = 64, 128, 256
        # NOTE: s2d=True was measured SLOWER end-to-end (41 vs 16 ms/b32) —
        # the full-res space-to-depth relayouts cost more than the padded
        # conv FLOPs they save; keep the direct conv.
        if self._stem_enabled(image):
            from pram_tpu.ops.stem_pallas import fused_stem

            k1, c1, bn1 = _ConvBNParams(3, d1, name="conv1a")()
            k2, c2, bn2 = _ConvBNParams(d1, d1, name="conv1b")()
            out1b = fused_stem(image, k1, c1, bn1, k2, c2, bn2)
        else:
            out1a = ConvBNReLU(d1, name="conv1a")(image)
            out1b = ConvBNReLU(d1, stride=2, name="conv1b")(out1a)
        out2a = ConvBNReLU(d2, name="conv2a")(out1b)
        out2b = ConvBNReLU(d2, stride=2, name="conv2b")(out2a)
        # NOTE: a fused Pallas conv3a+conv3b (ops/convpair_pallas.py) was
        # measured SLOWER than XLA here (11.3 vs 9.4 ms/b32): these thick
        # stride-1 convs are FLOP-bound and XLA already runs them at the
        # MXU roofline, so fusing the HBM intermediate can't pay for the
        # kernel's per-tile overhead. Keep XLA.
        out3a = ConvBNReLU(d3, name="conv3a")(out2b)
        out3b = ConvBNReLU(d3, name="conv3b")(out3a)
        out4 = out3b
        for i in range(3):
            out4 = ResBlock(256, name=f"res_{i}")(out4)

        # detector head (stride 8): conv s2 + BN + ReLU + conv, then 65-way
        # softmax and pixel shuffle (nets/sfd2.py:156-169,184-192)
        cpa = nn.Conv(256, (3, 3), strides=(2, 2), padding=1, name="convPa_0")(
            out4
        )
        cpa = nn.BatchNorm(use_running_average=True, name="convPa_bn")(cpa)
        cpa = nn.relu(cpa)
        cpa = nn.Conv(256, (3, 3), padding=1, name="convPa_3")(cpa)
        logits = nn.Conv(65, (1, 1), name="convPb")(cpa)
        full_semi = jax.nn.softmax(logits, axis=-1)
        score_map = pixel_shuffle_score(full_semi[..., :-1])

        # descriptor head (stride 4)
        cda = nn.Conv(256, (3, 3), padding=1, name="convDa_0")(out4)
        cda = nn.BatchNorm(use_running_average=True, name="convDa_bn")(cda)
        cda = nn.relu(cda)
        cda = nn.Conv(256, (3, 3), padding=1, name="convDa_3")(cda)
        desc = nn.Conv(self.outdim, (1, 1), name="convDb")(cda)
        norm = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
        desc = desc / jnp.maximum(norm, 1e-12)

        return {
            "score_map": score_map,
            "desc_map": desc,
            "mid_features": out4,
            "logits": logits,
        }


def preprocess_image(image_rgb01: jax.Array) -> jax.Array:
    """ImageNet-normalize an RGB image in [0, 1] (nets/sfd2.py:14-17)."""
    mean = jnp.asarray(RGB_MEAN, image_rgb01.dtype)
    std = jnp.asarray(RGB_STD, image_rgb01.dtype)
    return (image_rgb01 - mean) / std


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "max_keypoints",
        "conf_th",
        "border",
        "min_keypoints",
        "nms_radius",
        "use_pallas_nms",
    ),
)
def extract(
    model: ResNet4x,
    variables,
    image: jax.Array,
    *,
    max_keypoints: int = 4096,
    conf_th: float = 0.005,
    border: int = 4,
    min_keypoints: int = 128,
    nms_radius: int = 4,
    use_pallas_nms: Optional[bool] = None,
):
    """Fused SFD2 extraction: dense forward + NMS + top-K + desc sampling.

    Fixed-shape equivalent of the reference's ``extract_local_global``
    (nets/sfd2.py:269-346). Returns per-image keypoints (padded to
    ``max_keypoints`` with mask), matching descriptors (sampled from
    ``desc_map``) and recognition-token descriptors (sampled from
    ``mid_features`` then L2-normalized, like ``sample()``
    nets/sfd2.py:348-369).

    Args:
      model: the flax module (static).
      variables: {'params': ..., 'batch_stats': ...}.
      image: ``[B, H, W, 3]`` ImageNet-normalized.

    Returns:
      dict of keypoints (Keypoints), descriptors ``[B, K, outdim]``,
      seg_descriptors ``[B, K, 256]``, score_map, desc_map, mid_features.
    """
    out = model.apply(variables, image)
    score_map = out["score_map"]
    nms_ok = score_map.shape[1] % 8 == 0 and nms_radius > 0
    if use_pallas_nms is None:
        from pram_tpu.utils.pallas_gate import tpu_pallas_ok

        use_pallas_nms = tpu_pallas_ok()
    if use_pallas_nms and nms_ok:
        from pram_tpu.ops.nms_pallas import simple_nms_pallas

        nms = simple_nms_pallas(score_map, nms_radius)
    else:
        nms = simple_nms(score_map, nms_radius)
    kps: Keypoints = extract_keypoints(
        nms,
        max_keypoints=max_keypoints,
        conf_th=conf_th,
        border=border,
        min_keypoints=min_keypoints,
        nms_radius=nms_radius,
    )

    # NHWC -> CHW per image for the sampler
    def per_image(kxy, dmap, mid):
        d = sample_descriptors(kxy, jnp.transpose(dmap, (2, 0, 1)), 4)
        m = sample_descriptors(kxy, jnp.transpose(mid, (2, 0, 1)), 4)
        return d, m

    descs, seg_descs = jax.vmap(per_image)(
        kps.xy, out["desc_map"], out["mid_features"]
    )
    return {
        "keypoints": kps,
        "descriptors": descs,
        "seg_descriptors": seg_descs,
        "score_map": out["score_map"],
        "desc_map": out["desc_map"],
        "mid_features": out["mid_features"],
    }


class DescriptorCompressor(nn.Module):
    """Compress 128-d SFD2 descriptors to 64/32-d and re-normalize.

    Reference: nets/sfd2.py:357-383 (1x1 Conv1d over [B, C, N] + L2 norm);
    wired via config['feat_dim'] in main.py:50-63. Here tokens are
    channel-last, so the 1x1 conv is a Dense over the last axis.
    """

    outdim: int = 64

    @nn.compact
    def __call__(self, descs: jax.Array) -> jax.Array:
        # descs: [..., N, C_in] -> [..., N, outdim], unit-norm rows
        out = nn.Dense(self.outdim, name="conv")(descs)
        norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out / jnp.maximum(norm, 1e-12)
