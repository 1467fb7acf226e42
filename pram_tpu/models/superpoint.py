"""SuperPoint detector/descriptor — flax, NHWC.

Rebuild of the reference's alternative extractor (nets/superpoint.py:99-240):
VGG-style encoder with 2x2 max-pools (stride 8), 65-channel softmax + pixel
shuffle detector, 256-d descriptor head. Grayscale input. Interface mirrors
models/sfd2.py: dense ``__call__`` + fused fixed-shape :func:`extract`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from pram_tpu.models.sfd2 import pixel_shuffle_score
from pram_tpu.ops.keypoints import Keypoints, extract_keypoints
from pram_tpu.ops.nms import simple_nms
from pram_tpu.ops.sampling import sample_descriptors


def _pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class SuperPoint(nn.Module):
    """SuperPoint (DeTone et al., CVPRW'18) in NHWC flax."""

    descriptor_dim: int = 256

    @nn.compact
    def __call__(self, image: jax.Array) -> dict:
        """Dense forward.

        Args:
          image: ``[B, H, W, 1]`` grayscale in [0, 1], H, W divisible by 8.
        """
        c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
        x = nn.relu(nn.Conv(c1, (3, 3), padding=1, name="conv1a")(image))
        x = nn.relu(nn.Conv(c1, (3, 3), padding=1, name="conv1b")(x))
        x = _pool(x)
        x = nn.relu(nn.Conv(c2, (3, 3), padding=1, name="conv2a")(x))
        x = nn.relu(nn.Conv(c2, (3, 3), padding=1, name="conv2b")(x))
        x = _pool(x)
        x = nn.relu(nn.Conv(c3, (3, 3), padding=1, name="conv3a")(x))
        x = nn.relu(nn.Conv(c3, (3, 3), padding=1, name="conv3b")(x))
        x = _pool(x)
        x = nn.relu(nn.Conv(c4, (3, 3), padding=1, name="conv4a")(x))
        x3 = nn.relu(nn.Conv(c4, (3, 3), padding=1, name="conv4b")(x))

        cpa = nn.relu(nn.Conv(c5, (3, 3), padding=1, name="convPa")(x3))
        logits = nn.Conv(65, (1, 1), name="convPb")(cpa)
        semi = jax.nn.softmax(logits, axis=-1)[..., :-1]
        score_map = pixel_shuffle_score(semi)

        cda = nn.relu(nn.Conv(c5, (3, 3), padding=1, name="convDa")(x3))
        desc = nn.Conv(self.descriptor_dim, (1, 1), name="convDb")(cda)
        norm = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True))
        desc = desc / jnp.maximum(norm, 1e-12)
        return {
            "score_map": score_map,
            "desc_map": desc,
            # reference mid_features for SuperPoint is cDa (256-d, stride 8,
            # nets/superpoint.py:233)
            "mid_features": cda,
        }


@partial(
    jax.jit,
    static_argnames=(
        "model",
        "max_keypoints",
        "conf_th",
        "border",
        "min_keypoints",
        "nms_radius",
    ),
)
def extract(
    model: SuperPoint,
    variables,
    image: jax.Array,
    *,
    max_keypoints: int = 4096,
    conf_th: float = 0.001,
    border: int = 4,
    min_keypoints: int = 32,
    nms_radius: int = 3,
):
    """Fused extraction (reference nets/superpoint.py:171-240), stride 8."""
    out = model.apply(variables, image)
    nms = simple_nms(out["score_map"], nms_radius)
    kps: Keypoints = extract_keypoints(
        nms,
        max_keypoints=max_keypoints,
        conf_th=conf_th,
        border=border,
        min_keypoints=min_keypoints,
    )

    def per_image(kxy, dmap, mid):
        d = sample_descriptors(kxy, jnp.transpose(dmap, (2, 0, 1)), 8)
        m = sample_descriptors(kxy, jnp.transpose(mid, (2, 0, 1)), 8)
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
