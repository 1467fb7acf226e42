"""Prototype: view-consistency of random-init SFD2 on the rendered world.

Renders two nearby views, extracts with a random-init SFD2, projects view
A's lifted 3D keypoints into view B, and measures (a) detection
repeatability (fraction with a view-B detection within r px) and (b)
descriptor cosine similarity at corresponding locations vs random pairs.
Run with JAX_PLATFORMS=cpu for a quick check or on the chip for bf16.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROTO_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pram_tpu.maps.rendered import make_world, ref_poses, query_pose
from pram_tpu.models.sfd2 import ResNet4x, extract, preprocess_image

W, H = 640, 480
CAM = (500.0, 500.0, W / 2, H / 2)


def main():
    rng = np.random.RandomState(0)
    world = make_world(rng)
    t0 = time.time()
    poses = ref_poses(12, rng)
    Ra, ta = poses[5]
    Rb, tb = query_pose(np.random.RandomState(42))
    img_a = world.render(Ra, ta, CAM, W, H)
    img_b = world.render(Rb, tb, CAM, W, H)
    print(f"render: {time.time()-t0:.2f}s  mean {img_a.mean():.3f} std {img_a.std():.3f}")

    sfd2 = ResNet4x()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    v = sfd2.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32))
    v = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, v
    )
    imgs = jnp.asarray(np.stack([img_a, img_b]))
    feats = extract(
        sfd2, v, preprocess_image(imgs).astype(dtype),
        max_keypoints=512, conf_th=1e-4,
    )
    kps = feats["keypoints"]
    xy = np.asarray(kps.xy, np.float64)
    mask = np.asarray(kps.mask)
    descs = np.asarray(feats["descriptors"], np.float32)
    print("n kpts:", mask.sum(1), "score range:",
          np.asarray(kps.scores)[0][mask[0]].min(),
          np.asarray(kps.scores)[0][mask[0]].max())

    # lift A's keypoints, project into B
    xyz, pid, lu, lv, ok = world.lift(xy[0][mask[0]], Ra, ta, CAM)
    xc = xyz @ Rb.T + tb
    uvb = np.stack(
        [xc[:, 0] / xc[:, 2] * CAM[0] + CAM[2],
         xc[:, 1] / xc[:, 2] * CAM[1] + CAM[3]], -1
    )
    infov = (
        ok & (xc[:, 2] > 0.2) & (uvb[:, 0] >= 8) & (uvb[:, 0] < W - 8)
        & (uvb[:, 1] >= 8) & (uvb[:, 1] < H - 8)
    )
    b_xy = xy[1][mask[1]]
    b_desc = descs[1][mask[1]]
    d2 = np.linalg.norm(uvb[infov][:, None] - b_xy[None], axis=-1)
    nn_d = d2.min(1)
    nn_j = d2.argmin(1)
    for r in (1.5, 2.5, 4.0):
        print(f"repeatability @{r}px: {(nn_d < r).mean():.3f} "
              f"({(nn_d < r).sum()}/{infov.sum()})")
    a_desc = descs[0][mask[0]][infov]
    close = nn_d < 2.5
    cos_match = (a_desc[close] * b_desc[nn_j[close]]).sum(-1)
    rnd = np.random.RandomState(1).permutation(len(b_desc))[: close.sum()]
    cos_rand = (a_desc[close] * b_desc[rnd]).sum(-1)
    print(f"desc cos at corr: mean {cos_match.mean():.3f} "
          f"p10 {np.percentile(cos_match, 10):.3f}; random pairs mean "
          f"{cos_rand.mean():.3f}")
    # would NN matching work outright?
    sim = a_desc[close] @ b_desc.T
    top = sim.argmax(1)
    print(f"NN-match correct: {(top == nn_j[close]).mean():.3f}")


if __name__ == "__main__":
    main()
