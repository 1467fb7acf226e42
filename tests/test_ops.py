"""Unit tests for core ops: NMS, keypoint selection, sampling, Sinkhorn.

Cross-checked against independently-written torch implementations of the same
published algorithms (SuperPoint NMS, grid_sample semantics, SuperGlue-style
Sinkhorn) to validate numerics without any reference weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pram_tpu.ops import (
    extract_keypoints,
    grid_sample_nchw,
    mutual_matches,
    normalize_keypoints,
    sample_descriptors,
    simple_nms,
    sinkhorn_matching,
)


def torch_simple_nms(scores, nms_radius):
    def max_pool(x):
        return F.max_pool2d(
            x, kernel_size=nms_radius * 2 + 1, stride=1, padding=nms_radius
        )

    zeros = torch.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(2):
        supp_mask = max_pool(max_mask.float()) > 0
        supp_scores = torch.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return torch.where(max_mask, scores, zeros)


@pytest.mark.parametrize("radius", [1, 3, 4])
def test_simple_nms_matches_torch(rng, radius):
    s = rng.rand(2, 48, 64).astype(np.float32)
    ours = np.asarray(simple_nms(jnp.asarray(s), radius))
    theirs = torch_simple_nms(torch.from_numpy(s)[:, None], radius)[:, 0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_simple_nms_basic_properties(rng):
    s = rng.rand(1, 64, 64).astype(np.float32)
    out = np.asarray(simple_nms(jnp.asarray(s), 4))[0]
    ys, xs = np.nonzero(out)
    # survivors keep their original scores
    np.testing.assert_array_equal(out[ys, xs], s[0, ys, xs])
    # the global maximum always survives
    gy, gx = np.unravel_index(np.argmax(s[0]), s[0].shape)
    assert out[gy, gx] == s[0, gy, gx]
    # strictly fewer survivors than pixels (suppression happened)
    assert len(ys) < 64 * 64 / 8


def test_extract_keypoints_topk_and_mask(rng):
    s = np.zeros((1, 32, 32), np.float32)
    # plant well-separated peaks
    peaks = [(8, 8, 0.9), (8, 24, 0.8), (24, 8, 0.7), (24, 24, 0.004)]
    for y, x, v in peaks:
        s[0, y, x] = v
    nmsed = simple_nms(jnp.asarray(s), 4)
    kp = extract_keypoints(
        nmsed, max_keypoints=8, conf_th=0.005, border=4, min_keypoints=0
    )
    mask = np.asarray(kp.mask[0])
    assert mask.sum() == 3  # 0.004 below threshold
    xy = np.asarray(kp.xy[0])[mask]
    got = {tuple(p) for p in xy.astype(int)}
    assert got == {(8, 8), (24, 8), (8, 24)}
    # scores sorted descending among valid
    sc = np.asarray(kp.scores[0])[mask]
    assert np.all(np.diff(sc) <= 0)


def test_extract_keypoints_border_and_fallback():
    s = np.zeros((1, 32, 32), np.float32)
    s[0, 1, 1] = 0.9  # inside border margin -> removed
    s[0, 16, 16] = 0.004  # below conf_th but above conf_th/2
    kp = extract_keypoints(
        jnp.asarray(s), max_keypoints=4, conf_th=0.005, border=4, min_keypoints=128
    )
    mask = np.asarray(kp.mask[0])
    xy = np.asarray(kp.xy[0])[mask]
    # fallback threshold admits the weak center point; border point removed
    assert mask.sum() == 1
    assert tuple(xy[0].astype(int)) == (16, 16)


def test_grid_sample_matches_torch(rng):
    img = rng.rand(1, 16, 20, 24).astype(np.float32)
    # normalized grid in [-1, 1]
    g = (rng.rand(1, 1, 50, 2) * 2 - 1).astype(np.float32)
    theirs = F.grid_sample(
        torch.from_numpy(img),
        torch.from_numpy(g),
        mode="bilinear",
        align_corners=True,
    ).numpy()[0, :, 0]  # [C, N]
    h, w = img.shape[2], img.shape[3]
    fx = (g[0, 0, :, 0] + 1) / 2 * (w - 1)
    fy = (g[0, 0, :, 1] + 1) / 2 * (h - 1)
    ours = np.asarray(
        grid_sample_nchw(
            jnp.asarray(img[0]), jnp.stack([jnp.asarray(fx), jnp.asarray(fy)], -1)
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def torch_sample_descriptors(keypoints, descriptors, s):
    b, c, h, w = descriptors.shape
    keypoints = keypoints - s / 2 + 0.5
    keypoints = keypoints / torch.tensor(
        [(w * s - s / 2 - 0.5), (h * s - s / 2 - 0.5)]
    ).to(keypoints)[None]
    keypoints = keypoints * 2 - 1
    descriptors = F.grid_sample(
        descriptors, keypoints.view(b, 1, -1, 2), mode="bilinear", align_corners=True
    )
    descriptors = F.normalize(descriptors.reshape(b, c, -1), p=2, dim=1)
    return descriptors


@pytest.mark.parametrize("stride", [4, 8])
def test_sample_descriptors_matches_torch(rng, stride):
    c, hc, wc = 32, 15, 20
    dmap = rng.randn(1, c, hc, wc).astype(np.float32)
    kpts = np.stack(
        [
            rng.rand(100) * (wc * stride - 1),
            rng.rand(100) * (hc * stride - 1),
        ],
        -1,
    ).astype(np.float32)
    theirs = (
        torch_sample_descriptors(
            torch.from_numpy(kpts)[None], torch.from_numpy(dmap), stride
        )
        .numpy()[0]
        .T
    )  # [N, C]
    ours = np.asarray(
        sample_descriptors(jnp.asarray(kpts), jnp.asarray(dmap[0]), stride)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def torch_sinkhorn(M, dustbin, iteration):
    eps = 1e-8
    M = torch.cat([M, dustbin.expand([M.shape[0], M.shape[1], 1])], dim=-1)
    M = torch.cat([M, dustbin.expand([M.shape[0], 1, M.shape[2]])], dim=-2)
    r = torch.ones([M.shape[0], M.shape[1] - 1])
    r = torch.cat([r, torch.ones([M.shape[0], 1]) * M.shape[1]], dim=-1)
    c = torch.ones([M.shape[0], M.shape[2] - 1])
    c = torch.cat([c, torch.ones([M.shape[0], 1]) * M.shape[2]], dim=-1)
    p = torch.softmax(M, dim=-1)
    u = torch.ones_like(r)
    v = torch.ones_like(c)
    for _ in range(iteration):
        u = r / ((p * v.unsqueeze(-2)).sum(-1) + eps)
        v = c / ((p * u.unsqueeze(-1)).sum(-2) + eps)
    return p * u.unsqueeze(-1) * v.unsqueeze(-2)


def test_sinkhorn_matches_torch(rng):
    sim = rng.randn(2, 17, 23).astype(np.float32)
    ours = np.asarray(
        sinkhorn_matching(jnp.asarray(sim), jnp.asarray(1.0), num_iters=20)
    )
    theirs = torch_sinkhorn(torch.from_numpy(sim), torch.tensor(1.0), 20).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_sinkhorn_masked_equals_unpadded(rng):
    n, m, npad, mpad = 11, 13, 16, 16
    sim_small = rng.randn(1, n, m).astype(np.float32)
    plan_small = np.asarray(
        sinkhorn_matching(jnp.asarray(sim_small), jnp.asarray(0.5), num_iters=20)
    )
    sim_big = rng.randn(1, npad, mpad).astype(np.float32)
    sim_big[:, :n, :m] = sim_small
    mask0 = np.zeros((1, npad), bool)
    mask0[:, :n] = True
    mask1 = np.zeros((1, mpad), bool)
    mask1[:, :m] = True
    plan_big = np.asarray(
        sinkhorn_matching(
            jnp.asarray(sim_big),
            jnp.asarray(0.5),
            num_iters=20,
            mask0=jnp.asarray(mask0),
            mask1=jnp.asarray(mask1),
        )
    )
    # valid block identical to unpadded run
    np.testing.assert_allclose(
        plan_big[:, :n, :m], plan_small[:, :n, :m], atol=2e-5
    )
    # padded rows/cols carry (almost) no mass
    assert np.abs(plan_big[:, n:-1, :]).max() < 1e-5
    assert np.abs(plan_big[:, :, m:-1]).max() < 1e-5


def test_mutual_matches_roundtrip(rng):
    # construct a plan with a known assignment
    n = 8
    plan = np.full((1, n + 1, n + 1), 0.01, np.float32)
    perm = rng.permutation(n)
    for i, j in enumerate(perm):
        plan[0, i, j] = 0.9
    plan[0, 3, perm[3]] = 0.05  # below threshold -> unmatched
    res = mutual_matches(jnp.asarray(plan), threshold=0.2)
    m0 = np.asarray(res.matches0[0])
    for i in range(n):
        if i == 3:
            assert m0[i] == -1
        else:
            assert m0[i] == perm[i]


def test_normalize_keypoints_matches_reference_semantics():
    kpts = jnp.asarray([[[0.0, 0.0], [640.0, 480.0], [320.0, 240.0]]])
    out = np.asarray(normalize_keypoints(kpts, (480, 640)))
    # center (320, 240), scaling 0.7*640
    np.testing.assert_allclose(
        out[0],
        np.array(
            [
                [-320 / 448, -240 / 448],
                [320 / 448, 240 / 448],
                [0, 0],
            ],
            np.float32,
        ),
        atol=1e-6,
    )
