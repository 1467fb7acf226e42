"""Torch models mirroring the reference architectures, for parity testing.

These are written to have the *same state_dict layout* as the reference
checkpoints (nets/sfd2.py, nets/segnetvit.py, nets/gml.py, nets/adagml.py) so
that pram_tpu.models.convert can be validated end-to-end on random weights:
torch forward == flax forward after conversion.
"""

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


def rotate_half(x):
    x = x.unflatten(-1, (-1, 2))
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).flatten(start_dim=-2)


def apply_rot(freqs, t):
    return (t * freqs[0]) + (rotate_half(t) * freqs[1])


class FourierPE(nn.Module):
    def __init__(self, m, f_dim):
        super().__init__()
        self.Wr = nn.Linear(m, f_dim // 2, bias=False)

    def forward(self, x):
        p = self.Wr(x)
        emb = torch.stack([torch.cos(p), torch.sin(p)], 0).unsqueeze(-3)
        return emb.repeat_interleave(2, dim=-1)


class SelfMHA(nn.Module):
    def __init__(self, feat_dim, hidden_dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(feat_dim, hidden_dim * 3)
        self.proj = nn.Linear(hidden_dim, hidden_dim)
        self.mlp = nn.Sequential(
            nn.Linear(feat_dim + hidden_dim, feat_dim * 2),
            nn.LayerNorm(feat_dim * 2),
            nn.GELU(),
            nn.Linear(feat_dim * 2, feat_dim),
        )

    def forward(self, x, enc=None):
        qkv = self.qkv(x)
        qkv = qkv.unflatten(-1, (self.num_heads, -1, 3)).transpose(1, 2)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        if enc is not None:
            q = apply_rot(enc, q)
            k = apply_rot(enc, k)
        s = q.shape[-1] ** -0.5
        attn = F.softmax(torch.einsum("...id,...jd->...ij", q, k) * s, -1)
        a = torch.einsum("...ij,...jd->...id", attn, v)
        msg = self.proj(a.transpose(1, 2).flatten(start_dim=-2))
        return x + self.mlp(torch.cat([x, msg], -1))


class CrossMHA(nn.Module):
    def __init__(self, feat_dim, hidden_dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        dim_head = hidden_dim // num_heads
        self.scale = dim_head**-0.5
        self.to_qk = nn.Linear(feat_dim, hidden_dim)
        self.to_v = nn.Linear(feat_dim, hidden_dim)
        self.proj = nn.Linear(hidden_dim, hidden_dim)
        self.mlp = nn.Sequential(
            nn.Linear(feat_dim + hidden_dim, feat_dim * 2),
            nn.LayerNorm(feat_dim * 2),
            nn.GELU(),
            nn.Linear(feat_dim * 2, feat_dim),
        )

    def forward(self, x0, x1):
        qk0, qk1 = self.to_qk(x0), self.to_qk(x1)
        v0, v1 = self.to_v(x0), self.to_v(x1)
        qk0, qk1, v0, v1 = map(
            lambda t: t.unflatten(-1, (self.num_heads, -1)).transpose(1, 2),
            (qk0, qk1, v0, v1),
        )
        qk0 = qk0 * self.scale**0.5
        qk1 = qk1 * self.scale**0.5
        sim = torch.einsum("bhid,bhjd->bhij", qk0, qk1)
        attn01 = F.softmax(sim, dim=-1)
        attn10 = F.softmax(sim.transpose(-2, -1).contiguous(), dim=-1)
        m0 = torch.einsum("bhij,bhjd->bhid", attn01, v1)
        m1 = torch.einsum(
            "bhji,bhjd->bhid", attn10.transpose(-2, -1), v0
        )
        m0 = self.proj(m0.transpose(1, 2).flatten(start_dim=-2))
        m1 = self.proj(m1.transpose(1, 2).flatten(start_dim=-2))
        x0 = x0 + self.mlp(torch.cat([x0, m0], -1))
        x1 = x1 + self.mlp(torch.cat([x1, m1], -1))
        return x0, x1


class TorchSegNetViT(nn.Module):
    """State-dict mirror of reference nets/segnetvit.py:124-203."""

    def __init__(self, desc_dim=256, hidden=256, heads=4, n_layers=15,
                 out_dim=1024, n_class=113):
        super().__init__()
        head_dim = hidden // heads

        class GNN(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [SelfMHA(hidden, hidden, heads) for _ in range(n_layers)]
                )

        self.gnn = GNN()
        self.kenc = FourierPE(2, head_dim)
        self.input_proj = nn.Linear(desc_dim, hidden)
        self.seg = nn.Sequential(
            nn.Linear(hidden, out_dim),
            nn.LayerNorm(out_dim),
            nn.GELU(),
            nn.Linear(out_dim, n_class),
        )

    def forward(self, desc, norm_kpts):
        enc = self.kenc(norm_kpts)
        x = self.input_proj(desc)
        for layer in self.gnn.layers:
            x = layer(x, enc)
        return self.seg(x)


def torch_sink(M, dustbin, iteration):
    eps = 1e-8
    M = torch.cat([M, dustbin.expand([M.shape[0], M.shape[1], 1])], dim=-1)
    M = torch.cat([M, dustbin.expand([M.shape[0], 1, M.shape[2]])], dim=-2)
    r = torch.ones([M.shape[0], M.shape[1] - 1])
    r = torch.cat([r, torch.ones([M.shape[0], 1]) * M.shape[1]], dim=-1)
    c = torch.ones([M.shape[0], M.shape[2] - 1])
    c = torch.cat([c, torch.ones([M.shape[0], 1]) * M.shape[2]], dim=-1)
    p = torch.softmax(M, dim=-1)
    u, v = torch.ones_like(r), torch.ones_like(c)
    for _ in range(iteration):
        u = r / ((p * v.unsqueeze(-2)).sum(-1) + eps)
        v = c / ((p * u.unsqueeze(-1)).sum(-2) + eps)
    return p * u.unsqueeze(-1) * v.unsqueeze(-2)


class TorchGML(nn.Module):
    """State-dict mirror of reference nets/gml.py:189-302."""

    def __init__(self, desc_dim=128, hidden=256, heads=4, n_layers=9,
                 sinkhorn_iters=20):
        super().__init__()
        self.n_layers = n_layers
        self.sinkhorn_iters = sinkhorn_iters
        self.input_proj = nn.Linear(desc_dim, hidden)
        self.self_attn = nn.ModuleList(
            [SelfMHA(hidden, hidden, heads) for _ in range(n_layers)]
        )
        self.cross_attn = nn.ModuleList(
            [CrossMHA(hidden, hidden, heads) for _ in range(n_layers)]
        )
        self.poseenc = FourierPE(2, hidden // heads)
        self.out_proj = nn.ModuleList(
            [nn.Linear(hidden, hidden) for _ in range(n_layers)]
        )
        self.register_parameter(
            "bin_score", torch.nn.Parameter(torch.tensor(1.0))
        )

    def forward(self, desc0, desc1, nk0, nk1):
        x0 = self.input_proj(desc0)
        x1 = self.input_proj(desc1)
        enc0, enc1 = self.poseenc(nk0), self.poseenc(nk1)
        for i in range(self.n_layers):
            x0 = self.self_attn[i](x0, enc0)
            x1 = self.self_attn[i](x1, enc1)
            x0, x1 = self.cross_attn[i](x0, x1)
        d = x0.shape[-1]
        md0 = self.out_proj[self.n_layers - 1](x0) / d**0.25
        md1 = self.out_proj[self.n_layers - 1](x1) / d**0.25
        dist = torch.einsum("bmd,bnd->bmn", md0, md1)
        return torch_sink(dist, self.bin_score, self.sinkhorn_iters)


def _conv_bn_relu(cin, cout, stride=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, stride=stride, padding=1),
        nn.BatchNorm2d(cout),
        nn.ReLU(inplace=True),
    )


class TorchResBlock(nn.Module):
    def __init__(self, planes, groups=32):
        super().__init__()
        self.conv1 = nn.Conv2d(planes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(
            planes, planes, 3, padding=1, groups=groups, bias=False
        )
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + x)


class TorchSFD2(nn.Module):
    """State-dict mirror of reference nets/sfd2.py:127-233."""

    def __init__(self, outdim=128):
        super().__init__()
        d1, d2, d3 = 64, 128, 256
        self.conv1a = _conv_bn_relu(3, d1)
        self.conv1b = _conv_bn_relu(d1, d1, stride=2)
        self.conv2a = _conv_bn_relu(d1, d2)
        self.conv2b = _conv_bn_relu(d2, d2, stride=2)
        self.conv3a = _conv_bn_relu(d2, d3)
        self.conv3b = _conv_bn_relu(d3, d3)
        self.conv4 = nn.Sequential(
            TorchResBlock(256), TorchResBlock(256), TorchResBlock(256)
        )
        self.convPa = nn.Sequential(
            nn.Conv2d(256, 256, 3, stride=2, padding=1),
            nn.BatchNorm2d(256),
            nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, padding=1),
        )
        self.convDa = nn.Sequential(
            nn.Conv2d(256, 256, 3, padding=1),
            nn.BatchNorm2d(256),
            nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, padding=1),
        )
        self.convPb = nn.Conv2d(256, 65, 1)
        self.convDb = nn.Conv2d(256, outdim, 1)

    def forward(self, x):
        x = self.conv1b(self.conv1a(x))
        x = self.conv2b(self.conv2a(x))
        x = self.conv3b(self.conv3a(x))
        out4 = self.conv4(x)
        logits = self.convPb(self.convPa(out4))
        semi = torch.softmax(logits, dim=1)[:, :-1]
        hc, wc = semi.shape[2], semi.shape[3]
        score = semi.permute(0, 2, 3, 1).reshape(-1, hc, wc, 8, 8)
        score = score.permute(0, 1, 3, 2, 4).reshape(-1, hc * 8, wc * 8)
        desc = self.convDb(self.convDa(out4))
        desc = F.normalize(desc, dim=1)
        return score, desc, out4


class TorchSuperPoint(nn.Module):
    """State-dict mirror of reference nets/superpoint.py:99-240."""

    def __init__(self, descriptor_dim=256):
        super().__init__()
        c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
        self.relu = nn.ReLU(inplace=True)
        self.pool = nn.MaxPool2d(kernel_size=2, stride=2)
        self.conv1a = nn.Conv2d(1, c1, 3, padding=1)
        self.conv1b = nn.Conv2d(c1, c1, 3, padding=1)
        self.conv2a = nn.Conv2d(c1, c2, 3, padding=1)
        self.conv2b = nn.Conv2d(c2, c2, 3, padding=1)
        self.conv3a = nn.Conv2d(c2, c3, 3, padding=1)
        self.conv3b = nn.Conv2d(c3, c3, 3, padding=1)
        self.conv4a = nn.Conv2d(c3, c4, 3, padding=1)
        self.conv4b = nn.Conv2d(c4, c4, 3, padding=1)
        self.convPa = nn.Conv2d(c4, c5, 3, padding=1)
        self.convPb = nn.Conv2d(c5, 65, 1)
        self.convDa = nn.Conv2d(c4, c5, 3, padding=1)
        self.convDb = nn.Conv2d(c5, descriptor_dim, 1)

    def forward(self, x):
        x = self.relu(self.conv1a(x)); x = self.relu(self.conv1b(x)); x = self.pool(x)
        x = self.relu(self.conv2a(x)); x = self.relu(self.conv2b(x)); x = self.pool(x)
        x = self.relu(self.conv3a(x)); x = self.relu(self.conv3b(x)); x = self.pool(x)
        x = self.relu(self.conv4a(x)); x3 = self.relu(self.conv4b(x))
        cpa = self.relu(self.convPa(x3))
        score = torch.softmax(self.convPb(cpa), 1)[:, :-1]
        b, _, h, w = score.shape
        score = score.permute(0, 2, 3, 1).reshape(b, h, w, 8, 8)
        score = score.permute(0, 1, 3, 2, 4).reshape(b, h * 8, w * 8)
        cda = self.relu(self.convDa(x3))
        desc = F.normalize(self.convDb(cda), p=2, dim=1)
        return score, desc, cda


class PoolingLayerT(nn.Module):
    """Mirror of nets/adagml.py:114-138."""

    def __init__(self, hidden_dim, score_dim=2):
        super().__init__()
        self.score_enc = nn.Sequential(
            nn.Linear(score_dim, hidden_dim),
            nn.LayerNorm(hidden_dim),
            nn.GELU(),
            nn.Linear(hidden_dim, hidden_dim),
        )
        self.proj = nn.Linear(hidden_dim, hidden_dim)
        self.predict = nn.Sequential(
            nn.Linear(hidden_dim * 2, hidden_dim),
            nn.LayerNorm(hidden_dim),
            nn.GELU(),
            nn.Linear(hidden_dim, 1),
        )

    def forward(self, x, score):
        s = self.score_enc(score)
        c = self.predict(torch.cat([self.proj(x), s], -1))
        return torch.sigmoid(c)


class TorchAdaGML(nn.Module):
    """State-dict mirror of reference nets/adagml.py:232-404 (inference,
    WITHOUT pruning: produces the full-plan path for converter validation)."""

    def __init__(self, desc_dim=128, hidden=256, heads=4, n_layers=9,
                 sinkhorn_iters=20):
        super().__init__()
        self.n_layers = n_layers
        self.sinkhorn_iters = sinkhorn_iters
        self.input_proj = nn.Linear(desc_dim, hidden)
        self.self_attn = nn.ModuleList(
            [SelfMHA(hidden, hidden, heads) for _ in range(n_layers)]
        )
        self.cross_attn = nn.ModuleList(
            [CrossMHA(hidden, hidden, heads) for _ in range(n_layers)]
        )
        self.poseenc = FourierPE(2, hidden // heads)
        self.out_proj = nn.ModuleList(
            [nn.Linear(hidden, hidden) for _ in range(n_layers)]
        )
        self.register_parameter(
            "bin_score", torch.nn.Parameter(torch.tensor(1.0))
        )
        self.pooling = nn.ModuleList(
            [PoolingLayerT(hidden) for _ in range(n_layers)]
        )

    def forward(self, d0, d1, nk0, nk1):
        x0 = self.input_proj(d0)
        x1 = self.input_proj(d1)
        e0, e1 = self.poseenc(nk0), self.poseenc(nk1)
        for i in range(self.n_layers):
            x0 = self.self_attn[i](x0, e0)
            x1 = self.self_attn[i](x1, e1)
            x0, x1 = self.cross_attn[i](x0, x1)
        d = x0.shape[-1]
        md0 = self.out_proj[self.n_layers - 1](x0) / d**0.25
        md1 = self.out_proj[self.n_layers - 1](x1) / d**0.25
        dist = torch.einsum("bmd,bnd->bmn", md0, md1)
        return torch_sink(dist, self.bin_score, self.sinkhorn_iters)


def _mlp1d(channels, norm_fn="in", ac_fn="relu"):
    """Reference MLP helper mirror (nets/layers.py:15-35)."""
    n = len(channels)
    layers = []
    for i in range(1, n):
        layers.append(nn.Conv1d(channels[i - 1], channels[i], 1, bias=True))
        if i < n - 1:
            if norm_fn == "in":
                layers.append(nn.InstanceNorm1d(channels[i], eps=1e-3))
            if ac_fn == "relu":
                layers.append(nn.ReLU())
    return nn.Sequential(*layers)


class MHA1d(nn.Module):
    """Mirror of nets/layers.py:38-77 (strided-channel head split)."""

    def __init__(self, num_heads, d_model):
        super().__init__()
        self.dim = d_model // num_heads
        self.num_heads = num_heads
        self.merge = nn.Conv1d(d_model, d_model, 1)
        import copy

        self.proj = nn.ModuleList(
            [copy.deepcopy(self.merge) for _ in range(3)]
        )

    def forward(self, query, key, value):
        b = query.size(0)
        q, k, v = [
            l(x).view(b, self.dim, self.num_heads, -1)
            for l, x in zip(self.proj, (query, key, value))
        ]
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / self.dim**0.5
        prob = F.softmax(scores, dim=-1)
        x = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        return self.merge(x.contiguous().view(b, self.dim * self.num_heads, -1))


class AttnProp1d(nn.Module):
    """Mirror of nets/layers.py:80-92."""

    def __init__(self, feature_dim, num_heads):
        super().__init__()
        self.attn = MHA1d(num_heads, feature_dim)
        self.mlp = _mlp1d([feature_dim * 2, feature_dim * 2, feature_dim])

    def forward(self, x, source):
        msg = self.attn(x, source, source)
        return self.mlp(torch.cat([x, msg], dim=1))


class TorchSegNet(nn.Module):
    """State-dict mirror of reference nets/segnet.py:32-120 (GNN variant)."""

    def __init__(self, desc_dim=256, n_class=17, n_layers=3,
                 keypoint_encoder=(32, 64, 128, 256), out_dim=1024):
        super().__init__()

        class GNN(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [AttnProp1d(desc_dim, 4) for _ in range(n_layers)]
                )

        self.gnn = GNN()

        class KEnc(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = _mlp1d([2] + list(keypoint_encoder) + [desc_dim])

        self.kenc = KEnc()
        self.seg = _mlp1d([desc_dim, out_dim, n_class])

    def forward(self, desc_bnd, norm_kpts):
        desc = desc_bnd.transpose(1, 2)  # [B, D, N]
        enc = self.kenc.encoder(norm_kpts.transpose(1, 2))
        x = desc + enc
        for layer in self.gnn.layers:
            x = x + layer(x, x)
        return self.seg(x).transpose(1, 2)  # [B, N, C]


class TorchGM(nn.Module):
    """Mirror of the *intended* GM architecture (nets/gm.py:93-263 with the
    hidden_dim constructor bug fixed): desc + kpt-MLP encoding, alternating
    self/cross AttentionalPropagation (one shared layer per step applied to
    both sides), last final_proj, Sinkhorn."""

    def __init__(self, desc_dim=128, n_layers=2, sinkhorn_iters=20,
                 keypoint_encoder=(32, 64, 128, 256)):
        super().__init__()
        self.n_layers = n_layers
        self.sinkhorn_iters = sinkhorn_iters

        class KEnc(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = _mlp1d(
                    [3] + list(keypoint_encoder) + [desc_dim]
                )

        self.kenc = KEnc()

        class GNN(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [AttnProp1d(desc_dim, 4) for _ in range(2 * n_layers)]
                )

        self.gnn = GNN()
        self.final_proj = nn.ModuleList(
            [nn.Conv1d(desc_dim, desc_dim, 1, bias=True)
             for _ in range(n_layers)]
        )
        self.register_parameter(
            "bin_score", torch.nn.Parameter(torch.tensor(1.0))
        )

    def forward(self, d0, d1, nk0, nk1, s0, s1):
        x0 = d0.transpose(1, 2) + self.kenc.encoder(
            torch.cat([nk0.transpose(1, 2), s0.unsqueeze(1)], dim=1)
        )
        x1 = d1.transpose(1, 2) + self.kenc.encoder(
            torch.cat([nk1.transpose(1, 2), s1.unsqueeze(1)], dim=1)
        )
        names = ["self", "cross"] * self.n_layers
        for layer, name in zip(self.gnn.layers, names):
            if name == "cross":
                src0, src1 = x1, x0
            else:
                src0, src1 = x0, x1
            delta0 = layer(x0, src0)
            delta1 = layer(x1, src1)
            x0, x1 = x0 + delta0, x1 + delta1
        md0 = self.final_proj[self.n_layers - 1](x0)
        md1 = self.final_proj[self.n_layers - 1](x1)
        d = md0.shape[1]
        dist = torch.einsum("bdn,bdm->bnm", md0, md1) / d**0.5
        return torch_sink(dist, self.bin_score, self.sinkhorn_iters)
