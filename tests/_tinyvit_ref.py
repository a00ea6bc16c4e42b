"""Exact-naming torch stand-in for the TinyViT-5M SAM image encoder.

No TinyViT source or weights ship in this image (the reference consumes it
through the sam-hq `vit_tiny` registry entry), so—per the repo's converter
test policy—this is an independent torch implementation of the same
published architecture using the OFFICIAL module naming
(`layers.{i}.blocks.{j}.conv1.c.weight`, `attn.attention_biases`,
`downsample.conv2`, `neck.0` …), giving `convert_tinyvit` a real state
dict to consume and a numeric reference for the flax port.
"""
from __future__ import annotations

import itertools

import torch
from torch import nn


class Conv2d_BN(nn.Sequential):
    def __init__(self, a, b, ks=1, stride=1, pad=0, groups=1):
        super().__init__()
        self.add_module("c", nn.Conv2d(a, b, ks, stride, pad, groups=groups, bias=False))
        bn = nn.BatchNorm2d(b)
        self.add_module("bn", bn)


class PatchEmbed(nn.Module):
    def __init__(self, embed_dim):
        super().__init__()
        self.seq = nn.Sequential(
            Conv2d_BN(3, embed_dim // 2, 3, 2, 1),
            nn.GELU(),
            Conv2d_BN(embed_dim // 2, embed_dim, 3, 2, 1),
        )

    def forward(self, x):
        return self.seq(x)


class MBConv(nn.Module):
    def __init__(self, dim, expand=4.0):
        super().__init__()
        hidden = int(dim * expand)
        self.conv1 = Conv2d_BN(dim, hidden, 1)
        self.act1 = nn.GELU()
        self.conv2 = Conv2d_BN(hidden, hidden, 3, 1, 1, groups=hidden)
        self.act2 = nn.GELU()
        self.conv3 = Conv2d_BN(hidden, dim, 1)
        self.act3 = nn.GELU()

    def forward(self, x):
        h = self.act1(self.conv1(x))
        h = self.act2(self.conv2(h))
        h = self.conv3(h)
        return self.act3(x + h)


class PatchMerging(nn.Module):
    def __init__(self, dim, out_dim, stride=2):
        super().__init__()
        self.conv1 = Conv2d_BN(dim, out_dim, 1)
        self.act = nn.GELU()
        self.conv2 = Conv2d_BN(out_dim, out_dim, 3, stride, 1, groups=out_dim)
        self.conv3 = Conv2d_BN(out_dim, out_dim, 1)

    def forward(self, x):
        return self.conv3(self.act(self.conv2(self.act(self.conv1(x)))))


class Attention(nn.Module):
    def __init__(self, dim, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.key_dim = dim // num_heads
        self.scale = self.key_dim ** -0.5
        self.dim = dim
        self.norm = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        points = list(itertools.product(range(ws), range(ws)))
        offsets: dict = {}
        idxs = []
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                if off not in offsets:
                    offsets[off] = len(offsets)
                idxs.append(offsets[off])
        self.attention_biases = nn.Parameter(torch.zeros(num_heads, len(offsets)))
        self.register_buffer(
            "attention_bias_idxs",
            torch.LongTensor(idxs).view(len(points), len(points)),
            persistent=False,
        )

    def forward(self, x):                       # (B*, N, C)
        b, n, c = x.shape
        x = self.norm(x)
        qkv = self.qkv(x).view(b, n, self.num_heads, 3 * self.key_dim)
        q, k, v = qkv.split([self.key_dim, self.key_dim, self.key_dim], dim=3)
        q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(self.norm(x))))


class TinyViTBlock(nn.Module):
    def __init__(self, dim, num_heads, ws, mlp_ratio=4.0):
        super().__init__()
        self.ws = ws
        self.attn = Attention(dim, num_heads, ws)
        self.local_conv = Conv2d_BN(dim, dim, 3, 1, 1, groups=dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):                       # (B, C, H, W)
        b, c, hh, ww = x.shape
        res = x
        t = x.permute(0, 2, 3, 1)               # (B, H, W, C)
        if hh == self.ws and ww == self.ws:
            a = self.attn(t.reshape(b, hh * ww, c)).view(b, hh, ww, c)
        else:
            pad_b = (self.ws - hh % self.ws) % self.ws
            pad_r = (self.ws - ww % self.ws) % self.ws
            t = nn.functional.pad(t, (0, 0, 0, pad_r, 0, pad_b))
            ph, pw = hh + pad_b, ww + pad_r
            nh, nw = ph // self.ws, pw // self.ws
            wnd = (
                t.view(b, nh, self.ws, nw, self.ws, c)
                .transpose(2, 3)
                .reshape(b * nh * nw, self.ws * self.ws, c)
            )
            a = self.attn(wnd)
            a = (
                a.view(b, nh, nw, self.ws, self.ws, c)
                .transpose(2, 3)
                .reshape(b, ph, pw, c)[:, :hh, :ww]
            )
        x = res + a.permute(0, 3, 1, 2)
        x = self.local_conv(x)
        t = x.flatten(2).transpose(1, 2)        # (B, L, C)
        t = t + self.mlp(t)
        return t.transpose(1, 2).view(b, c, hh, ww)


class LayerNorm2d(nn.Module):
    def __init__(self, ch, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(ch))
        self.bias = nn.Parameter(torch.zeros(ch))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class ConvLayer(nn.Module):
    def __init__(self, dim, depth, out_dim=None):
        super().__init__()
        self.blocks = nn.ModuleList([MBConv(dim) for _ in range(depth)])
        self.downsample = PatchMerging(dim, out_dim) if out_dim else None

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        return self.downsample(x) if self.downsample else x


class BasicLayer(nn.Module):
    def __init__(self, dim, depth, num_heads, ws, out_dim=None, down_stride=2):
        super().__init__()
        self.blocks = nn.ModuleList(
            [TinyViTBlock(dim, num_heads, ws) for _ in range(depth)]
        )
        self.downsample = (
            PatchMerging(dim, out_dim, stride=down_stride) if out_dim else None
        )

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        return self.downsample(x) if self.downsample else x


class TinyViT(nn.Module):
    """MobileSAM TinyViT-5M with the SAM neck; forward returns the
    (B, 256, S/16, S/16) embedding."""

    def __init__(
        self,
        embed_dims=(64, 128, 160, 320),
        depths=(2, 2, 6, 2),
        num_heads=(2, 4, 5, 10),
        window_sizes=(7, 7, 14, 7),
    ):
        super().__init__()
        self.patch_embed = PatchEmbed(embed_dims[0])
        self.layers = nn.ModuleList(
            [
                ConvLayer(embed_dims[0], depths[0], out_dim=embed_dims[1]),
                BasicLayer(embed_dims[1], depths[1], num_heads[1], window_sizes[1],
                           out_dim=embed_dims[2]),
                BasicLayer(embed_dims[2], depths[2], num_heads[2], window_sizes[2],
                           out_dim=embed_dims[3], down_stride=1),
                BasicLayer(embed_dims[3], depths[3], num_heads[3], window_sizes[3]),
            ]
        )
        self.neck = nn.Sequential(
            nn.Conv2d(embed_dims[3], 256, 1, bias=False),
            LayerNorm2d(256),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            LayerNorm2d(256),
        )

    def forward(self, x):
        x = self.patch_embed(x)
        for layer in self.layers:
            x = layer(x)
        return self.neck(x)
