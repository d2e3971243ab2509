"""Torch twin of :class:`cvcs_tpu.models.swin.SwinUNet`.

SwinUnet is a framework-added model (the reference only *advertises*
TSwin/BSwin, `configs/train/README.txt:40-48`, SURVEY quirk 10 — they
were never implemented), so there is no published torch counterpart.
This twin DEFINES the canonical torch state-dict naming for SwinUNet
checkpoints so the framework's "weights flow both ways" contract
(PARITY.md §2.5) holds for the whole zoo:

* encoder follows the official ``microsoft/Swin-Transformer`` vocabulary
  where the architectures coincide — ``patch_embed.proj``/``.norm``,
  ``layers.{s}.blocks.{d}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,
  mlp.fc2}`` — with our strided-conv patch merging as
  ``layers.{s}.downsample.{proj,norm}`` (official Swin merges with
  concat+linear and adds relative-position biases; those weights have no
  slot here, so official pretrained encoders are NOT loadable — this
  naming is for familiarity, not hub compatibility);
* decoder/head are ours: ``decoder.{i}.{up,conv1,bn1,conv2,bn2}`` and
  ``head.{up1,up2,out}``.

Forward parity notes (pinned by ``tests/test_swin.py``): LayerNorm eps
1e-6 (flax default; torch's default is 1e-5), exact GELU, f32 softmax
with the additive ``-1e9`` mask, identical pad/shift/window rules
(reuses the framework's own static mask builder — its math is separately
pinned against the official Swin reference in
``test_shift_mask_matches_official_reference``). Spatial dims must keep
every stage even (H, W multiples of 32) so flax SAME padding equals
torch padding=0 on the strided convs.
"""

from __future__ import annotations

import numpy as np
import torch
from torch import nn

from cvcs_tpu.models.swin import _attn_mask


def _window_partition_t(x: torch.Tensor, win: int) -> torch.Tensor:
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)


def _window_merge_t(x: torch.Tensor, win: int, h: int, w: int) -> torch.Tensor:
    b = x.shape[0] // ((h // win) * (w // win))
    c = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


class _Attn(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        nb, t, c = x.shape
        hd = c // self.heads
        q, k, v = self.qkv(x).chunk(3, dim=-1)

        def heads(a):
            return a.reshape(nb, t, self.heads, hd).transpose(1, 2)

        q, k, v = heads(q), heads(k), heads(v)
        attn = (q @ k.transpose(-2, -1)) / float(np.sqrt(hd))
        attn = attn.float()
        if mask is not None:
            n_win = mask.shape[0]
            attn = attn.reshape(nb // n_win, n_win, self.heads, t, t)
            attn = torch.where(mask[None, :, None], attn,
                               torch.tensor(-1e9))
            attn = attn.reshape(nb, self.heads, t, t)
        attn = attn.softmax(dim=-1).to(v.dtype)
        out = (attn @ v).transpose(1, 2).reshape(nb, t, c)
        return self.proj(out)


class _Mlp(nn.Module):
    def __init__(self, dim: int, ratio: int = 4):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * ratio)
        self.fc2 = nn.Linear(dim * ratio, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, dim: int, heads: int, window: int, shifted: bool):
        super().__init__()
        self.window = window
        self.shifted = shifted
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim)

    def forward(self, x):           # x: (B, H, W, C)
        b, h0, w0, c = x.shape
        win = min(self.window, h0, w0)
        ph, pw = -h0 % win, -w0 % win
        x_pad = nn.functional.pad(x, (0, 0, 0, pw, 0, ph)) if (ph or pw) \
            else x
        h, w = x_pad.shape[1], x_pad.shape[2]
        shift = (win // 2 if (self.shifted and win > 1
                              and min(h0, w0) > win) else 0)

        y = self.norm1(x_pad)
        if shift:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        np_mask = _attn_mask(h, w, h0, w0, win, shift)
        mask = (torch.from_numpy(np.ascontiguousarray(np_mask))
                if np_mask is not None else None)
        tokens = _window_partition_t(y, win)
        tokens = self.attn(tokens, mask)
        y = _window_merge_t(tokens, win, h, w)
        if shift:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x_pad = x_pad + y
        x_pad = x_pad + self.mlp(self.norm2(x_pad))
        return x_pad[:, :h0, :w0]


class _Downsample(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.proj = nn.Conv2d(cin, cout, 2, stride=2, bias=False)
        self.norm = nn.LayerNorm(cout, eps=1e-6)

    def forward(self, x):           # NHWC
        x = self.proj(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        return self.norm(x)


class _Stage(nn.Module):
    def __init__(self, cin: int, cout: int, depth: int, heads: int,
                 window: int, downsample: bool):
        super().__init__()
        self.downsample = _Downsample(cin, cout) if downsample else None
        self.blocks = nn.ModuleList(
            [_Block(cout, heads, window, shifted=bool(i % 2))
             for i in range(depth)])

    def forward(self, x):
        if self.downsample is not None:
            x = self.downsample(x)
        for blk in self.blocks:
            x = blk(x)
        return x


class _Decode(nn.Module):
    """ConvTranspose up + concat skip + 2 x [conv3x3 -> ReLU -> BN]."""

    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.up = nn.ConvTranspose2d(cin, cout, 2, stride=2)
        self.conv1 = nn.Conv2d(2 * cout, cout, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, y, skip):     # NCHW
        y = self.up(y)
        y = torch.cat([skip, y], dim=1)
        y = self.bn1(torch.relu(self.conv1(y)))
        return self.bn2(torch.relu(self.conv2(y)))


class _Head(nn.Module):
    def __init__(self, cin: int, num_classes: int):
        super().__init__()
        self.up1 = nn.ConvTranspose2d(cin, cin // 2, 2, stride=2)
        self.up2 = nn.ConvTranspose2d(cin // 2, cin // 2, 2, stride=2)
        self.out = nn.Conv2d(cin // 2, num_classes, 3, padding=1)

    def forward(self, y):
        y = torch.relu(self.up1(y))
        y = torch.relu(self.up2(y))
        return self.out(y)


class TorchSwinUNet(nn.Module):
    """Torch twin of SwinUNet; same defaults (Swin-T encoder)."""

    def __init__(self, num_classes: int, dims=(96, 192, 384, 768),
                 depths=(2, 2, 6, 2), heads=(3, 6, 12, 24),
                 window: int = 8, in_channels: int = 3):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(in_channels, dims[0], 4, stride=4)
        self.patch_embed.norm = nn.LayerNorm(dims[0], eps=1e-6)
        self.layers = nn.ModuleList(
            [_Stage(dims[max(s - 1, 0)], dims[s], depths[s], heads[s],
                    window, downsample=(s > 0)) for s in range(4)])
        self.decoder = nn.ModuleList(
            [_Decode(dims[s + 1], dims[s]) for s in (2, 1, 0)])
        self.head = _Head(dims[0], num_classes)

    def forward(self, x):           # x: (B, C, H, W) float
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        skips = []
        for stage in self.layers:
            x = stage(x)
            skips.append(x)
        y = skips[-1].permute(0, 3, 1, 2)
        for dec, s in zip(self.decoder, (2, 1, 0)):
            y = dec(y, skips[s].permute(0, 3, 1, 2))
        return self.head(y)
