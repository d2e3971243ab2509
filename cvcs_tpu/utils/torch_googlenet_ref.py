"""Torch twin of the torchvision GoogLeNet trunk the reference's
``google_backbone`` keeps (`nets.py:203-215`: ``children()[:-6]`` after the
aux heads are stripped = conv1 .. inception4e), with torchvision's exact
module naming so :func:`cvcs_tpu.utils.torch_import.import_googlenet` can
be parity-tested without torchvision (absent in this image) or network
weights (zero egress).

Structure per torchvision ``googlenet``: BasicConv2d = Conv(bias=False) +
BN(eps 1e-3) + ReLU; Inception branch3 uses a 3x3 kernel (not the paper's
5x5); maxpools are 3x3 stride-2 ceil_mode.
"""

from __future__ import annotations

import torch
from torch import nn


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class Inception(nn.Module):
    def __init__(self, cin, ch1, ch3red, ch3, ch5red, ch5, pool_proj):
        super().__init__()
        self.branch1 = BasicConv2d(cin, ch1, kernel_size=1)
        self.branch2 = nn.Sequential(
            BasicConv2d(cin, ch3red, kernel_size=1),
            BasicConv2d(ch3red, ch3, kernel_size=3, padding=1))
        self.branch3 = nn.Sequential(
            BasicConv2d(cin, ch5red, kernel_size=1),
            BasicConv2d(ch5red, ch5, kernel_size=3, padding=1))
        self.branch4 = nn.Sequential(
            nn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
            BasicConv2d(cin, pool_proj, kernel_size=1))

    def forward(self, x):
        return torch.cat([self.branch1(x), self.branch2(x),
                          self.branch3(x), self.branch4(x)], 1)


class TorchGoogleTrunk(nn.Module):
    """conv1 .. inception4e with torchvision naming; forward returns
    (trunk_out 832ch @ /16, aux_tap 192ch @ /8 = maxpool2 output)."""

    def __init__(self):
        super().__init__()
        self.conv1 = BasicConv2d(3, 64, kernel_size=7, stride=2, padding=3)
        self.maxpool1 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.conv2 = BasicConv2d(64, 64, kernel_size=1)
        self.conv3 = BasicConv2d(64, 192, kernel_size=3, padding=1)
        self.maxpool2 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.inception3a = Inception(192, 64, 96, 128, 16, 32, 32)
        self.inception3b = Inception(256, 128, 128, 192, 32, 96, 64)
        self.maxpool3 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.inception4a = Inception(480, 192, 96, 208, 16, 48, 64)
        self.inception4b = Inception(512, 160, 112, 224, 24, 64, 64)
        self.inception4c = Inception(512, 128, 128, 256, 24, 64, 64)
        self.inception4d = Inception(512, 112, 144, 288, 32, 64, 64)
        self.inception4e = Inception(528, 256, 160, 320, 32, 128, 128)

    def forward(self, x):
        x = self.maxpool1(self.conv1(x))
        x = self.maxpool2(self.conv3(self.conv2(x)))
        aux = x
        x = self.inception3b(self.inception3a(x))
        x = self.maxpool3(x)
        for blk in (self.inception4a, self.inception4b, self.inception4c,
                    self.inception4d, self.inception4e):
            x = blk(x)
        return x, aux
