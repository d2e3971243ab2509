"""Torch twin of DeepLabV3-ResNet (torchvision naming) for parity tests.

torchvision is not installed in this image, so this module re-expresses
torchvision's ``deeplabv3_resnet50/101`` structure (SURVEY §2.2; reference
wraps it at `nets.py:234-275`) in plain torch with the *same state-dict
naming* (``backbone.conv1``, ``backbone.layer{1-4}.{b}.conv{1-3}/bn{1-3}/
downsample.{0,1}``, ``classifier.0.convs...``, ``classifier.{1,2,4}``) so
``cvcs_tpu.utils.torch_import.import_deeplab`` consumes its state dict
unchanged and outputs can be compared numerically against our flax model.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

STAGES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    def __init__(self, cin, width, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(width * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class Backbone(nn.Module):
    def __init__(self, arch="resnet50"):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin, dilation = 64, 1
        for stage, n_blocks in enumerate(STAGES[arch]):
            width = 64 * 2 ** stage
            stride = 1 if stage == 0 else 2
            prev_dilation = dilation
            if stage >= 2:   # replace_stride_with_dilation = [F, T, T]
                dilation *= stride
                stride = 1
            blocks = []
            for b in range(n_blocks):
                blocks.append(Bottleneck(
                    cin if b == 0 else width * 4, width,
                    stride=stride if b == 0 else 1,
                    dilation=prev_dilation if b == 0 else dilation,
                    downsample=(b == 0)))
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
            cin = width * 4

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x


class ASPPConv(nn.Sequential):
    def __init__(self, cin, cout, rate):
        super().__init__(
            nn.Conv2d(cin, cout, 3, padding=rate, dilation=rate, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU())


class ASPPPooling(nn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(nn.AdaptiveAvgPool2d(1),
                         nn.Conv2d(cin, cout, 1, bias=False),
                         nn.BatchNorm2d(cout), nn.ReLU())

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear",
                             align_corners=False)


class ASPP(nn.Module):
    def __init__(self, cin, cout=256, rates=(12, 24, 36)):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                              nn.BatchNorm2d(cout), nn.ReLU())]
        mods += [ASPPConv(cin, cout, r) for r in rates]
        mods.append(ASPPPooling(cin, cout))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(5 * cout, cout, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        return self.project(torch.cat([m(x) for m in self.convs], dim=1))


class TorchDeepLabV3(nn.Module):
    """torchvision-shaped deeplabv3_resnet{50,101}."""

    def __init__(self, num_classes, arch="resnet50"):
        super().__init__()
        self.backbone = Backbone(arch)
        self.classifier = nn.Sequential(
            ASPP(2048),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(),
            nn.Conv2d(256, num_classes, 1))

    def forward(self, x):
        size = x.shape[-2:]
        y = self.classifier(self.backbone(x))
        return F.interpolate(y, size=size, mode="bilinear",
                             align_corners=False)
