"""Torch twin of the flagship UNetv2 (baseline measurement + import parity).

A from-scratch torch expression of the architecture described in SURVEY
§2.2 (reference `nets.py:117-199`, `blocks.py`): 5-level encoder
(64..1024, two conv3x3+BN+ReLU per level, maxpool between), ConvTranspose
(k=2, s=2) decoder with skip concats, decode blocks conv3x3+ReLU+BN twice,
1x1 classifier. Used by ``bench.py`` to measure the reference
implementation's CPU throughput on this machine (its `device: cpu` path,
`utils.py:277-278`) and by the torch->JAX weight-importer tests as a
shape-compatible donor. Torch is CPU-only in this image.
"""

from __future__ import annotations

import torch
import torch.nn as nn

WIDTHS = (64, 128, 256, 512, 1024)


def _enc_layer(cin: int, cout: int) -> nn.Sequential:
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU())


def _dec_block(cin: int, cout: int) -> nn.Sequential:
    layers = []
    for i in range(2):
        layers += [nn.Conv2d(cin if i == 0 else cout, cout, 3, padding=1),
                   nn.ReLU(), nn.BatchNorm2d(cout)]
    return nn.Sequential(*layers)


class TorchUrnetv2(nn.Module):
    """Reference-shaped UNetv2 (transpose-conv decoder)."""

    def __init__(self, num_classes: int, in_channels: int = 3):
        super().__init__()
        self.encoders = nn.ModuleList()
        prev = in_channels
        for w in WIDTHS:
            self.encoders.append(nn.Sequential(
                _enc_layer(prev, w), _enc_layer(w, w)))
            prev = w
        self.pool = nn.MaxPool2d(2, 2)
        self.ups = nn.ModuleList(
            [nn.ConvTranspose2d(w, w // 2, 2, stride=2)
             for w in WIDTHS[:0:-1]])           # 1024..128
        self.decs = nn.ModuleList(
            [_dec_block(w, w // 2) for w in WIDTHS[:0:-1]])
        self.head = nn.Conv2d(64, num_classes, 1)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        skips = []
        for i, enc in enumerate(self.encoders):
            if i:
                x = self.pool(x)
            x = enc(x)
            skips.append(x)
        y = skips[-1]
        for i, (up, dec, skip) in enumerate(
                zip(self.ups, self.decs, skips[-2::-1])):
            y = up(y)
            # the reference concatenates upsampled-first at the 3rd decode
            # level only (`nets.py:193`), skip-first elsewhere
            pair = [y, skip] if i == 2 else [skip, y]
            y = dec(torch.cat(pair, dim=1))
        return self.head(y)
