"""GoogLeNet (Inception v1) feature trunk — the reference's experimental
DeepLab backbone swap (`nets.py:203-215`): torchvision ``googlenet`` children
truncated after inception4e (832 ch, stride 16), a 1x1 conv to 960 ch as
"out", and a 1x1 conv (192 -> 40) tap of the post-maxpool2 stem feature as
"aux" — matching the channel contract of the MobileNetV3 DeepLab head so the
head is drop-in swappable.

torchvision structural conventions kept for 1:1 weight import:
``BasicConv2d`` = conv(bias=False) + BN(eps 1e-3) + ReLU; inception branch3
uses a 3x3 (not the paper's 5x5); maxpools are 3x3 stride 2 ceil_mode.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cvcs_tpu.models.blocks import TorchBatchNorm


class BasicConv2d(nn.Module):
    features: int
    kernel: int = 1
    strides: int = 1
    padding: int = 0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.strides, padding=self.padding,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        return nn.relu(x)


def _ceil_maxpool(x, window: int = 3, stride: int = 2):
    """torch MaxPool2d(3, 2, ceil_mode=True): pad bottom/right so every
    window fits, padding with -inf."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-max(h - window, 0) // stride) + 1
    out_w = -(-max(w - window, 0) // stride) + 1
    pad_h = max((out_h - 1) * stride + window - h, 0)
    pad_w = max((out_w - 1) * stride + window - w, 0)
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((0, pad_h), (0, pad_w)))


class Inception(nn.Module):
    """torchvision Inception block: 1x1 | 1x1->3x3 | 1x1->3x3 | pool->1x1."""

    ch1: int
    ch3red: int
    ch3: int
    ch5red: int
    ch5: int
    pool_proj: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b1 = BasicConv2d(self.ch1, 1, **kw)(x, train)
        b2 = BasicConv2d(self.ch3red, 1, **kw)(x, train)
        b2 = BasicConv2d(self.ch3, 3, padding=1, **kw)(b2, train)
        b3 = BasicConv2d(self.ch5red, 1, **kw)(x, train)
        b3 = BasicConv2d(self.ch5, 3, padding=1, **kw)(b3, train)
        b4 = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        b4 = BasicConv2d(self.pool_proj, 1, **kw)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


# (ch1, ch3red, ch3, ch5red, ch5, pool_proj) per torchvision googlenet
_INCEPTION_3 = [(64, 96, 128, 16, 32, 32), (128, 128, 192, 32, 96, 64)]
_INCEPTION_4 = [
    (192, 96, 208, 16, 48, 64),
    (160, 112, 224, 24, 64, 64),
    (128, 128, 256, 24, 64, 64),
    (112, 144, 288, 32, 64, 64),
    (256, 160, 320, 32, 128, 128),
]


class GoogLeNetBackbone(nn.Module):
    """Truncated GoogLeNet trunk with the reference's adapter convs;
    {"out": 960 ch @ /16, "aux": 40 ch @ /8}."""

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = jnp.asarray(x, self.dtype)
        x = BasicConv2d(64, 7, strides=2, padding=3, **kw)(x, train)
        x = _ceil_maxpool(x)
        x = BasicConv2d(64, 1, **kw)(x, train)
        x = BasicConv2d(192, 3, padding=1, **kw)(x, train)
        x = _ceil_maxpool(x)
        aux_feat = x  # reference hooks backbone[4] = maxpool2 (192 ch, /8)
        for cfg in _INCEPTION_3:
            x = Inception(*cfg, **kw)(x, train)
        x = _ceil_maxpool(x)
        for cfg in _INCEPTION_4:
            x = Inception(*cfg, **kw)(x, train)
        out = nn.Conv(960, (1, 1), **kw)(x)       # reference out_layer
        aux = nn.Conv(40, (1, 1), **kw)(aux_feat)  # reference aux_layer
        return {"out": out, "aux": aux}
