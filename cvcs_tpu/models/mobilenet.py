"""MobileNetV3-Large backbone (dilated, torchvision-compatible), NHWC / bf16.

The reference wraps torchvision's ``deeplabv3_mobilenet_v3_large``
(`nets.py:277-311`). This module re-implements the MobileNetV3-Large
feature trunk with torchvision's exact structural conventions —
``_mobilenet_v3_conf("mobilenet_v3_large", dilated=True)``: dilation 2 in
the last stage (a block config with dilation > 1 runs at stride 1, giving
output stride 16), hardswish/ReLU activations, squeeze-excitation with
``_make_divisible(expanded // 4, 8)`` squeeze channels and hardsigmoid gate —
so pretrained torchvision weights import 1:1.

Feature dict mirrors torchvision's DeepLab tap points: ``out`` = the 960-ch
last conv (C5, stride 16), ``aux`` = the 40-ch C2 stage (stride 8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cvcs_tpu.models.blocks import TorchBatchNorm


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    kernel: int
    expanded: int
    out: int
    use_se: bool
    use_hs: bool   # hardswish (else ReLU)
    stride: int
    dilation: int = 1


# torchvision _mobilenet_v3_conf("mobilenet_v3_large", dilated=True)
LARGE_DILATED: Sequence[BlockCfg] = (
    BlockCfg(3, 16, 16, False, False, 1),
    BlockCfg(3, 64, 24, False, False, 2),
    BlockCfg(3, 72, 24, False, False, 1),
    BlockCfg(5, 72, 40, True, False, 2),
    BlockCfg(5, 120, 40, True, False, 1),
    BlockCfg(5, 120, 40, True, False, 1),
    BlockCfg(3, 240, 80, False, True, 2),
    BlockCfg(3, 200, 80, False, True, 1),
    BlockCfg(3, 184, 80, False, True, 1),
    BlockCfg(3, 184, 80, False, True, 1),
    BlockCfg(3, 480, 112, True, True, 1),
    BlockCfg(3, 672, 112, True, True, 1),
    BlockCfg(5, 672, 160, True, True, 2, 2),
    BlockCfg(5, 960, 160, True, True, 1, 2),
    BlockCfg(5, 960, 160, True, True, 1, 2),
)
# torchvision taps aux at features[4] = after block cfg index 3 (C2: 40 ch,
# stride 8): stage_indices[-4] in deeplabv3_mobilenet_v3_large.
AUX_BLOCK_INDEX = 3


class _BN(nn.Module):
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torchvision MobileNetV3 uses eps 1e-3, momentum 0.01.
        return TorchBatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, param_dtype=self.param_dtype)(x)


class SqueezeExcite(nn.Module):
    squeeze: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), **kw)(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), **kw)(s)
        return x * nn.hard_sigmoid(s)


class InvertedResidual(nn.Module):
    cfg: BlockCfg
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        act = nn.hard_swish if cfg.use_hs else nn.relu
        # dilation > 1 forces stride 1 (torchvision InvertedResidual).
        stride = 1 if cfg.dilation > 1 else cfg.stride
        inp = x.shape[-1]
        y = x
        if cfg.expanded != inp:
            y = nn.Conv(cfg.expanded, (1, 1), use_bias=False, **kw)(y)
            y = _BN(**kw)(y, train)
            y = act(y)
        pad = (cfg.kernel // 2) * cfg.dilation
        y = nn.Conv(cfg.expanded, (cfg.kernel, cfg.kernel), strides=stride,
                    padding=pad, kernel_dilation=cfg.dilation,
                    feature_group_count=cfg.expanded, use_bias=False,
                    **kw)(y)
        y = _BN(**kw)(y, train)
        y = act(y)
        if cfg.use_se:
            y = SqueezeExcite(_make_divisible(cfg.expanded // 4), **kw)(y)
        y = nn.Conv(cfg.out, (1, 1), use_bias=False, **kw)(y)
        y = _BN(**kw)(y, train)
        # torchvision gates the residual on the CONFIG's stride
        # (use_res_connect = cnf.stride == 1), not the dilation-adjusted
        # one — a stride-2 dilated block must NOT gain a skip here
        if cfg.stride == 1 and inp == cfg.out:
            y = y + x
        return y


class MobileNetV3Backbone(nn.Module):
    """MobileNetV3-Large dilated trunk; {"out": 960ch @ /16, "aux": 40ch @ /8}."""

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = jnp.asarray(x, self.dtype)
        x = nn.Conv(16, (3, 3), strides=2, padding=1, use_bias=False,
                    **kw)(x)
        x = _BN(**kw)(x, train)
        x = nn.hard_swish(x)
        feats = {}
        for i, cfg in enumerate(LARGE_DILATED):
            x = InvertedResidual(cfg, **kw)(x, train)
            if i == AUX_BLOCK_INDEX:
                feats["aux"] = x
        last = 6 * LARGE_DILATED[-1].out  # 960
        x = nn.Conv(last, (1, 1), use_bias=False, **kw)(x)
        x = _BN(**kw)(x, train)
        x = nn.hard_swish(x)
        feats["out"] = x
        return feats
