"""ResNet backbones (v1, torchvision-compatible layout), NHWC / bf16.

The reference consumes torchvision's ``deeplabv3_resnet101`` /
``deeplabv3_resnet50`` (`nets.py:234-275`) and an experimental truncated
ResNet-18 feature extractor (`nets.py:216-232`). These are re-implemented
here as linen modules with torchvision's exact structural conventions
(7x7/2 stem -> 3x3/2 maxpool -> 4 stages; bottleneck channel expansion 4;
DeepLab variant replaces stride with dilation in stages 3-4 for output
stride 8) so that torchvision pretrained weights can be imported 1:1 by
:mod:`cvcs_tpu.utils.torch_import`.

Returns a feature dict ``{"out", "aux"}`` like torchvision's
``IntermediateLayerGetter`` (out = stage4, aux = stage3).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from cvcs_tpu.models.blocks import TorchBatchNorm


class _BN(nn.Module):
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype)(x)


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 (stride/dilation) -> 1x1 expand(x4), projection
    shortcut on shape change. torchvision places the stride on the 3x3."""

    features: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, **kw)(x)
        y = _BN(**kw)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=self.dilation, kernel_dilation=self.dilation,
                    use_bias=False, **kw)(y)
        y = _BN(**kw)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, **kw)(y)
        y = _BN(**kw)(y, train)
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=self.strides, use_bias=False,
                               **kw)(x)
            residual = _BN(**kw)(residual, train)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """Two 3x3 convs (ResNet-18/34)."""

    features: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=self.dilation, kernel_dilation=self.dilation,
                    use_bias=False, **kw)(x)
        y = _BN(**kw)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=self.dilation,
                    kernel_dilation=self.dilation, use_bias=False, **kw)(y)
        y = _BN(**kw)(y, train)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, **kw)(x)
            residual = _BN(**kw)(residual, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """torchvision-layout ResNet feature extractor.

    ``replace_stride_with_dilation`` mirrors torchvision's DeepLab recipe
    ``[False, True, True]`` (stages 3-4 dilated, output stride 8).
    Emits {"out": stage4, "aux": stage3}.
    """

    stage_sizes: Sequence[int]
    block: str = "bottleneck"  # "bottleneck" | "basic"
    replace_stride_with_dilation: Sequence[bool] = (False, True, True)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = jnp.asarray(x, self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    **kw)(x)
        x = _BN(**kw)(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        feats = {}
        dilation = 1
        for stage, n_blocks in enumerate(self.stage_sizes):
            width = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            # torchvision's _make_layer: the stage's first block keeps the
            # *previous* dilation; later blocks use the increased one.
            prev_dilation = dilation
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            for b in range(n_blocks):
                x = block_cls(
                    width,
                    strides=stride if b == 0 else 1,
                    dilation=prev_dilation if b == 0 else dilation,
                    **kw,
                )(x, train)
            if stage == len(self.stage_sizes) - 1:
                # TP hook: stage-4's 2048-ch activations shard over channels
                # under parallel.tp.tensor_parallel.
                from cvcs_tpu.parallel import tp as _tp
                x = _tp.constrain(x)
            feats[f"stage{stage + 1}"] = x
            if stage == 2:
                feats["aux"] = x
        feats["out"] = x
        return feats


def resnet50_backbone(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), **kw)


def resnet101_backbone(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), **kw)


def resnet18_features(**kw) -> ResNet:
    """Full-stride ResNet-18 trunk (the reference's experimental
    ``resnet18_backbone`` truncates torchvision resnet18 before the pool,
    `nets.py:216-232`); output stride 32, {"out": stage4, "aux": stage3}."""
    return ResNet(stage_sizes=(2, 2, 2, 2), block="basic",
                  replace_stride_with_dilation=(False, False, False), **kw)
