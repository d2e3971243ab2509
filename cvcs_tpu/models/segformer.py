"""SegFormer (MiT encoder + all-MLP decode head), NHWC / bf16.

Parity surface: the reference's "SegformerMod" (`nets.py:313-356`) — HF
``nvidia/segformer-b3-finetuned-ade-512-512`` with (a) the decode-head
classifier swapped to ``num_classes``, (b) an extra learned 4x upsampling
stack ``ConvT(8, s2, p3) + ReLU -> ConvT(4, s2, p1) + ReLU -> Conv3x3`` on
the 1/4-resolution logits, and (c) ImageNet normalization applied *inside*
forward. Reference quirk kept for parity: the normalization runs on raw
0-255 floats without a /255 rescale (`nets.py:339-342` uses
``v2.ToDtype(torch.float32)`` without ``scale=True``); disable with
``paper_normalization=False`` to get standard ImageNet preprocessing.

Architecture follows the SegFormer paper (Xie et al., NeurIPS 2021) with
HF's structural conventions so pretrained weights import 1:1: overlapped
patch embeddings (7x7/4 then 3x3/2), efficient self-attention with conv
spatial reduction of K/V (sr ratios 8/4/2/1), Mix-FFN with a 3x3 depthwise
conv, LayerNorm everywhere, per-stage final LayerNorm, and an all-MLP head
that projects each stage to ``decoder_dim``, bilinearly upsamples to 1/4
scale, concatenates (stage order reversed, as HF does), and fuses with a
1x1 conv + BN + ReLU.

TPU notes: attention runs as batched (B*heads) matmuls on the MXU at bf16;
the sequence dims (H*W up to 3136 at p=224 stage 1) are MXU-friendly. The
spatial reduction convs keep the K/V sequence <= 49 tokens at stage 1 —
XLA handles the layout. Variable patch sizes recompile once per shape
(static shapes are mandatory under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvcs_tpu.models.blocks import TorchBatchNorm

from cvcs_tpu.ops.resize import resize_bilinear

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class MiTConfig:
    depths: Sequence[int]
    hidden_sizes: Sequence[int]
    num_heads: Sequence[int]
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratio: int = 4
    decoder_dim: int = 768


MIT_B0 = MiTConfig((2, 2, 2, 2), (32, 64, 160, 256), (1, 2, 5, 8),
                   decoder_dim=256)
MIT_B1 = MiTConfig((2, 2, 2, 2), (64, 128, 320, 512), (1, 2, 5, 8))
MIT_B3 = MiTConfig((3, 4, 18, 3), (64, 128, 320, 512), (1, 2, 5, 8))


class EfficientAttention(nn.Module):
    """Self-attention with conv spatial reduction of K/V (HF layout)."""

    dim: int
    heads: int
    sr_ratio: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        # x: (B, N, C); hw = (H, W) of the token grid
        b, n, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(self.dim, **kw)(x)
        if self.sr_ratio > 1:
            h, w = hw
            kv_in = x.reshape(b, h, w, c)
            # HF's sr conv is Conv2d(k=sr, s=sr, padding=0): VALID. Flax's
            # default SAME only coincides when the grid divides by sr —
            # at non-divisible sizes SAME pads an extra K/V token row/col
            # and imported pretrained weights silently diverge from HF
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=self.sr_ratio, padding="VALID",
                            **kw)(kv_in)
            kv_in = kv_in.reshape(b, -1, self.dim)
            kv_in = nn.LayerNorm(dtype=self.dtype,
                                 param_dtype=self.param_dtype)(kv_in)
        else:
            kv_in = x
        k = nn.Dense(self.dim, **kw)(kv_in)
        v = nn.Dense(self.dim, **kw)(kv_in)

        hd = self.dim // self.heads
        q = q.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, self.dtype))
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, **kw)(out)


class MixFFN(nn.Module):
    """fc1 -> depthwise 3x3 conv -> GELU -> fc2 (SegFormer Mix-FFN)."""

    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        b, n, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h, w = hw
        y = nn.Dense(self.hidden, **kw)(x)
        y = y.reshape(b, h, w, self.hidden)
        # The barriers pin the token->NHWC layout change as its own
        # (bandwidth-cheap) kernel: without them XLA fuses the transpose
        # into the depthwise conv's loop emitter and the fusion runs 5.6x
        # slower than its cost estimate (measured on v5e: 4.8 -> 0.87 ms
        # per stage-2 block at 256^2 input; whole-model forward 3.4x).
        y = jax.lax.optimization_barrier(y)
        y = nn.Conv(self.hidden, (3, 3), padding=1,
                    feature_group_count=self.hidden, **kw)(y)
        y = jax.lax.optimization_barrier(y)
        y = y.reshape(b, n, self.hidden)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, **kw)(y)


class MiTBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        ln = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x + EfficientAttention(self.dim, self.heads, self.sr_ratio,
                                   **ln)(nn.LayerNorm(**ln)(x), hw)
        x = x + MixFFN(self.dim, self.dim * self.mlp_ratio,
                       **ln)(nn.LayerNorm(**ln)(x), hw)
        return x


class MiTEncoder(nn.Module):
    """4-stage Mix Transformer; returns per-stage NHWC feature maps."""

    config: MiTConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        feats = []
        for stage in range(4):
            patch, stride = (7, 4) if stage == 0 else (3, 2)
            x = nn.Conv(cfg.hidden_sizes[stage], (patch, patch),
                        strides=stride, padding=patch // 2, **kw)(x)
            b, h, w, c = x.shape
            tokens = x.reshape(b, h * w, c)
            tokens = nn.LayerNorm(**kw)(tokens)
            for _ in range(cfg.depths[stage]):
                tokens = MiTBlock(c, cfg.num_heads[stage],
                                  cfg.sr_ratios[stage], cfg.mlp_ratio,
                                  **kw)(tokens, (h, w))
            tokens = nn.LayerNorm(**kw)(tokens)
            x = tokens.reshape(b, h, w, c)
            if stage == 3:
                # TP hook: stage-4 channels shard over the mesh axis under
                # parallel.tp.tensor_parallel (512-ch for B1/B3).
                from cvcs_tpu.parallel import tp as _tp
                x = _tp.constrain(x)
            feats.append(x)
        return feats


class SegFormerHead(nn.Module):
    """All-MLP decode head -> (B, H/4, W/4, num_classes) logits."""

    num_classes: int
    decoder_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        size = (feats[0].shape[1], feats[0].shape[2])
        proj = []
        for f in feats:
            y = nn.Dense(self.decoder_dim, **kw)(f)
            if y.shape[1:3] != size:
                y = resize_bilinear(y, size)
            proj.append(y)
        # HF concatenates in reversed stage order.
        y = jnp.concatenate(proj[::-1], axis=-1)
        y = nn.Conv(self.decoder_dim, (1, 1), use_bias=False, **kw)(y)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, **kw)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Conv(self.num_classes, (1, 1), **kw)(y)


class SegFormer(nn.Module):
    """SegFormer with the reference's learned 4x upsampling tail.

    Protocol (`nets.py:316-319`): ``requires_context = False``,
    ``returns_logits = True``; forward returns full-resolution f32 logits.
    """

    num_classes: int
    config: MiTConfig = MIT_B3
    paper_normalization: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    requires_context = False
    returns_logits = True

    @nn.compact
    def __call__(self, x, context=None, train: bool = False):
        del context
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = jnp.asarray(x, jnp.float32)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        if not self.paper_normalization:
            x = x / 255.0
        # Reference quirk: Normalize on raw 0-255 floats (`nets.py:339-342`).
        x = (x[..., :3] - mean) / std
        x = x.astype(self.dtype)

        feats = MiTEncoder(self.config, **kw)(x)
        logits = SegFormerHead(self.num_classes, self.config.decoder_dim,
                               **kw)(feats, train)
        # Reference tail: ConvT(8,s2,p3)+ReLU, ConvT(4,s2,p1)+ReLU, Conv3x3
        # (`nets.py:333-337`). Explicit padding pairs reproduce torch's
        # ConvTranspose2d output geometry exactly (pad = k - 1 - p_torch).
        y = nn.ConvTranspose(self.num_classes, (8, 8), strides=(2, 2),
                             padding=((4, 4), (4, 4)), **kw)(logits)
        y = nn.relu(y)
        y = nn.ConvTranspose(self.num_classes, (4, 4), strides=(2, 2),
                             padding=((2, 2), (2, 2)), **kw)(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_classes, (3, 3), padding=1, **kw)(y)
        return y.astype(jnp.float32)
