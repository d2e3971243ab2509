"""The UNet family ("Unet" / "Unetv2" in the reference's zoo).

Capability-parity with the reference's hand-written U-Nets
(`source/scripts/nets.py:34-199`): a classic 5-level encoder
(64 -> 128 -> 256 -> 512 -> 1024 channels, two conv-BN-ReLU per level, 2x2
maxpool between levels) and a skip-concat decoder. The two variants differ
only in how they upsample:

* ``UNet``   ("Unet",   `nets.py:34-115`) — 2x bilinear upsample + conv3x3
  halving channels.
* ``UNetV2`` ("Unetv2", `nets.py:117-199`) — ``ConvTranspose(k=2, s=2)``.
  This is the reference paper's primary model (all its inference configs
  use it).

TPU-first re-design: NHWC so every conv lands on the MXU, bf16 compute with
f32 params/BN stats, and a functional (linen) module so the whole network
jits into a single XLA program. The level-3 skip concat center-crops the
upsampled tensor to the skip's size for odd input sizes, exactly like the
reference (`nets.py:109,193`); for the supported patch sizes (224/256/512,
all divisible by 16) the crop is a no-op.

Model protocol (reference `nets.py:12-33`): ``requires_context = False``,
``returns_logits = True`` — forward returns (B, H, W, num_classes) logits.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cvcs_tpu.models.blocks import (
    ConvBNAct, ConvTranspose, DecodeBlock, UpscaleBlock, center_crop,
)

ENCODER_WIDTHS = (64, 128, 256, 512, 1024)


class _Encoder(nn.Module):
    """5-level UNet encoder; returns all level features for skips.

    ``remat=True`` wraps each conv-BN-ReLU block in :func:`nn.remat` so
    the backward pass recomputes the block's internals (conv output, BN
    normalization) instead of storing them — only the level boundary
    activations (needed for the skips anyway) stay live. Names are
    pinned to the plain variant's auto-names so checkpoints and torch
    importers are remat-agnostic."""

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # static_argnums=(2,): `train` (after self, x) stays a Python bool
        block = (nn.remat(ConvBNAct, static_argnums=(2,)) if self.remat
                 else ConvBNAct)
        feats = []
        for level, width in enumerate(ENCODER_WIDTHS):
            if level > 0:
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            for j in (0, 1):
                x = block(width, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"ConvBNAct_{2 * level + j}")(x, train)
            feats.append(x)
        return feats


def _space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def _depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c // (r * r))


class UNet(nn.Module):
    """5-level U-Net. ``upsample='bilinear'`` is the reference's "Unet",
    ``upsample='transpose'`` its "Unetv2".

    ``stem='s2d'`` (opt-in, NOT reference-parity — weights are not
    importable from torch checkpoints) is the TPU perf variant: the input
    is space-to-depth rearranged 2x (H, W, 3) -> (H/2, W/2, 12) so every
    level runs at half resolution — the level-1 stack at 224² dominated
    both FLOPs and HBM traffic in the round-1 profile — and the logits are
    emitted at 4x channels and depth-to-space'd back to full resolution.
    """

    num_classes: int
    upsample: str = "bilinear"  # "bilinear" | "transpose"
    stem: str = "full"          # "full" (parity) | "s2d" (perf variant)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # block-level rematerialization (see _Encoder): backward recomputes
    # each conv-BN block's internals; peak activation HBM drops to the
    # level boundaries. Same math/params/checkpoint layout.
    remat: bool = False

    requires_context = False
    returns_logits = True

    @nn.compact
    def __call__(self, x, context=None, train: bool = False):
        del context  # protocol arg; UNet ignores it (`nets.py:96`)
        x = jnp.asarray(x, self.dtype)
        if self.stem == "s2d":
            x = _space_to_depth(x, 2)
        x1, x2, x3, x4, x5 = _Encoder(
            dtype=self.dtype, param_dtype=self.param_dtype,
            remat=self.remat)(x, train)
        # TP hook: under parallel.tp.tensor_parallel the 1024-ch bottleneck
        # activation is pinned channel-sharded so its convs compute sharded.
        from cvcs_tpu.parallel import tp as _tp
        x5 = _tp.constrain(x5)

        def up(y):
            if self.upsample == "bilinear":
                return UpscaleBlock(dtype=self.dtype,
                                    param_dtype=self.param_dtype)(y)
            # blocks.ConvTranspose: same params/naming as nn.ConvTranspose
            # but computed as matmul + depth-to-space (MXU-native)
            return ConvTranspose(
                y.shape[-1] // 2,
                dtype=self.dtype, param_dtype=self.param_dtype)(y)

        # Decoder blocks deliberately NOT rematted: measured on v5e
        # (bs 128) nn.remat around the DecodeBlocks RAISES peak HBM back
        # to 10.81 GiB (vs 9.29 encoder-only) and costs another 16% step
        # time — the prevent_cse barriers stop XLA from fusing into the
        # big skip-concats. Encoder-only is the measured optimum
        # (BASELINE.md round 3).
        y = up(x5)
        y = DecodeBlock(512, dtype=self.dtype,
                        param_dtype=self.param_dtype)(
            jnp.concatenate([x4, y], axis=-1), train)
        y = up(y)
        y = DecodeBlock(256, dtype=self.dtype,
                        param_dtype=self.param_dtype)(
            jnp.concatenate([x3, y], axis=-1), train)
        y = up(y)
        # Reference center-crops the upsampled tensor to the skip's spatial
        # size at this level only (`nets.py:109`).
        y = center_crop(y, (x2.shape[1], x2.shape[2]))
        y = DecodeBlock(128, dtype=self.dtype,
                        param_dtype=self.param_dtype)(
            jnp.concatenate([y, x2], axis=-1), train)
        y = up(y)
        y = DecodeBlock(64, dtype=self.dtype,
                        param_dtype=self.param_dtype)(
            jnp.concatenate([x1, y], axis=-1), train)
        out_ch = (self.num_classes * 4 if self.stem == "s2d"
                  else self.num_classes)
        logits = nn.Conv(
            out_ch, kernel_size=(1, 1),
            dtype=self.dtype, param_dtype=self.param_dtype)(y)
        if self.stem == "s2d":
            logits = _depth_to_space(logits, 2)
        return logits.astype(jnp.float32)


def unet(num_classes: int, **kw) -> UNet:
    """Reference "Unet" (`utils.py:178-179`)."""
    return UNet(num_classes=num_classes, upsample="bilinear", **kw)


def unet_v2(num_classes: int, **kw) -> UNet:
    """Reference "Unetv2" (`utils.py:180-181`) — the paper's primary model."""
    return UNet(num_classes=num_classes, upsample="transpose", **kw)
