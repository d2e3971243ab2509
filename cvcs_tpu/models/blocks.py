"""Shared convolutional building blocks (flax.linen, NHWC).

Capability-parity with the reference's `blocks.py` (reference
`source/scripts/blocks.py:1-49`), re-expressed TPU-first: NHWC layout so XLA
tiles convs onto the MXU, bf16 compute / f32 params via the module `dtype`
/ `param_dtype` pair, and BatchNorm statistics kept in f32.

Semantics preserved exactly:

* ``ConvBNAct`` = conv3x3 -> BatchNorm -> [ReLU] -> [maxpool 2x2]
  (reference ``UnetEncodeLayer``, `blocks.py:8-24`).
* ``UpscaleBlock`` = 2x bilinear upsample -> conv3x3 halving channels
  (reference ``UnetUpscaleLayer``, `blocks.py:26-35`).
* ``DecodeBlock`` = 2 x [conv3x3 -> ReLU -> BatchNorm] (reference
  ``UnetForwardDecodeLayer``, `blocks.py:37-49` — note the swapped
  ReLU/BN order vs the encoder; kept for parity).

BatchNorm matches torch defaults: momentum 0.1 (flax ``momentum=0.9``),
eps 1e-5, affine, track running stats (collection ``batch_stats``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cvcs_tpu.ops.resize import upsample_bilinear


class ConvBNAct(nn.Module):
    """conv3x3 + BN [+ ReLU] [+ 2x2 maxpool] (`blocks.py:8-24`)."""

    features: int
    activated: bool = True
    max_pool: bool = False
    padding: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            padding=self.padding,
            kernel_dilation=self.dilation,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        if self.activated:
            x = nn.relu(x)
        if self.max_pool:
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x


class UpscaleBlock(nn.Module):
    """2x bilinear upsample + conv3x3 halving channels (`blocks.py:26-35`)."""

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_bilinear(x, scale=2)
        x = nn.Conv(
            x.shape[-1] // 2,
            kernel_size=(3, 3),
            padding=1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        return x


class DecodeBlock(nn.Module):
    """2 x [conv3x3 + ReLU + BN] (`blocks.py:37-49`)."""

    features: int
    padding: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for _ in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding=self.padding,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        return x


class ConvTranspose(nn.Module):
    """MXU-native 2x2/stride-2 transposed conv (UNetv2's decoder upsample,
    reference `nets.py:149-169`).

    Algebraically identical to ``nn.ConvTranspose(features, (2, 2),
    strides=(2, 2))`` — same parameter names, shapes, and init, so Orbax
    checkpoints and the torch importer are unchanged — but computed as a
    1x1 matmul + depth-to-space instead of a fractionally-strided
    convolution. With k == s the output 2x2 sub-pixels never overlap, so
    the ConvTranspose is exactly a per-pixel (cin -> 4*cout) matmul whose
    outputs interleave spatially; XLA maps the matmul straight onto the
    MXU and, crucially, the *backward* pass becomes two matmuls instead of
    the reversed/dilated convolutions the profiler showed burning HBM
    bandwidth (full-activation ``reverse`` ops) in round 1.
    """

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        # lax.conv_transpose(SAME, k=s=2) places x[i,j]*K[1-di,1-dj] at
        # out[2i+di, 2j+dj]; flip K up front to keep bit-parity with the
        # flax/lax formulation (verified in tests/test_models.py).
        k = jnp.asarray(kernel, self.dtype)[::-1, ::-1]
        x = jnp.asarray(x, self.dtype)
        y = jnp.einsum("bhwc,ijco->bhwijo", x, k)
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        # (b,h,w,i,j,o) -> (b,h,i,w,j,o) -> (b,2h,2w,o)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, 2 * h, 2 * w, self.features)
        return y + jnp.asarray(bias, self.dtype)


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center-crop the spatial dims of an NHWC tensor to ``size`` (the
    reference's torchvision ``functional.center_crop`` at `nets.py:109`)."""
    h, w = x.shape[1], x.shape[2]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[:, top:top + size, left:left + size, :]
