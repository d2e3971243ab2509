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

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.linen import normalization as _fnorm

from cvcs_tpu.ops.resize import upsample_bilinear


class BatchNorm(nn.BatchNorm):
    """``nn.BatchNorm`` with torch's running-variance semantics.

    NOTE the class is named ``BatchNorm`` on purpose: flax derives scope
    names from ``type(self).__name__``, so this keeps every submodule
    named ``BatchNorm_N`` — existing Orbax checkpoints and the torch
    importers/exporters see identical trees.

    torch's ``F.batch_norm`` updates ``running_var`` with the UNBIASED
    sample variance (factor n/(n-1)) while normalizing the batch with the
    biased one; flax uses the biased variance for both. The factor is
    tiny (n = B*H*W pixels per channel) but it is a real, measurable
    cross-framework divergence in the BN state after training
    (`tests/test_train_parity_torch.py` pins the trajectory). This
    subclass applies the correction in the EMA update only — variable /
    param names, init, dtype handling, and the normalization math are
    inherited, so checkpoints, importers, and exporters are unchanged.
    The whole zoo uses it (reference nets train with torch BN,
    `blocks.py:8-24`, torchvision backbones, HF SegFormer).
    """

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None, *,
                 mask=None):
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _fnorm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stats_dtype = (jnp.float32 if self.force_float32_reductions
                       else self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, stats_dtype), feature_shape)
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, stats_dtype), feature_shape)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = _fnorm._compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=(self.axis_name if not self.is_initializing()
                           else None),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=mask,
                force_float32_reductions=self.force_float32_reductions)
            if not self.is_initializing():
                n = int(np.prod([x.shape[a] for a in reduction_axes]))
                if self.axis_name is not None:
                    # sync-BN: stats were psum'd over the named axis, so
                    # the true sample count spans all its devices
                    n *= jax.lax.axis_size(self.axis_name)
                correction = n / max(n - 1, 1)   # torch unbiased EMA
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var * correction)

        return _fnorm._normalize(
            self, x, mean, var, reduction_axes, feature_axes,
            self.dtype, self.param_dtype, self.epsilon,
            self.use_bias, self.use_scale, self.bias_init, self.scale_init,
            self.force_float32_reductions)


TorchBatchNorm = BatchNorm   # explicit-intent alias used at call sites


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
        x = TorchBatchNorm(
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
            x = TorchBatchNorm(
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


def center_crop(x: jnp.ndarray, size) -> jnp.ndarray:
    """Center-crop the spatial dims of an NHWC tensor to ``size`` (the
    reference's torchvision ``functional.center_crop`` at `nets.py:109`).

    ``size`` is an int (square, torchvision int semantics — all the
    reference ever passes) or an ``(out_h, out_w)`` pair, needed for the
    non-square bands of the full-convolution inference path."""
    out_h, out_w = (size, size) if isinstance(size, int) else size
    h, w = x.shape[1], x.shape[2]
    top = (h - out_h) // 2
    left = (w - out_w) // 2
    return x[:, top:top + out_h, left:left + out_w, :]
