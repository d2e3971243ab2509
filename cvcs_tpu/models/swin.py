"""Swin-UNet hybrid: shifted-window transformer encoder + UNet decoder.

BASELINE.json config 4 calls for a "Swin-UNet hybrid" with multispectral
(RGB+NIR) input; the reference's config docs advertise TSwin/BSwin nets
that were never implemented (`configs/train/README.txt:40-48`, SURVEY
quirk 10). This module provides that family as a first-class, from-scratch
TPU model — there are no pretrained weights to import, so the design
optimizes for the MXU rather than torch-layout compatibility:

* windows are attention *batches*: (B * nWin, W*W, C) matmuls land on the
  MXU; window size defaults to 8 (lane-friendly) and clamps to the feature
  map when smaller;
* shifted windows use `jnp.roll` + the standard region-id attention mask
  (computed from static shapes at trace time, so it folds into the
  program as a constant);
* feature maps that don't tile by the window are zero-padded and sliced
  back (pad tokens are masked out of attention);
* patch merging is a strided 2x2 conv (equivalent capacity to Swin's
  concat+linear, one fused op on TPU);
* decoder: UNet-style ConvTranspose upsampling with stage-skip concats and
  a 4x learned upsampling head back to input resolution (the patch embed
  is stride 4);
* any band count works (4-band NirRGB included): the stem conv infers its
  input channels.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cvcs_tpu.models.blocks import DecodeBlock


def _pad_to(x: jnp.ndarray, mult: int):
    h, w = x.shape[1], x.shape[2]
    ph = -h % mult
    pw = -w % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (h, w)


def _window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)


def _window_merge(x: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // win) * (w // win))
    c = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _shift_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """Region-id attention mask for shifted windows, (nWin, W*W, W*W) bool
    (True = may attend). Pure numpy over static shapes.

    The official Swin band trick: the three bands per axis describe the
    ROLLED feature map directly (after rolling by -shift, the wrapped
    content sits in the last `shift` rows/cols and the last partial
    window in [-win, -shift)), so the id grid must NOT be rolled again —
    a second roll misplaces every band boundary and was measured to
    block 832 legitimate token pairs at h=w=16/win=4/shift=2 while
    leaving only 4 of the standard 9 free windows."""
    ids = np.zeros((h, w), np.int32)
    h_bands = (slice(0, h - win), slice(h - win, h - shift),
               slice(h - shift, h))
    w_bands = (slice(0, w - win), slice(w - win, w - shift),
               slice(w - shift, w))
    cnt = 0
    for hb in h_bands:
        for wb in w_bands:
            ids[hb, wb] = cnt
            cnt += 1
    ids = ids.reshape(h // win, win, w // win, win)
    ids = ids.transpose(0, 2, 1, 3).reshape(-1, win * win)
    return ids[:, :, None] == ids[:, None, :]


def _attn_mask(h: int, w: int, h0: int, w0: int, win: int,
               shift: int) -> np.ndarray | None:
    """Combined shifted-region x pad-validity mask, (nWin, T, T) bool or
    None when nothing needs masking. Pad tokens (beyond the real h0 x w0
    grid) are excluded as attention KEYS — real edge tokens must not
    attend to LayerNorm-bias garbage; pad queries' outputs are sliced
    away at the block end."""
    region = _shift_mask(h, w, win, shift) if shift else None
    if h == h0 and w == w0:
        return region
    valid = np.zeros((h, w), bool)
    valid[:h0, :w0] = True
    if shift:
        # the validity grid lives in original coordinates — it follows
        # the features' roll (unlike the band ids above)
        valid = np.roll(valid, (-shift, -shift), axis=(0, 1))
    v = valid.reshape(h // win, win, w // win, win)
    v = v.transpose(0, 2, 1, 3).reshape(-1, win * win)
    keys_ok = np.broadcast_to(v[:, None, :], (v.shape[0],) + (v.shape[1],) * 2)
    return keys_ok if region is None else (region & keys_ok)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nB, T, C); mask: (nWin, T, T) bool or None
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nb, t, _ = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, **kw)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # token-major (nb, T, h, d) straight into the einsums — an
        # explicit head-major transpose materialized as a copy per
        # q/k/v/out (trace: ~650 copy ops/step, 17% of SwinUnet-base
        # device time); dot_general folds the layout into the matmul
        def heads(a):
            return a.reshape(nb, t, self.heads, hd)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, self.dtype))
        attn = attn.astype(jnp.float32)
        if mask is not None:
            n_win = mask.shape[0]
            attn = attn.reshape(nb // n_win, n_win, self.heads, t, t)
            attn = jnp.where(mask[None, :, None], attn, -1e9)
            attn = attn.reshape(nb, self.heads, t, t)
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(nb, t, self.dim)
        return nn.Dense(self.dim, **kw)(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shifted: bool
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h0, w0, c = x.shape
        win = min(self.window, h0, w0)
        x_pad, (h0, w0) = _pad_to(x, win)
        h, w = x_pad.shape[1], x_pad.shape[2]
        # official Swin disables the shift when the map is a single
        # window (min(resolution) <= window): rolling one window only
        # carves it into mutually-masked regions for nothing
        shift = (win // 2 if (self.shifted and win > 1
                              and min(h0, w0) > win) else 0)

        y = nn.LayerNorm(**kw)(x_pad)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        np_mask = _attn_mask(h, w, h0, w0, win, shift)
        mask = jnp.asarray(np_mask) if np_mask is not None else None
        tokens = _window_partition(y, win)
        tokens = WindowAttention(c, self.heads, **kw)(tokens, mask)
        y = _window_merge(tokens, win, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        # slice the pad region off BEFORE the residual + MLP: LayerNorm
        # and the MLP are position-wise, so running them on pad tokens
        # (stages whose maps don't tile by the window, e.g. 28->32 and
        # 14->16 at 224 input: +30% tokens) buys nothing — the pad
        # region was discarded at block end anyway. Bit-exact for the
        # real tokens; the MLP is the encoder's FLOP bulk.
        x = x + y[:, :h0, :w0]

        y = nn.LayerNorm(**kw)(x)
        y = nn.Dense(c * self.mlp_ratio, **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, **kw)(y)
        return x + y


class SwinUNet(nn.Module):
    """Swin-T encoder (depths 2/2/6/2) + UNet decoder, any band count.

    Protocol: ``requires_context = False``, ``returns_logits = True``.
    """

    num_classes: int
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 8
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    requires_context = False
    returns_logits = True

    @nn.compact
    def __call__(self, x, context=None, train: bool = False):
        del context
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = jnp.asarray(x, self.dtype)
        # stem: 4x4/4 patch embed (any input band count)
        x = nn.Conv(self.dims[0], (4, 4), strides=4, **kw)(x)
        x = nn.LayerNorm(**kw)(x)
        skips = []
        for stage in range(4):
            if stage > 0:
                # patch merging as strided conv
                x = nn.Conv(self.dims[stage], (2, 2), strides=2,
                            use_bias=False, **kw)(x)
                x = nn.LayerNorm(**kw)(x)
            for blk in range(self.depths[stage]):
                x = SwinBlock(self.dims[stage], self.heads[stage],
                              self.window, shifted=bool(blk % 2), **kw)(x)
            skips.append(x)

        y = skips[-1]
        for stage in (2, 1, 0):
            y = nn.ConvTranspose(self.dims[stage], (2, 2), strides=(2, 2),
                                 **kw)(y)
            y = jnp.concatenate([skips[stage], y], axis=-1)
            y = DecodeBlock(self.dims[stage], **kw)(y, train)
        # 4x back to input resolution
        y = nn.ConvTranspose(self.dims[0] // 2, (2, 2), strides=(2, 2),
                             **kw)(y)
        y = nn.relu(y)
        y = nn.ConvTranspose(self.dims[0] // 2, (2, 2), strides=(2, 2),
                             **kw)(y)
        y = nn.relu(y)
        logits = nn.Conv(self.num_classes, (3, 3), padding=1, **kw)(y)
        return logits.astype(jnp.float32)
