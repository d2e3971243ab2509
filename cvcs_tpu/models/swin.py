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
  input channels;
* on TPU, inference runs the pre-MLP half of each block (LN + QKV +
  masked window attention + out-projection) as ONE fused Pallas kernel
  (:mod:`cvcs_tpu.ops.pallas_swin`) — the XLA einsum path materializes
  the (nWin*B, heads, T, T) attention tensor in HBM and runs ~12% MFU
  (BASELINE.md round-4 trace attribution). Training keeps the einsum
  path (`fused_attn` docs below).

Parameter-tree compatibility: the attention Dense/LayerNorm weights are
declared through explicit param-holder modules whose tree paths are
identical to the previous `nn.Dense`/`nn.LayerNorm` layout
(``SwinBlock_N/WindowAttention_0/Dense_0 ...``), so checkpoints and the
torch interop in `utils.torch_import.import_swin` / `torch_export`
are unaffected.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cvcs_tpu.models.blocks import DecodeBlock
from cvcs_tpu.ops.pallas_swin import fused_window_attention

_LN_EPS = 1e-6

# Whether TRAINING uses the fused Pallas window-attention pair (forward
# kernel + flash-style backward kernel, ops.pallas_swin._bwd_pallas) by
# default. On: the same-session on-chip A/B (BASELINE.md round-5 train
# pass) measured parity at bs 32 (133.7 vs 132.4 tiles512/s) and +9.9%
# at bs 64 (142.2 vs 129.4 — the einsum path's batch-scaled f32
# attention tensors degrade it past bs 32, the fused pair keeps
# scaling). CVCS_TPU_FUSED_ATTN_TRAIN=0 opts out per-run; cli/train
# sets that automatically under a multi-device mesh (an unpartitioned
# pallas_call would force GSPMD gathers).
_FUSED_TRAIN_DEFAULT = True


def _pad_to(x: jnp.ndarray, mult: int):
    h, w = x.shape[1], x.shape[2]
    ph = -h % mult
    pw = -w % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (h, w)


def _fused_fits(h: int, w: int, c: int, win: int) -> bool:
    """Fused-kernel admission: program size (unrolled window columns)
    and estimated scoped-VMEM footprint — one window row of x/qkv/f32
    transients (~M*C*16 bytes, M = win*w tokens) plus the whole
    (nWin, T, T) f32 mask. Measured failure shapes (round-5 fullconv
    probe): 7200-wide bands at 31-34 MB vs the 16 MB stack limit."""
    if w // win > 64:
        return False
    row_bytes = win * w * c * 16
    mask_bytes = (h // win) * (w // win) * win ** 4 * 4
    return row_bytes + mask_bytes <= 6 << 20


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


class _DenseParams(nn.Module):
    """Param holder with ``nn.Dense``-compatible tree paths/inits; lets
    the fused Pallas path consume raw kernels while the einsum path
    reproduces ``nn.Dense`` numerics exactly."""

    features_in: int
    features_out: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.features_in, self.features_out),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features_out,), self.param_dtype)
        return k, b


class _LNParams(nn.Module):
    """Param holder with ``nn.LayerNorm``-compatible tree paths/inits."""

    dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,),
                       self.param_dtype)
        return s, b


def _apply_ln(x, scale, bias, out_dtype):
    """flax ``nn.LayerNorm`` numerics from raw params: f32 fast-variance
    stats, y = (x - mean) * (rsqrt(var+eps) * scale) + bias, cast out."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu),
        0.0)
    mul = jax.lax.rsqrt(var + _LN_EPS) * scale.astype(jnp.float32)
    return ((xf - mu) * mul + bias.astype(jnp.float32)).astype(out_dtype)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        # attribute names ARE the tree names: Dense_0 = qkv, Dense_1 =
        # out projection (paths pinned by utils.torch_import.import_swin)
        self.Dense_0 = _DenseParams(self.dim, 3 * self.dim,
                                    self.param_dtype)
        self.Dense_1 = _DenseParams(self.dim, self.dim, self.param_dtype)

    def __call__(self, x, mask=None):
        # x: (nB, T, C); mask: (nWin, T, T) bool or None
        dt = self.dtype
        wqkv, bqkv = self.Dense_0()
        wout, bout = self.Dense_1()
        nb, t, _ = x.shape
        hd = self.dim // self.heads
        qkv = jax.lax.dot_general(
            x.astype(dt), wqkv.astype(dt),
            (((2,), (0,)), ((), ()))) + bqkv.astype(dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # token-major (nb, T, h, d) straight into the einsums — an
        # explicit head-major transpose materialized as a copy per
        # q/k/v/out (trace: ~650 copy ops/step, 17% of SwinUnet-base
        # device time); dot_general folds the layout into the matmul
        def heads(a):
            return a.reshape(nb, t, self.heads, hd)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, dt))
        attn = attn.astype(jnp.float32)
        if mask is not None:
            n_win = mask.shape[0]
            attn = attn.reshape(nb // n_win, n_win, self.heads, t, t)
            attn = jnp.where(mask[None, :, None], attn, -1e9)
            attn = attn.reshape(nb, self.heads, t, t)
        attn = nn.softmax(attn, axis=-1).astype(dt)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(nb, t, self.dim)
        return jax.lax.dot_general(
            out, wout.astype(dt), (((2,), (0,)), ((), ()))) + bout.astype(dt)

    def fused(self, xmap, ln_s, ln_b, np_mask, win):
        """Fused Pallas path: LN + QKV + attention + out-projection over
        the (rolled, window-padded) feature map. See ops.pallas_swin."""
        wqkv, bqkv = self.Dense_0()
        wout, bout = self.Dense_1()
        return fused_window_attention(
            xmap.astype(self.dtype), ln_s, ln_b, wqkv, bqkv, wout, bout,
            np_mask, win=win, heads=self.heads)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shifted: bool
    mlp_ratio: int = 4
    fused_attn: bool | None = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def _use_fused(self, train: bool) -> bool:
        """Fused kernel policy: `fused_attn` None = auto (TPU backend
        only), True forces it on (interpreter mode off-TPU — for tests),
        False forces it off. Training additionally gates on
        `_FUSED_TRAIN_DEFAULT` (the Pallas fwd+bwd pair — see
        ops.pallas_swin `_bwd_pallas`), overridable per-run with
        CVCS_TPU_FUSED_ATTN_TRAIN=0/1. CVCS_TPU_FUSED_ATTN=0 is the
        global escape hatch (e.g. GSPMD-sharded programs where an
        unpartitioned Pallas call would force gathers)."""
        if os.environ.get("CVCS_TPU_FUSED_ATTN", "1") == "0":
            return False
        if self.fused_attn is False:
            return False
        if train:
            env = os.environ.get("CVCS_TPU_FUSED_ATTN_TRAIN")
            if env == "0" or (env is None and not _FUSED_TRAIN_DEFAULT):
                return False
        if self.fused_attn is None:
            return jax.default_backend() == "tpu"
        return True

    @nn.compact
    def __call__(self, x, train: bool = False):
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

        ln1_s, ln1_b = _LNParams(c, self.param_dtype,
                                 name="LayerNorm_0")()
        attn = WindowAttention(c, self.heads, name="WindowAttention_0",
                               **kw)
        np_mask = _attn_mask(h, w, h0, w0, win, shift)

        # degenerate windows (clamped below 4: 1x1/2x2/3x3 maps) have
        # nothing to fuse and their unit-dim reshapes are unsupported by
        # the Mosaic lowering — the einsum path handles them. Big maps
        # (fullconv bands) fall back to einsum too, for two measured
        # reasons (round-5 fullconv probe on the real chip): (a) the
        # kernel unrolls a static loop over window COLUMNS, so program
        # size grows with w/win — a 7200-wide band exceeded the remote-
        # compile payload limit (HTTP 413); (b) scoped VMEM scales with
        # one window row (M = win*Wp tokens: x + qkv + f32 LN/out
        # transients ~ M*C*16 bytes) plus the whole (nWin, T, T) f32
        # mask — 7200-wide bands hit 31-34 MB vs the 16 MB stack limit.
        # Bound both: <= 64 columns and ~<= 6 MB estimated footprint
        # (every window-path shape through bc 512 passes; band shapes
        # fall back to einsum).
        if (self._use_fused(train) and win >= 4
                and _fused_fits(h, w, c, win)):
            # LN is position-wise, so it commutes with the roll: the
            # kernel sees the rolled raw map and applies LN inside.
            y = x_pad
            if shift:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            y = attn.fused(y, ln1_s, ln1_b, np_mask, win)
            if shift:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
        else:
            y = _apply_ln(x_pad, ln1_s, ln1_b, self.dtype)
            if shift:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(np_mask) if np_mask is not None else None
            tokens = _window_partition(y, win)
            tokens = attn(tokens, mask)
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

        y = nn.LayerNorm(name="LayerNorm_1", **kw)(x)
        y = nn.Dense(c * self.mlp_ratio, **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, **kw)(y)
        return x + y


class SwinUNet(nn.Module):
    """Swin-T encoder (depths 2/2/6/2) + UNet decoder, any band count.

    Protocol: ``requires_context = False``, ``returns_logits = True``.

    ``fused_attn``: None (default) = fused Pallas window attention on
    TPU inference, einsum elsewhere; True = force fused (interpreter
    mode off-TPU — tests); False = force einsum.
    """

    num_classes: int
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 8
    fused_attn: bool | None = None
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
                              self.window, shifted=bool(blk % 2),
                              fused_attn=self.fused_attn, **kw)(x, train)
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
