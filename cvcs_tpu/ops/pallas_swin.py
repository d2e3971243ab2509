"""Fused window-attention Pallas TPU kernel for the Swin encoder.

The round-4 trace attribution (BASELINE.md round-4 Swin pass) showed the
SwinUnet encoder at ~12% MFU: 64-token x 32-head-dim attention matmuls,
bandwidth-bound LayerNorm/softmax fusions between them, and ~17% of the
step in window partition/merge/roll copies. The FLOPs of the attention
core are ~2% of the model — the gap is HBM traffic and kernel count, so
the fix is fusion, not MXU tiling: this kernel runs the whole
pre-MLP half of a Swin block

    LayerNorm -> QKV projection -> masked window softmax-attention ->
    output projection

in one VMEM pass over the (already rolled, window-padded) feature map.
Nothing between the raw block input and the projected attention output
ever touches HBM: not the LN output, not the QKV tensor, and — the big
one — not the (nWin*B, heads, T, T) attention matrix the XLA path
materializes in f32 (154 MB per stage-1 block at batch_tiles=64).

Layout (one grid step handles BB batch rows x one window row):

* grid ``(B // BB, Hp // win)``; the x block is ``(BB, win, Wp, C)`` —
  a full row of windows, so the QKV matmul sees M = BB*win*Wp tokens
  (448..1024) instead of per-window 64, and the window *partition* is a
  VMEM-local slice/reshape instead of an HBM transpose;
* LayerNorm + QKV run position-wise on the whole block (flax formulas:
  f32 stats, fast variance, eps 1e-6, bf16 compute dtype);
* attention loops statically over (window, batch, head): ``(T, d)``
  q/k/v slices, f32 scores + additive mask bias + f32 softmax, bf16
  AV matmul — all register/VMEM transients;
* the merged attention map accumulates in a VMEM scratch and goes
  through the output projection as one ``(M, C) @ (C, C)`` matmul.

The shifted-window mask enters as an additive f32 bias ``(nWin, T, T)``
(0 = attend, -1e9 = blocked) built from the same trace-time numpy masks
as the einsum path (`cvcs_tpu.models.swin._attn_mask`).

Backward: `fused_window_attention` carries a custom VJP that recomputes
through a pure-jnp twin of the same math (`_reference_fused`), so grads
are available everywhere the fused forward runs; training keeps the
einsum path by default (a recompute backward pays an extra forward —
only worth flipping if measured to win on-chip; see BASELINE.md).

Off-TPU the kernel runs in interpreter mode for tests; the model only
enables the fused path automatically when the backend is TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6  # flax nn.LayerNorm default


def _pick_bb(batch: int, tokens_per_row: int, qkv_cols: int) -> int:
    """Batch rows per grid step: ~1024 tokens per QKV matmul, capped so
    the bf16 QKV block stays under ~2 MB of VMEM, and a divisor of B."""
    cap_tokens = max(tokens_per_row, (2 << 20) // (2 * qkv_cols))
    target = max(1, min(1024, cap_tokens) // tokens_per_row)
    bb = min(target, batch)
    while batch % bb:
        bb -= 1
    return bb


def _ln_f32(xf, scale, bias):
    """flax LayerNorm (fast variance, f32 stats) on a (M, C) f32 array."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu),
        0.0)
    return (xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _attn_core(tok, bias_w, heads, dim, dtype):
    """Attention for ONE window: tok (T, 3C) bf16 -> (T, C) bf16."""
    d = dim // heads
    scale = 1.0 / float(np.sqrt(d))
    outs = []
    for h in range(heads):
        q = tok[:, h * d:(h + 1) * d]
        k = tok[:, dim + h * d:dim + (h + 1) * d]
        v = tok[:, 2 * dim + h * d:2 * dim + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bias_w is not None:
            s = s + bias_w
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        outs.append(jnp.dot(p, v, preferred_element_type=jnp.float32)
                    .astype(dtype))
    return jnp.concatenate(outs, axis=-1)  # (T, C)


def _make_kernel(win: int, heads: int, dim: int, has_mask: bool):
    def kernel(*refs):
        if has_mask:
            (x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
             bout_ref, bias_ref, o_ref, scr) = refs
        else:
            (x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
             bout_ref, o_ref, scr) = refs
            bias_ref = None
        bb, wn, wp, c = x_ref.shape
        nw = wp // win
        t = win * win
        dtype = o_ref.dtype

        x2 = x_ref[:].reshape(bb * wn * wp, c).astype(jnp.float32)
        ln = _ln_f32(x2, lns_ref[0, :][None, :], lnb_ref[0, :][None, :])
        qkv = jax.lax.dot_general(
            ln.astype(dtype), wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = qkv + bqkv_ref[0, :][None, :].astype(jnp.float32)
        qkv = qkv.astype(dtype).reshape(bb, wn, wp, 3 * c)

        for w in range(nw):
            sl = qkv[:, :, w * win:(w + 1) * win, :].reshape(bb, t, 3 * c)
            bias_w = bias_ref[w] if has_mask else None
            for b in range(bb):
                ow = _attn_core(sl[b], bias_w, heads, dim, dtype)
                scr[b, :, w * win:(w + 1) * win, :] = (
                    ow.reshape(win, win, c))

        a2 = scr[:].reshape(bb * wn * wp, c)
        out = jax.lax.dot_general(
            a2, wout_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + bout_ref[0, :][None, :].astype(jnp.float32)
        o_ref[:] = out.astype(dtype).reshape(bb, wn, wp, c)

    return kernel


def _fwd_pallas(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias, *,
                win, heads, interpret):
    b, hp, wp, c = x.shape
    t = win * win
    nw = wp // win
    bb = _pick_bb(b, win * wp, 3 * c)
    grid = (b // bb, hp // win)
    dtype = x.dtype

    def full(shape):
        return pl.BlockSpec(shape, lambda i, r: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((bb, win, wp, c), lambda i, r: (i, r, 0, 0),
                     memory_space=pltpu.VMEM),
        full((1, c)), full((1, c)), full((c, 3 * c)), full((1, 3 * c)),
        full((c, c)), full((1, c)),
    ]
    args = [x,
            ln_s.reshape(1, c).astype(jnp.float32),
            ln_b.reshape(1, c).astype(jnp.float32),
            wqkv.astype(dtype), bqkv.reshape(1, 3 * c).astype(dtype),
            wout.astype(dtype), bout.reshape(1, c).astype(dtype)]
    if bias is not None:
        in_specs.append(pl.BlockSpec((nw, t, t), lambda i, r: (r, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    return pl.pallas_call(
        _make_kernel(win, heads, c, bias is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, win, wp, c), lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        scratch_shapes=[pltpu.VMEM((bb, win, wp, c), dtype)],
        interpret=interpret,
    )(*args)


def _reference_fused(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias, *,
                     win, heads):
    """Pure-jnp twin of the kernel (same math/casting points); used for
    the custom VJP and for off-TPU parity tests."""
    b, hp, wp, c = x.shape
    t = win * win
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(-1, c)
    ln = _ln_f32(xf, ln_s.reshape(1, c).astype(jnp.float32),
                 ln_b.reshape(1, c).astype(jnp.float32))
    ln = ln.astype(dtype).reshape(b, hp, wp, c)
    # window partition (matches models.swin._window_partition)
    tok = ln.reshape(b, hp // win, win, wp // win, win, c)
    tok = tok.transpose(0, 1, 3, 2, 4, 5).reshape(-1, t, c)
    qkv = jax.lax.dot_general(
        tok, wqkv.astype(dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv.reshape(1, 1, 3 * c).astype(jnp.float32)).astype(dtype)
    d = c // heads
    scale = 1.0 / float(np.sqrt(d))

    def hsplit(a):  # (nb, T, C) -> (nb, T, h, d)
        return a.reshape(a.shape[0], t, heads, d)

    q, k, v = (hsplit(qkv[..., :c]), hsplit(qkv[..., c:2 * c]),
               hsplit(qkv[..., 2 * c:]))
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        nwin = bias.shape[0]
        s = s.reshape(-1, nwin, heads, t, t) + bias[None, :, None]
        s = s.reshape(-1, heads, t, t)
    p = jax.nn.softmax(s, axis=-1).astype(dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                   preferred_element_type=jnp.float32)
    o = o.astype(dtype).reshape(-1, t, c)
    out = jax.lax.dot_general(
        o, wout.astype(dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = (out + bout.reshape(1, 1, c).astype(jnp.float32)).astype(dtype)
    # window merge (matches models.swin._window_merge)
    out = out.reshape(b, hp // win, wp // win, win, win, c)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)


@functools.lru_cache(maxsize=None)
def _build_op(win: int, heads: int, interpret: bool):
    """custom_vjp-wrapped fused op for one static (win, heads) config;
    the mask bias (a trace-time constant, possibly None) is non-diff."""

    def ref(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias):
        return _reference_fused(x, ln_s, ln_b, wqkv, bqkv, wout, bout,
                                bias, win=win, heads=heads)

    @jax.custom_vjp
    def op(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias):
        return _fwd_pallas(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias,
                           win=win, heads=heads, interpret=interpret)

    def fwd(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias):
        y = op(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias)
        return y, (x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias)

    def bwd(res, g):
        *diff, bias = res
        _, vjp = jax.vjp(lambda *a: ref(*a, bias), *diff)
        return tuple(vjp(g)) + (None,)

    op.defvjp(fwd, bwd)
    return op


def fused_window_attention(x, ln_s, ln_b, wqkv, bqkv, wout, bout,
                           mask=None, *, win: int, heads: int,
                           interpret: bool | None = None):
    """LN + QKV + masked window attention + out-projection, fused.

    Args:
      x: (B, Hp, Wp, C) feature map, already padded to window multiples
        and already rolled for shifted blocks. Hp, Wp divisible by win.
      ln_s, ln_b: LayerNorm scale/bias, (C,).
      wqkv, bqkv: QKV projection kernel (C, 3C) / bias (3C,).
      wout, bout: output projection kernel (C, C) / bias (C,).
      mask: optional (nWin, T, T) bool numpy mask (True = may attend)
        from `models.swin._attn_mask` — a trace-time constant.
      win: window size; heads: attention heads.

    Returns (B, Hp, Wp, C) in x.dtype — the window-merged attention
    output (pre-residual)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bias = None
    if mask is not None:
        bias = jnp.asarray(
            np.where(np.asarray(mask), 0.0, -1e9).astype(np.float32))
    op = _build_op(win, heads, bool(interpret))
    return op(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias)
