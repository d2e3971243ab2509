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

Backward: `fused_window_attention` carries a custom VJP whose backward
is a SECOND Pallas kernel (`_bwd_pallas`) with the same grid/block
layout: each step recomputes LN/QKV/softmax in VMEM (flash-attention
style — cheaper than storing the (nWin*B, heads, T, T) probabilities)
and emits the input gradient block plus f32 parameter-gradient
accumulators, which are safe to read-add-write because the TPU grid
iterates sequentially. Neither the attention matrix nor its gradient
ever exists in HBM, in either direction. Shapes whose backward footprint
exceeds the scoped-VMEM budget (`_bwd_fits`) fall back to recomputing
through the pure-jnp twin (`_reference_fused`).

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


_BWD_VMEM_BUDGET = 14 << 20  # scoped-VMEM stack limit is 16 MB


def _pick_bb_bwd(batch: int, row_tokens: int, c: int) -> int:
    """Backward batch-rows per grid step: the backward kernel holds ~3x
    the forward's transients (x/g/dx blocks, qkv + dqkv + attn scratch,
    four f32 (M, C) intermediates, ~36 B per token-channel) PLUS the f32
    weight-gradient accumulators (16*C^2 B, resident whatever bb is) —
    so the token target shrinks as C grows (stage 4 runs bb=1)."""
    avail = _BWD_VMEM_BUDGET - 16 * c * c
    cap = max(row_tokens, avail // (36 * c))
    bb = min(max(1, min(512, cap) // row_tokens), batch)
    while batch % bb:
        bb -= 1
    return bb


def _bwd_fits(win: int, hp: int, wp: int, c: int) -> bool:
    """Backward admission at the minimum bb=1 footprint: one window row
    of transients + the weight-gradient accumulators + one mask row."""
    row = win * wp
    mask_bytes = (wp // win) * win ** 4 * 4
    return 36 * row * c + 16 * c * c + mask_bytes <= _BWD_VMEM_BUDGET


def _attn_bwd_core(tok, da_w, bias_w, heads, dim, dtype):
    """Backward through attention for ONE window. tok (T, 3C) bf16 is the
    recomputed QKV; da_w (T, C) is the cotangent of the merged attention
    output. Returns (dtok (T, 3C) f32, o (T, C) bf16) — o is the
    recomputed forward output, needed upstream for the out-projection
    weight gradient."""
    d = dim // heads
    scale = 1.0 / float(np.sqrt(d))
    dqs, dks, dvs, outs = [], [], [], []
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
        p32 = e / jnp.sum(e, axis=-1, keepdims=True)
        p = p32.astype(dtype)
        outs.append(jnp.dot(p, v, preferred_element_type=jnp.float32)
                    .astype(dtype))
        do = da_w[:, h * d:(h + 1) * d]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dvs.append(jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        ds = (p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
              * scale).astype(dtype)
        dqs.append(jnp.dot(ds, k, preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dtok = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (T, 3C) f32
    return dtok, jnp.concatenate(outs, axis=-1)


def _acc(ref, val, first):
    """Sequential-grid accumulator: store on the first step, add after."""

    @pl.when(first)
    def _store():
        ref[...] = val

    @pl.when(jnp.logical_not(first))
    def _add():
        ref[...] += val


def _make_bwd_kernel(win: int, heads: int, dim: int, has_mask: bool):
    def kernel(*refs):
        if has_mask:
            (x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
             bout_ref, bias_ref, g_ref, dx_ref, dlns_ref, dlnb_ref,
             dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
             dqkv_scr, a_scr) = refs
        else:
            (x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
             bout_ref, g_ref, dx_ref, dlns_ref, dlnb_ref,
             dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
             dqkv_scr, a_scr) = refs
            bias_ref = None
        del bout_ref  # forward bias: no recompute needed for grads
        bb, wh, wp, c = x_ref.shape
        nw = wp // win
        t = win * win
        dtype = x_ref.dtype
        mm = bb * wh * wp
        first = jnp.logical_and(pl.program_id(0) == 0,
                                pl.program_id(1) == 0)

        # recompute LN + QKV (same casting points as the forward kernel)
        x2 = x_ref[:].reshape(mm, c).astype(jnp.float32)
        mu = jnp.mean(x2, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(x2), axis=-1, keepdims=True)
            - jnp.square(mu), 0.0)
        rs = jax.lax.rsqrt(var + _LN_EPS)
        xhat = (x2 - mu) * rs
        lns = lns_ref[0, :][None, :]
        ln_bf = (xhat * lns + lnb_ref[0, :][None, :]).astype(dtype)
        qkv = jax.lax.dot_general(
            ln_bf, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[0, :][None, :].astype(jnp.float32)
               ).astype(dtype).reshape(bb, wh, wp, 3 * c)

        # out-projection backward: da = g @ wout^T
        g2 = g_ref[:].reshape(mm, c)
        da = jax.lax.dot_general(
            g2, wout_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        da = da.astype(dtype).reshape(bb, wh, wp, c)

        for w in range(nw):
            sl = qkv[:, :, w * win:(w + 1) * win, :].reshape(bb, t, 3 * c)
            daw = da[:, :, w * win:(w + 1) * win, :].reshape(bb, t, c)
            bias_w = bias_ref[w] if has_mask else None
            for b in range(bb):
                dtok, o = _attn_bwd_core(sl[b], daw[b], bias_w, heads,
                                         dim, dtype)
                a_scr[b, :, w * win:(w + 1) * win, :] = (
                    o.reshape(win, win, c))
                dqkv_scr[b, :, w * win:(w + 1) * win, :] = (
                    dtok.astype(dtype).reshape(win, win, 3 * c))

        a2 = a_scr[:].reshape(mm, c)
        _acc(dwout_ref, jax.lax.dot_general(
            a2, g2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), first)
        _acc(dbout_ref, jnp.sum(g2.astype(jnp.float32), axis=0,
                                keepdims=True), first)
        dq2 = dqkv_scr[:].reshape(mm, 3 * c)
        _acc(dbqkv_ref, jnp.sum(dq2.astype(jnp.float32), axis=0,
                                keepdims=True), first)
        _acc(dwqkv_ref, jax.lax.dot_general(
            ln_bf, dq2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), first)
        # QKV backward into LayerNorm
        dln = jax.lax.dot_general(
            dq2, wqkv_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        _acc(dlns_ref, jnp.sum(dln * xhat, axis=0, keepdims=True), first)
        _acc(dlnb_ref, jnp.sum(dln, axis=0, keepdims=True), first)
        dxh = dln * lns
        dx2 = rs * (dxh - jnp.mean(dxh, axis=-1, keepdims=True)
                    - xhat * jnp.mean(dxh * xhat, axis=-1, keepdims=True))
        dx_ref[:] = dx2.astype(dtype).reshape(bb, wh, wp, c)

    return kernel


def _bwd_pallas(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias, g, *,
                win, heads, interpret):
    b, hp, wp, c = x.shape
    t = win * win
    nw = wp // win
    bb = _pick_bb_bwd(b, win * wp, c)
    grid = (b // bb, hp // win)
    dtype = x.dtype

    def full(shape):
        return pl.BlockSpec(shape, lambda i, r: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    blk = pl.BlockSpec((bb, win, wp, c), lambda i, r: (i, r, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [
        blk, full((1, c)), full((1, c)), full((c, 3 * c)),
        full((1, 3 * c)), full((c, c)), full((1, c)),
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
    in_specs.append(blk)
    args.append(g.astype(dtype))
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, dtype),         # dx
        jax.ShapeDtypeStruct((1, c), f32),            # d ln scale
        jax.ShapeDtypeStruct((1, c), f32),            # d ln bias
        jax.ShapeDtypeStruct((c, 3 * c), f32),        # d wqkv
        jax.ShapeDtypeStruct((1, 3 * c), f32),        # d bqkv
        jax.ShapeDtypeStruct((c, c), f32),            # d wout
        jax.ShapeDtypeStruct((1, c), f32),            # d bout
    ]
    out_specs = [blk, full((1, c)), full((1, c)), full((c, 3 * c)),
                 full((1, 3 * c)), full((c, c)), full((1, c))]
    dx, dlns, dlnb, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        _make_bwd_kernel(win, heads, c, bias is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bb, win, wp, 3 * c), dtype),
                        pltpu.VMEM((bb, win, wp, c), dtype)],
        interpret=interpret,
    )(*args)
    return (dx, dlns.reshape(c), dlnb.reshape(c),
            dwqkv.astype(wqkv.dtype), dbqkv.reshape(3 * c).astype(bqkv.dtype),
            dwout.astype(wout.dtype), dbout.reshape(c).astype(bout.dtype))


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
        x = diff[0]
        if _bwd_fits(win, x.shape[1], x.shape[2], x.shape[3]):
            return _bwd_pallas(*diff, bias, g, win=win, heads=heads,
                               interpret=interpret) + (None,)
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
