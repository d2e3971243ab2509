"""Fused window-attention Pallas kernel vs the einsum path.

Runs the kernel in interpreter mode on the CPU backend (the model's
`fused_attn=True` forces the fused branch; `interpret` auto-selects).
Covers every mask regime the Swin stages hit: unshifted full-tiling
(maskless), shifted (region mask), padded (key-validity mask), shifted +
padded (combined), and the clamped single-window stage (win = min(H, W),
shift disabled). Reference: the einsum path these numerics shadow is
the round-4-measured `models/swin.py` WindowAttention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.models.swin import SwinBlock, SwinUNet, _attn_mask
from cvcs_tpu.ops.pallas_swin import (_pick_bb, _reference_fused,
                                      fused_window_attention)


def _block_pair(dim=16, heads=2, window=4, shifted=False):
    kw = dict(dim=dim, heads=heads, window=window, shifted=shifted)
    return (SwinBlock(fused_attn=True, **kw),
            SwinBlock(fused_attn=False, **kw))


def _run_pair(shape, dim=16, heads=2, window=4, shifted=False, seed=0):
    fused, plain = _block_pair(dim, heads, window, shifted)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), shape, jnp.float32)
    x = x.astype(jnp.bfloat16)
    variables = plain.init(rng, x)
    y_plain = plain.apply(variables, x)
    y_fused = fused.apply(variables, x)
    return np.asarray(y_plain, np.float32), np.asarray(y_fused, np.float32)


@pytest.mark.parametrize("case", [
    dict(shape=(2, 8, 8, 16)),                      # maskless, 2x2 windows
    dict(shape=(2, 8, 8, 16), shifted=True),        # region mask
    dict(shape=(1, 7, 10, 16)),                     # pad-validity mask
    dict(shape=(2, 7, 10, 16), shifted=True),       # combined mask
    dict(shape=(2, 4, 4, 16)),                      # single window, clamped
    dict(shape=(2, 3, 3, 16), window=8),            # win clamps to 3, T=9
    dict(shape=(3, 8, 12, 16), shifted=True),       # B=3 (bb divisor path)
])
def test_fused_matches_einsum_block(case):
    shape = case.pop("shape")
    y_plain, y_fused = _run_pair(shape, **case)
    assert y_fused.shape == y_plain.shape
    scale = max(1.0, float(np.abs(y_plain).max()))
    np.testing.assert_allclose(y_fused, y_plain, atol=3e-2 * scale)


def test_fused_full_model():
    """Whole SwinUNet (tiny dims) fused vs einsum — exercises all four
    stages incl. the padded 28->32-style grids at a 32px input."""
    kw = dict(num_classes=5, dims=(8, 16, 32, 64), depths=(1, 1, 2, 1),
              heads=(1, 2, 4, 8), window=4)
    plain = SwinUNet(fused_attn=False, **kw)
    fused = SwinUNet(fused_attn=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 4))
    variables = plain.init(jax.random.PRNGKey(0), x)
    y_plain = np.asarray(plain.apply(variables, x))
    y_fused = np.asarray(fused.apply(variables, x))
    scale = max(1.0, float(np.abs(y_plain).max()))
    np.testing.assert_allclose(y_fused, y_plain, atol=5e-2 * scale)


def test_fused_train_env_opt_out(monkeypatch):
    """CVCS_TPU_FUSED_ATTN_TRAIN=0 must bypass the kernel in training
    even with fused_attn=True — the two paths differ at bf16 rounding
    points, so bit-identical outputs prove the einsum branch ran. (This
    is also the switch cli/train flips under a multi-device mesh.)"""
    monkeypatch.setenv("CVCS_TPU_FUSED_ATTN_TRAIN", "0")
    fused, plain = _block_pair()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16))
    x = x.astype(jnp.bfloat16)
    variables = plain.init(jax.random.PRNGKey(0), x)
    y_f = plain.apply(variables, x, True)
    y_p = fused.apply(variables, x, True)
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_p))


def test_fused_grad_matches_einsum():
    """custom VJP (recompute through the jnp twin) vs einsum-path grads."""
    fused, plain = _block_pair(shifted=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 16))
    x = x.astype(jnp.bfloat16)
    variables = plain.init(jax.random.PRNGKey(0), x)

    def loss(m):
        def f(v, xx):
            return jnp.sum(jnp.square(m.apply(v, xx).astype(jnp.float32)))
        return f

    g_plain = jax.grad(loss(plain))(variables, x)
    g_fused = jax.grad(loss(fused))(variables, x)
    flat_p = jax.tree_util.tree_leaves(g_plain)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(flat_p, flat_f):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, atol=5e-2 * scale)


def test_wide_map_falls_back_to_einsum(monkeypatch):
    """Maps wider than 64 window columns (fullconv bands) must take the
    einsum branch: the kernel unrolls a static loop over window columns,
    and at band width the program exceeds the remote-compile payload
    limit (round-5 fullconv probe on the real chip)."""
    from cvcs_tpu.models import swin as swin_mod

    def boom(*a, **k):
        raise AssertionError("fused kernel called for a wide map")

    monkeypatch.setattr(swin_mod.WindowAttention, "fused", boom)
    # 65 window columns > the 64-column program-size gate
    fused, plain = _block_pair()
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 260, 16))
    x = x.astype(jnp.bfloat16)
    variables = plain.init(jax.random.PRNGKey(0), x)
    y_f = fused.apply(variables, x)          # must not call boom
    y_p = plain.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_p))
    # deep-stage band: 64 columns pass the program gate but one window
    # row of C=384 transients exceeds the VMEM-footprint estimate
    from cvcs_tpu.models.swin import _fused_fits

    assert not _fused_fits(8, 256, 384, 4)
    fused, plain = _block_pair(dim=384, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 256, 384))
    x = x.astype(jnp.bfloat16)
    variables = plain.init(jax.random.PRNGKey(0), x)
    y_f = fused.apply(variables, x)          # must not call boom
    y_p = plain.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_p))
    # every window-path shape (bc<=512 tiles, all four stages) still
    # admits the fused kernel
    for w_map, c in [(64, 96), (32, 192), (16, 384), (8, 768),
                     (128, 96), (64, 192), (32, 384), (16, 768)]:
        assert _fused_fits(w_map, w_map, c, 8), (w_map, c)


def test_env_escape_hatch(monkeypatch):
    """CVCS_TPU_FUSED_ATTN=0 forces the einsum branch (bit-identical)."""
    fused, plain = _block_pair()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16))
    x = x.astype(jnp.bfloat16)
    variables = plain.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CVCS_TPU_FUSED_ATTN", "0")
    y_f = fused.apply(variables, x)
    y_p = plain.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_p))


def test_reference_twin_matches_kernel():
    """The custom-VJP recompute twin must track the kernel itself."""
    rng = np.random.default_rng(0)
    b, hp, wp, c, heads, win = 2, 8, 12, 16, 2, 4
    t = win * win
    x = jnp.asarray(rng.standard_normal((b, hp, wp, c)), jnp.bfloat16)
    ln_s = jnp.asarray(rng.standard_normal(c), jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bout = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    mask = _attn_mask(hp, wp, hp, wp, win, win // 2)
    y_k = fused_window_attention(x, ln_s, ln_b, wqkv, bqkv, wout, bout,
                                 mask, win=win, heads=heads)
    bias = jnp.asarray(np.where(mask, 0.0, -1e9).astype(np.float32))
    y_r = _reference_fused(x, ln_s, ln_b, wqkv, bqkv, wout, bout, bias,
                           win=win, heads=heads)
    a, r = np.asarray(y_k, np.float32), np.asarray(y_r, np.float32)
    scale = max(1.0, float(np.abs(r).max()))
    np.testing.assert_allclose(a, r, atol=3e-2 * scale)


def _rand_op_args(b, hp, wp, c, heads, win, shift, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, hp, wp, c)), jnp.bfloat16)
    ln_s = jnp.asarray(rng.standard_normal(c), jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bout = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    mask = _attn_mask(hp, wp, hp, wp, win, shift)
    bias = (None if mask is None else
            jnp.asarray(np.where(mask, 0.0, -1e9).astype(np.float32)))
    return (x, ln_s, ln_b, wqkv, bqkv, wout, bout), bias, mask


@pytest.mark.parametrize("case", [
    dict(b=1, hp=8, wp=8, c=16, heads=2, win=4, shift=0),    # maskless
    dict(b=2, hp=8, wp=12, c=16, heads=2, win=4, shift=2),   # region mask
    dict(b=3, hp=12, wp=8, c=16, heads=4, win=4, shift=2),   # multi-row grid
    dict(b=5, hp=4, wp=16, c=32, heads=2, win=4, shift=0),   # bb divisor of 5
])
def test_bwd_kernel_matches_reference_vjp(case):
    """The Pallas backward kernel vs jax.vjp of the jnp twin, for every
    argument (dx + all six parameter grads), across mask regimes and
    multi-step grids (both batch and window-row accumulation)."""
    from cvcs_tpu.ops.pallas_swin import _bwd_pallas

    args, bias, _ = _rand_op_args(**case)
    win, heads = case["win"], case["heads"]

    def f(*a):
        return _reference_fused(*a, bias, win=win, heads=heads)

    y, vjp = jax.vjp(f, *args)
    g = jnp.asarray(
        np.random.default_rng(9).standard_normal(y.shape), y.dtype)
    want = vjp(g)
    got = _bwd_pallas(*args, bias, g, win=win, heads=heads, interpret=True)
    assert len(got) == len(want) == 7
    for i, (a, b) in enumerate(zip(got, want)):
        assert a.shape == b.shape and a.dtype == b.dtype, i
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, atol=5e-2 * scale,
                                   err_msg=f"grad argument {i}")


def test_bwd_fits_gate():
    """Window-path shapes admit the backward kernel; fullconv-band-like
    shapes (or huge C) must fall back to the jnp-recompute VJP."""
    from cvcs_tpu.ops.pallas_swin import _bwd_fits

    for w_map, c in [(64, 96), (32, 192), (16, 384), (8, 768),
                     (128, 96), (64, 192), (32, 384), (16, 768)]:
        assert _bwd_fits(8, w_map, w_map, c), (w_map, c)
    assert not _bwd_fits(8, 64, 904, 96)     # 7232-wide fullconv band
    assert not _bwd_fits(8, 64, 64, 4096)    # accumulators alone > budget


def test_train_fused_grad_matches_einsum():
    """Full SwinBlock gradient with the fused TRAIN path (Pallas fwd +
    Pallas bwd) vs the einsum path, params and input."""
    fused, plain = _block_pair(shifted=True)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 12, 16))
    x = x.astype(jnp.bfloat16)
    variables = plain.init(jax.random.PRNGKey(0), x)

    def loss(m, train):
        def f(v, xx):
            return jnp.sum(
                jnp.square(m.apply(v, xx, train).astype(jnp.float32)))
        return f

    import cvcs_tpu.models.swin as swin_mod
    g_plain = jax.grad(loss(plain, True))(variables, x)
    old = swin_mod._FUSED_TRAIN_DEFAULT
    try:
        swin_mod._FUSED_TRAIN_DEFAULT = True
        g_fused = jax.grad(loss(fused, True))(variables, x)
    finally:
        swin_mod._FUSED_TRAIN_DEFAULT = old
    flat_p = jax.tree_util.tree_leaves(g_plain)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_p) == len(flat_f)
    for a, b in zip(flat_p, flat_f):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, atol=5e-2 * scale)


def test_pick_bb_divides():
    for batch in (1, 2, 3, 7, 32, 64, 128):
        for tokens, cols in ((448, 288), (256, 576), (128, 1152),
                             (49, 2304)):
            bb = _pick_bb(batch, tokens, cols)
            assert 1 <= bb <= batch and batch % bb == 0
