"""Swin-UNet hybrid tests: shapes (incl. 4-band multispectral input),
shifted-window mask correctness, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.models import build_model
from cvcs_tpu.models.swin import _shift_mask, _window_merge, _window_partition

F32 = dict(dtype=jnp.float32)


def _init_apply(model, x):
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, x, train=False)
    out = jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
    return variables, out


def test_swin_unet_shapes_rgb():
    model, spec = build_model("SwinUnetTiny", 16, **F32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    _, out = _init_apply(model, x)
    assert out.shape == (2, 64, 64, 16)
    assert spec.returns_logits


def test_swin_unet_multispectral_4band():
    """BASELINE config 4: RGB+NIR 4-band input."""
    model, _ = build_model("SwinUnetTiny", 16, **F32)
    x = jnp.zeros((1, 64, 64, 4), jnp.float32)
    _, out = _init_apply(model, x)
    assert out.shape == (1, 64, 64, 16)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    tokens = _window_partition(x, 4)
    assert tokens.shape == (2 * 4, 16, 3)
    back = _window_merge(tokens, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region_attention():
    """Official Swin semantics: the band trick describes the ROLLED map
    directly — only the last window row/col contain wrapped content, so
    at 16x16/win 4/shift 2 the free windows are the 3x3 interior grid
    (this test previously codified a double-rolled mask that left only
    4 free windows and blocked 832 legitimate token pairs)."""
    h = w = 16
    win, shift = 4, 2
    mask = _shift_mask(h, w, win, shift)
    assert mask.shape == (16, 16, 16)
    # windows not touching the wrapped last row/col attend freely:
    # row/col window indices {0, 1, 2} of 4 -> 3 * 3 = 9 free windows
    free = mask.all(axis=(1, 2)).reshape(4, 4)
    np.testing.assert_array_equal(free[:3, :3], True)
    assert free.sum() == 9
    # wrapped-edge windows have forbidden pairs, diagonal always allowed
    assert all(mask[k].diagonal().all() for k in range(16))
    np.testing.assert_array_equal(free[3, :], False)
    np.testing.assert_array_equal(free[:, 3], False)


def test_shift_mask_matches_official_reference():
    """Pin the mask against an independent transcription of the official
    Swin implementation (img_mask bands -> window partition -> pairwise
    id equality, no roll)."""
    h = w = 12
    win, shift = 4, 2
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    mw = img.reshape(h // win, win, w // win, win)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, win * win)
    want = mw[:, :, None] == mw[:, None, :]
    np.testing.assert_array_equal(_shift_mask(h, w, win, shift), want)


def test_attn_mask_excludes_pad_keys():
    """Pad tokens beyond the real grid must not be attended to as keys,
    in both shifted and unshifted windows; pad queries keep their
    diagonal-free rows (outputs are sliced away at the block end)."""
    from cvcs_tpu.models.swin import _attn_mask

    h = w = 8
    h0, w0 = 6, 8    # two pad rows
    win = 4
    for shift in (0, 2):
        mask = _attn_mask(h, w, h0, w0, win, shift)
        valid = np.zeros((h, w), bool)
        valid[:h0, :w0] = True
        if shift:
            valid = np.roll(valid, (-shift, -shift), axis=(0, 1))
        v = valid.reshape(h // win, win, w // win, win)
        v = v.transpose(0, 2, 1, 3).reshape(-1, win * win)
        # no pad token is ever a permitted key
        assert not (mask & ~v[:, None, :]).any()
        # real->real attention within a window is unrestricted when
        # unshifted
        if shift == 0:
            np.testing.assert_array_equal(
                mask, np.broadcast_to(v[:, None, :], mask.shape))
    # fully-real grids need no mask at all when unshifted
    assert _attn_mask(8, 8, 8, 8, 4, 0) is None


def test_gradients_flow():
    model, _ = build_model("SwinUnetTiny", 4, **F32)
    x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, x, train=False)

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False)
        return jnp.mean(out ** 2)

    g = jax.jit(jax.grad(loss))(variables["params"])
    norms = [float(jnp.linalg.norm(v))
             for v in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    assert any(n > 0 for n in norms)


# ---------------------------------------------------------------------------
# torch interop (the zoo's "weights flow both ways" bar, PARITY.md §2.5)
# ---------------------------------------------------------------------------

_TINY = dict(dims=(8, 16, 32, 64), depths=(2, 2, 2, 2), heads=(2, 2, 4, 4),
             window=4)


def test_import_swin_parity():
    """Torch twin -> import_swin -> SwinUNet forward parity at 96x96:
    stage maps 24/12/6/3 exercise plain, shifted, padded+shifted, and
    single-window (shift-disabled) attention plus the BN decoder."""
    import pytest
    torch = pytest.importorskip("torch")

    from cvcs_tpu.models.swin import SwinUNet
    from cvcs_tpu.utils.torch_import import import_swin
    from cvcs_tpu.utils.torch_swin_ref import TorchSwinUNet

    torch.manual_seed(0)
    twin = TorchSwinUNet(num_classes=5, **_TINY).eval()
    # non-trivial BN running stats so the decoder parity is real
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.4)
    variables = import_swin(twin.state_dict(), depths=_TINY["depths"])

    model = SwinUNet(num_classes=5, **_TINY, dtype=jnp.float32)
    x = np.random.default_rng(0).standard_normal(
        (2, 96, 96, 3)).astype(np.float32)
    got = jax.jit(lambda v, a: model.apply(v, a, train=False))(
        variables, jnp.asarray(x))
    with torch.no_grad():
        ref = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(got),
                               ref.transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_export_swin_roundtrip():
    """export_swin loads strict into the torch twin (forward parity) and
    import_swin(export_swin(v)) is the identity."""
    import pytest
    torch = pytest.importorskip("torch")

    from cvcs_tpu.models.swin import SwinUNet
    from cvcs_tpu.utils.torch_export import export_swin
    from cvcs_tpu.utils.torch_import import import_swin
    from cvcs_tpu.utils.torch_swin_ref import TorchSwinUNet

    model = SwinUNet(num_classes=5, **_TINY, dtype=jnp.float32)
    x = np.random.default_rng(1).standard_normal(
        (1, 64, 64, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(2)}, jnp.asarray(x), train=False)

    sd = export_swin(variables, depths=_TINY["depths"])
    twin = TorchSwinUNet(num_classes=5, **_TINY)
    missing, unexpected = twin.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(a)) for k, a in sd.items()},
        strict=True)
    assert not missing and not unexpected
    twin.eval()
    got = jax.jit(lambda v, a: model.apply(v, a, train=False))(
        variables, jnp.asarray(x))
    with torch.no_grad():
        ref = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(got),
                               ref.transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)

    back = import_swin(sd, depths=_TINY["depths"])
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (p, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, err_msg=str(p))
