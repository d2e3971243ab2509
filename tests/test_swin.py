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
    h = w = 16
    win, shift = 4, 2
    mask = _shift_mask(h, w, win, shift)
    assert mask.shape == (16, 16, 16)
    # windows fully inside the unshifted interior band attend freely:
    # row/col window indices {0, 1} of 4 -> 2 * 2 = 4 free windows
    assert mask.all(axis=(1, 2)).sum() == 4
    # every other window has at least one forbidden pair, diagonal allowed
    assert all(mask[k].diagonal().all() for k in range(16))
    assert (~mask.all(axis=(1, 2))).sum() == 12


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
