"""Fused Pallas CE vs the reference jnp implementation (interpret mode on
CPU; the same kernel compiles for TPU — exercised by bench/verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.ops import losses
from cvcs_tpu.ops.pallas_ce import build_fused_ce, fused_cross_entropy

B, H, W, C = 2, 33, 47, 16  # odd spatial dims force N padding


def _data(seed=0):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, size=(B, H, W)))
    return logits, labels


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("ignore", [None, 0])
def test_forward_matches_reference(weighted, ignore):
    logits, labels = _data()
    w = (jnp.linspace(0.2, 1.8, C).astype(jnp.float32)
         if weighted else None)
    ours = float(fused_cross_entropy(logits, labels, w, ignore, True))
    ref = float(losses.cross_entropy(logits, labels, w, ignore))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_gradient_matches_reference():
    logits, labels = _data(1)
    w = jnp.linspace(0.5, 1.5, C).astype(jnp.float32)

    g_ours = jax.grad(
        lambda lg: fused_cross_entropy(lg, labels, w, 0, True))(logits)
    g_ref = jax.grad(
        lambda lg: losses.cross_entropy(lg, labels, w, 0))(logits)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               atol=1e-6)


def test_build_fused_ce_in_train_step():
    """The fused loss must plug into make_train_step unchanged."""
    from cvcs_tpu.models import build_model
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_train_step

    model, spec = build_model("Unet", C, dtype=jnp.float32)
    optimizer = build_optimizer("SGD1")
    state = create_train_state(
        model, optimizer, jnp.zeros((1, 32, 32, 3), jnp.uint8))
    step = make_train_step(build_fused_ce(interpret=True))
    image = jnp.zeros((1, 32, 32, 3), jnp.uint8)
    mask = jnp.zeros((1, 32, 32), jnp.int32)
    state, loss = step(state, image, mask, jnp.zeros((), jnp.uint8),
                       jnp.float32(1e-3), jax.random.key(0))
    assert np.isfinite(float(loss))
