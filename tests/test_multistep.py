"""Compiled multi-step training must be step-for-step identical to the
single-step path (same init, same batches)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.models import build_model
from cvcs_tpu.ops.losses import build_loss
from cvcs_tpu.train import (
    TrainConfig, Trainer, build_optimizer, create_train_state,
)
from cvcs_tpu.train.step import make_multi_train_step, make_train_step

PATCH = 32


def _state():
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((2, PATCH, PATCH, 3), jnp.uint8))
    return model, spec, optimizer, state


def test_multi_step_equals_single_steps():
    model, spec, optimizer, state_a = _state()
    _, _, _, state_b = _state()
    loss_fn = build_loss("CEL")
    single = make_train_step(loss_fn)
    multi = make_multi_train_step(loss_fn)

    rng = np.random.default_rng(0)
    k, bs = 4, 2
    images = jnp.asarray(
        rng.integers(0, 256, (k, bs, PATCH, PATCH, 3), np.uint8))
    masks = jnp.asarray(rng.integers(0, 16, (k, bs, PATCH, PATCH), np.int32))
    ctx = jnp.zeros((k, 1), jnp.uint8)
    lr = jnp.float32(1e-2)
    key = jax.random.key(7)

    losses_a = []
    for i in range(k):
        state_a, loss = single(state_a, images[i], masks[i], ctx[i], lr, key)
        losses_a.append(float(loss))
    state_b, losses_b = multi(state_b, images, masks, ctx, lr, key)

    # scan bodies fuse slightly differently than standalone steps; allow
    # f32 reassociation noise, not semantic drift
    np.testing.assert_allclose(losses_a, np.asarray(losses_b), rtol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_trainer_steps_per_call(gid15_root, tmp_path):
    loader = ChunkLoader(str(gid15_root), chunk_size=4, patch_size=PATCH,
                         load_context=False, seed=0)
    val = ChunkLoader(str(gid15_root), chunk_size=4, patch_size=PATCH,
                      load_context=False, seed=1)
    model, spec, optimizer, state = _state()
    cfg = TrainConfig(epochs=1, batch_size=2,
                      checkpoint_directory=str(tmp_path), freq=5,
                      precision_evaluation_freq=5, num_classes=15,
                      steps_per_call=3)
    trainer = Trainer(model, spec, state, optimizer, build_loss("CEL"),
                      loader, val, cfg, log=lambda s: None)
    trainer.train()
    # 4 scenes x 12 tiles = 48 patches -> 24 micro-batches of 2; all seen
    assert len(trainer.training_loss_values) == 24
    assert all(np.isfinite(v) for v in trainer.training_loss_values)


def test_multi_step_with_grad_accum_equals_single_accum_steps():
    """steps_per_call x grad_accum compose: a K-step scan whose body
    itself scans accumulation micro-batches must match K sequential
    accumulated single steps."""
    model, spec, optimizer, state_a = _state()
    _, _, _, state_b = _state()
    loss_fn = build_loss("CEL")
    single = make_train_step(loss_fn, accum=2)
    multi = make_multi_train_step(loss_fn, accum=2)

    rng = np.random.default_rng(3)
    k, bs = 3, 4
    images = jnp.asarray(
        rng.integers(0, 256, (k, bs, PATCH, PATCH, 3), np.uint8))
    masks = jnp.asarray(rng.integers(0, 16, (k, bs, PATCH, PATCH), np.int32))
    ctx = jnp.zeros((k, 1), jnp.uint8)
    lr = jnp.float32(1e-2)
    key = jax.random.key(8)

    losses_a = []
    for i in range(k):
        state_a, loss = single(state_a, images[i], masks[i], ctx[i], lr, key)
        losses_a.append(float(loss))
    state_b, losses_b = multi(state_b, images, masks, ctx, lr, key)
    np.testing.assert_allclose(np.asarray(losses_b), np.asarray(losses_a),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(
                        (state_a.params, state_a.batch_stats)),
                    jax.tree_util.tree_leaves(
                        (state_b.params, state_b.batch_stats))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-5)
