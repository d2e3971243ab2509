"""Fast-BN path: identical losses/gradients to the exact path; running
stats refreshed by the stats step / per-chunk hook."""

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.models import build_model
from cvcs_tpu.ops.losses import build_loss
from cvcs_tpu.train import (
    TrainConfig, Trainer, build_optimizer, create_train_state,
)
from cvcs_tpu.train.step import make_stats_step, make_train_step

PATCH = 32


def _setup(bs=2):
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((bs, PATCH, PATCH, 3), jnp.uint8))
    return model, spec, optimizer, state


def test_fast_path_identical_losses_and_params():
    _, _, _, state_a = _setup()
    _, _, _, state_b = _setup()
    loss_fn = build_loss("CEL")
    exact = make_train_step(loss_fn, update_stats=True)
    fast = make_train_step(loss_fn, update_stats=False)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (2, PATCH, PATCH, 3), np.uint8))
    msk = jnp.asarray(rng.integers(0, 16, (2, PATCH, PATCH), np.int32))
    ctx = jnp.zeros((), jnp.uint8)
    key = jax.random.key(0)
    state_a, loss_a = exact(state_a, img, msk, ctx, jnp.float32(1e-2), key)
    state_b, loss_b = fast(state_b, img, msk, ctx, jnp.float32(1e-2), key)
    assert float(loss_a) == float(loss_b)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # exact path moved batch_stats, fast path did not
    sa = jax.tree_util.tree_leaves(state_a.batch_stats)
    sb = jax.tree_util.tree_leaves(state_b.batch_stats)
    assert any(not np.allclose(x, y) for x, y in zip(sa, sb))


def test_remat_model_step_matches_plain():
    """A full train step on the block-remat model (the `remat: true`
    config path) must be a pure memory trade: loss, updated params, AND
    updated BN running stats equal to the plain model's step up to
    compiler reassociation. (A step-level jax.checkpoint variant was
    measured harmful on v5e and removed — see train/step.py.)"""
    _, _, _, state_a = _setup()
    model_r, _ = build_model("Unet", 16, dtype=jnp.float32, remat=True)
    optimizer = build_optimizer("SGD2")
    from cvcs_tpu.train import create_train_state
    state_b = create_train_state(
        model_r, optimizer, jnp.zeros((2, PATCH, PATCH, 3), jnp.uint8))
    loss_fn = build_loss("CEL")
    step = make_train_step(loss_fn)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.integers(0, 256, (2, PATCH, PATCH, 3), np.uint8))
    msk = jnp.asarray(rng.integers(0, 16, (2, PATCH, PATCH), np.int32))
    ctx = jnp.zeros((), jnp.uint8)
    key = jax.random.key(0)
    state_a, loss_a = step(state_a, img, msk, ctx, jnp.float32(1e-2), key)
    state_b, loss_b = step(state_b, img, msk, ctx, jnp.float32(1e-2), key)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(
                        (state_a.params, state_a.batch_stats)),
                    jax.tree_util.tree_leaves(
                        (state_b.params, state_b.batch_stats))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_stats_step_moves_running_stats():
    _, spec, _, state = _setup()
    stats = make_stats_step(spec.requires_context)
    img = jax.random.uniform(jax.random.key(1), (2, PATCH, PATCH, 3)) * 255
    new_state = stats(state, img.astype(jnp.uint8), jnp.zeros((), jnp.uint8))
    old = jax.tree_util.tree_leaves(state.batch_stats)
    new = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(not np.allclose(o, n) for o, n in zip(old, new))
    # params untouched
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_fast_bn_refreshes_per_chunk(gid15_root, tmp_path):
    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=PATCH,
                         load_context=False, seed=0)
    val = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=PATCH,
                      load_context=False, seed=1)
    model, spec, optimizer, state = _setup(bs=4)
    init_stats = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(state.batch_stats)]
    cfg = TrainConfig(epochs=1, batch_size=4,
                      checkpoint_directory=str(tmp_path), freq=5,
                      precision_evaluation_freq=5, num_classes=15,
                      bn_exact_stats=False)
    trainer = Trainer(model, spec, state, optimizer, build_loss("CEL"),
                      loader, val, cfg, log=lambda s: None)
    trainer.train()
    new_stats = jax.tree_util.tree_leaves(trainer.state.batch_stats)
    assert any(not np.allclose(a, b)
               for a, b in zip(init_stats, new_stats))
