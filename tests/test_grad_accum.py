"""Gradient accumulation (`grad_accum`): one optimizer update per batch
from the mean of sequential micro-batch gradients (torch `loss/N;
backward()` loop semantics — BN normalizes and EMA-updates per
micro-batch, in order)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.models import build_model
from cvcs_tpu.ops.losses import build_loss
from cvcs_tpu.train import build_optimizer, create_train_state
from cvcs_tpu.train.step import make_train_step

PATCH = 32


def _setup(bs):
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((bs, PATCH, PATCH, 3), jnp.uint8))
    return state


def _batch(rng, bs):
    img = jnp.asarray(rng.integers(0, 256, (bs, PATCH, PATCH, 3), np.uint8))
    msk = jnp.asarray(rng.integers(0, 16, (bs, PATCH, PATCH), np.int32))
    return img, msk


def test_accum_equals_plain_on_duplicated_batch():
    """With the batch = two copies of the same micro-batch, each micro's
    BN batch statistics equal the full batch's and each micro gradient
    equals the full-batch gradient — so accum=2 must produce the same
    loss and updated params as the plain step (running stats legitimately
    differ: the EMA is applied once per micro-batch)."""
    rng = np.random.default_rng(0)
    img2, msk2 = _batch(rng, 2)
    img4 = jnp.concatenate([img2, img2])
    msk4 = jnp.concatenate([msk2, msk2])
    loss_fn = build_loss("CEL")
    ctx = jnp.zeros((), jnp.uint8)
    key = jax.random.key(0)

    state_p = _setup(4)
    state_a = _setup(4)
    plain = make_train_step(loss_fn)
    accum = make_train_step(loss_fn, accum=2)
    state_p, loss_p = plain(state_p, img4, msk4, ctx, jnp.float32(1e-2), key)
    state_a, loss_a = accum(state_a, img4, msk4, ctx, jnp.float32(1e-2), key)
    np.testing.assert_allclose(float(loss_p), float(loss_a), rtol=1e-5)
    # reductions run over 4 samples on one side and 2 on the other, and
    # the 5-level BN stack amplifies fp32 reassociation noise through
    # rsqrt(var) — observed max 1.6e-4 on ~20/4.7M gradient elements.
    # The tight contract check is the manual-loop golden test below.
    for a, b in zip(jax.tree_util.tree_leaves(state_p.params),
                    jax.tree_util.tree_leaves(state_a.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-4)
    # the EMA ran twice on identical batch stats — stats moved further
    sp = jax.tree_util.tree_leaves(state_p.batch_stats)
    sa = jax.tree_util.tree_leaves(state_a.batch_stats)
    assert any(not np.allclose(x, y) for x, y in zip(sp, sa))


def test_accum_matches_manual_microbatch_loop():
    """Golden check against a hand-written accumulation loop on distinct
    micro-batches: grads averaged, BN stats threaded micro-to-micro, one
    tx.update — the exact contract the step builder documents."""
    rng = np.random.default_rng(1)
    img, msk = _batch(rng, 4)
    loss_fn = build_loss("CEL")
    ctx = jnp.zeros((), jnp.uint8)
    key = jax.random.key(7)
    lr = jnp.float32(1e-2)

    state = _setup(4)
    accum_step = make_train_step(loss_fn, accum=2)
    got, got_loss = accum_step(state, img, msk, ctx, lr, key)

    # manual reference
    state = _setup(4)
    base_key = jax.random.fold_in(key, state.step)
    stats = state.batch_stats
    gsum = None
    lsum = 0.0
    for i in range(2):
        xi = img[2 * i:2 * i + 2].astype(jnp.float32)
        mi = msk[2 * i:2 * i + 2]

        def compute_loss(p, stats=stats, xi=xi, mi=mi, i=i):
            variables = {"params": p, "batch_stats": stats}
            logits, mutated = state.apply_fn(
                variables, xi, context=None, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(base_key, i)})
            return loss_fn(logits, mi), mutated

        (loss_i, mutated), grads_i = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        stats = mutated["batch_stats"]
        lsum = lsum + loss_i
        gsum = (grads_i if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, grads_i))
    grads = jax.tree_util.tree_map(lambda g: g / 2, gsum)
    updates, _ = state.tx.update(grads, state.opt_state, state.params)
    want_params = jax.tree_util.tree_map(
        lambda p, u: p - lr * u, state.params, updates)

    np.testing.assert_allclose(float(got_loss), float(lsum) / 2, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got.params),
                    jax.tree_util.tree_leaves(want_params)):
        # jit-scan vs eager-loop reassociation: observed 1.2e-5 max
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got.batch_stats),
                    jax.tree_util.tree_leaves(stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_trainer_routes_tail_to_plain_step(gid15_root, tmp_path):
    """grad_accum=16 on bs-16 batches: full batches run the accumulated
    step (micro-batch 1); the 8-sample tail is indivisible and must fall
    back to the plain step instead of crashing — one optimizer update
    per batch either way."""
    from cvcs_tpu.data.loader import ChunkLoader
    from cvcs_tpu.train import TrainConfig, Trainer

    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=PATCH,
                         load_context=False, seed=0)
    val = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=PATCH,
                      load_context=False, seed=1)
    loader.specify([0, 1])
    val.specify([0, 1])
    n = loader.tpi * 2               # 24 patches per chunk
    bs = 16                          # 16-batch + 8-sample tail
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((bs, PATCH, PATCH, 3), jnp.uint8))
    cfg = TrainConfig(epochs=1, batch_size=bs, grad_accum=16,
                      checkpoint_directory=str(tmp_path), freq=5,
                      precision_evaluation_freq=5, num_classes=15)
    trainer = Trainer(model, spec, state, optimizer, build_loss("CEL"),
                      loader, val, cfg, log=lambda s: None)
    trainer.train()
    per_chunk = -(-n // bs)          # ceil: tail trains too
    assert len(trainer.training_loss_values) == per_chunk * len(loader)
    assert np.isfinite(trainer.training_loss_values).all()


def test_accum_rejects_indivisible_batch():
    loss_fn = build_loss("CEL")
    state = _setup(3)
    step = make_train_step(loss_fn, accum=2)
    rng = np.random.default_rng(2)
    img, msk = _batch(rng, 3)
    try:
        step(state, img, msk, jnp.zeros((), jnp.uint8),
             jnp.float32(1e-2), jax.random.key(0))
    except ValueError as e:
        assert "grad_accum" in str(e)
    else:
        raise AssertionError("indivisible batch must raise")


def test_resume_batch_override_disables_accum(gid15_root, tmp_path):
    """Quirk-5 resume overrides batch_size from the checkpoint; when the
    override breaks grad_accum divisibility, accumulation must be
    disabled coherently (the stacked multi-step scan has no per-batch
    fallback and would crash at trace time) and training must proceed."""
    from cvcs_tpu.data.loader import ChunkLoader
    from cvcs_tpu.train import TrainConfig, Trainer
    from cvcs_tpu.train import checkpoint as ckpt_lib

    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=PATCH,
                         load_context=False, seed=0)
    val = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=PATCH,
                      load_context=False, seed=1)
    loader.specify([0, 1])
    val.specify([0, 1])
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((4, PATCH, PATCH, 3), jnp.uint8))
    # checkpoint carries batch_size=5, indivisible by grad_accum=2
    ckpt_lib.save_checkpoint(str(tmp_path), -1, state, [], [], 5, "SGD2")
    cfg = TrainConfig(epochs=1, batch_size=4, grad_accum=2,
                      steps_per_call=2,
                      checkpoint_directory=str(tmp_path), freq=5,
                      precision_evaluation_freq=5, num_classes=15)
    logs = []
    trainer = Trainer(model, spec, state, optimizer, build_loss("CEL"),
                      loader, val, cfg, log=logs.append)
    trainer.resume(str(tmp_path / "checkpoint0"))
    assert trainer.config.batch_size == 5
    assert trainer.config.grad_accum == 1
    assert any("DISABLING" in s for s in logs)
    trainer.train()   # crashes at trace time without the rebuild
    assert np.isfinite(trainer.training_loss_values).all()
