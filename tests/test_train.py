"""Training subsystem tests: optimizer schedule parity vs torch, a 2-scene
end-to-end smoke train (the reference's `debug: True` path, SURVEY §4),
checkpoint/resume roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.models import build_model
from cvcs_tpu.ops.losses import build_loss
from cvcs_tpu.train import (
    TrainConfig, Trainer, build_optimizer, create_train_state,
)
from cvcs_tpu.train import checkpoint as ckpt_lib
from cvcs_tpu.train.state import param_count

PATCH = 32


class TestOptim:
    def test_polynomial_lr_matches_torch(self):
        torch = pytest.importorskip("torch")
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=0.006, momentum=0.9)
        sched = torch.optim.lr_scheduler.PolynomialLR(opt, total_iters=20)
        bundle = build_optimizer("SGD2")
        for epoch in range(25):
            assert bundle.lr_for_epoch(epoch) == pytest.approx(
                opt.param_groups[0]["lr"], abs=1e-12), f"epoch {epoch}"
            sched.step()

    def test_adam1_needs_epochs(self):
        with pytest.raises(ValueError):
            build_optimizer("ADAM1")
        b = build_optimizer("ADAM1", epochs=10)
        assert b.lr_for_epoch(0) == pytest.approx(5e-3)
        assert b.lr_for_epoch(10) == 0.0

    def test_sgd_step_matches_torch(self):
        """One net, same grads: our chain must reproduce torch SGD with
        momentum + coupled weight decay, step for step."""
        torch = pytest.importorskip("torch")
        w0 = np.array([1.0, -2.0, 3.0], np.float32)
        g = np.array([0.1, 0.2, -0.3], np.float32)

        p = torch.nn.Parameter(torch.tensor(w0))
        opt = torch.optim.SGD([p], lr=1e-3, momentum=0.9, weight_decay=1e-5)
        bundle = build_optimizer("SGD1")
        params = jnp.asarray(w0)
        opt_state = bundle.init(params)
        for _ in range(3):
            p.grad = torch.tensor(g)
            opt.step()
            updates, opt_state = bundle.tx.update(
                jnp.asarray(g), opt_state, params)
            params = params - 1e-3 * updates
        np.testing.assert_allclose(
            np.asarray(params), p.detach().numpy(), rtol=1e-6)


@pytest.fixture(scope="module")
def smoke_setup(tmp_path_factory):
    # reuse the session dataset fixture by rebuilding a tiny root here
    import tests.conftest as cf
    from PIL import Image
    from cvcs_tpu.data.palette import PALETTE

    root = tmp_path_factory.mktemp("gid15_train")
    for d in ("Image__8bit_NirRGB", "Annotation__index", "Annotation__color"):
        (root / d).mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        image, mask = cf._make_scene(rng, (64, 96))
        stem = f"s{i}"
        Image.fromarray(image).save(root / "Image__8bit_NirRGB" / f"{stem}.png")
        Image.fromarray(mask).save(
            root / "Annotation__index" / f"{stem}_15label.png")
        Image.fromarray(PALETTE[mask]).save(
            root / "Annotation__color" / f"{stem}_15label.tif")
    return root


def _build_trainer(root, ckpt_dir, epochs=2, eval_freq=2, **cfg_extra):
    loader = ChunkLoader(str(root), chunk_size=2, patch_size=PATCH,
                         load_context=False, seed=0)
    val_loader = ChunkLoader(str(root), chunk_size=2, patch_size=PATCH,
                             load_context=False, seed=1)
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    example = jnp.zeros((2, PATCH, PATCH, 3), jnp.uint8)
    state = create_train_state(model, optimizer, example)
    loss_fn = build_loss("CEL")
    kw = dict(
        epochs=epochs, batch_size=2, checkpoint_directory=str(ckpt_dir),
        freq=1, precision_evaluation_freq=eval_freq, num_classes=15)
    kw.update(cfg_extra)
    cfg = TrainConfig(**kw)
    return Trainer(model, spec, state, optimizer, loss_fn,
                   loader, val_loader, cfg, log=lambda s: None)


def test_eval_downscale(smoke_setup, tmp_path):
    # half-res periodic eval: same confusion *math* on 1/4 the pixels
    trainer = _build_trainer(smoke_setup, tmp_path)
    full = trainer.evaluate(16)
    half = trainer.evaluate(16, downscale=2)
    assert int(np.asarray(half.total).sum()) * 4 == int(
        np.asarray(full.total).sum())
    # class marginals stay in the same ballpark (sanity, not exactness)
    assert half.total.shape == full.total.shape


def test_end_to_end_smoke_train(smoke_setup, tmp_path):
    trainer = _build_trainer(smoke_setup, tmp_path, epochs=2)
    n_params = param_count(trainer.state.params)
    assert n_params > 1e6  # UNet is ~31M at full width
    trainer.train()
    assert len(trainer.training_loss_values) == 2 * 6  # 2 epochs x 12 patches / bs 2
    assert len(trainer.validation_loss_values) == 2 * 6
    # loss must decrease on average between epochs
    first = np.mean(trainer.training_loss_values[:6])
    last = np.mean(trainer.training_loss_values[-6:])
    assert last < first
    # eval ran at epoch 2
    assert trainer.last_metrics is not None
    assert 0.0 <= trainer.last_metrics["oa_score"] <= 1.0
    # checkpoints written every epoch
    assert (tmp_path / "checkpoint1").is_dir()
    assert (tmp_path / "checkpoint2").is_dir()


def test_divergence_detection(smoke_setup, tmp_path):
    """A non-finite training loss halts the run with a clear error
    instead of burning the rest of the schedule (SURVEY §5 failure
    detection); the deferred loss harvest still surfaces it."""
    trainer = _build_trainer(smoke_setup, tmp_path, epochs=1, eval_freq=5)
    trainer.state = trainer.state.replace(params=jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, jnp.nan), trainer.state.params))
    with pytest.raises(FloatingPointError, match="non-finite training loss"):
        trainer.train()


def test_preemption_save_and_resume(smoke_setup, tmp_path):
    """SIGTERM through the installed handler checkpoints at the next
    chunk boundary and returns cleanly; `resume` then replays the
    interrupted epoch from the preempted weights to completion."""
    import signal

    trainer = _build_trainer(smoke_setup, tmp_path, epochs=3, eval_freq=5)
    trainer.install_preemption_handler()
    signal.raise_signal(signal.SIGTERM)   # "eviction" before epoch 1
    trainer.train()
    # preempted during epoch 1 -> checkpoint0_preempt written (the tag
    # keeps mid-epoch saves from overwriting boundary checkpoints),
    # epochs 1-3 not run
    assert (tmp_path / "checkpoint0_preempt").is_dir()
    assert ckpt_lib.latest_checkpoint(tmp_path).name == "checkpoint0_preempt"
    n_losses = len(trainer.training_loss_values)
    assert 0 < n_losses < 3 * 6   # one chunk of epoch 1 only

    t2 = _build_trainer(smoke_setup, tmp_path, epochs=3, eval_freq=5)
    t2.resume(tmp_path / "checkpoint0_preempt")
    assert t2.last_epoch == 0     # the interrupted epoch replays
    t2.train()
    # resumed run completes the full schedule on top of the saved history
    assert len(t2.training_loss_values) == n_losses + 3 * 6
    assert (tmp_path / "checkpoint3").is_dir()


def test_preemption_during_validation_exits_on_boundary(smoke_setup,
                                                        tmp_path):
    """A signal landing in end-of-epoch validation stops after that
    epoch's boundary work instead of training a full chunk of the next
    epoch first (the eviction grace window is short)."""
    trainer = _build_trainer(smoke_setup, tmp_path, epochs=3, eval_freq=5)
    orig = trainer.validation_loss

    def preempting_validation():
        trainer._preempted = True   # "SIGTERM mid-validation"
        return orig()

    trainer.validation_loss = preempting_validation
    trainer.train()
    # exactly one epoch ran; the exit checkpoint is the normal boundary
    # one (the epoch was complete, so no _preempt tag)
    assert len(trainer.training_loss_values) == 6
    assert ckpt_lib.latest_checkpoint(tmp_path).name == "checkpoint1"
    assert not (tmp_path / "checkpoint0_preempt").exists()


def test_preemption_boundary_save_carries_confusion(smoke_setup, tmp_path):
    """When the preempt-after-validation exit writes its own boundary
    checkpoint (freq didn't trigger one), it must carry the confusion
    histories a just-run precision eval produced — resume picks THIS
    checkpoint, and checkpoint.py's contract is to preserve them."""
    import json

    trainer = _build_trainer(smoke_setup, tmp_path, epochs=3, eval_freq=1,
                             freq=5)
    orig = trainer.evaluate

    def preempting_evaluate(*a, **k):
        out = orig(*a, **k)
        trainer._preempted = True   # "SIGTERM mid-eval"
        return out

    trainer.evaluate = preempting_evaluate
    trainer.train()
    meta = json.loads((tmp_path / "checkpoint1" / "meta.json").read_text())
    assert len(meta["conf_flat"]) == 1
    assert len(meta["conf_flat"][0]) == 16
    assert len(meta["conf_normalized"]) == 1


def test_trainer_rejects_indivisible_grad_accum(smoke_setup, tmp_path):
    """Direct Trainer construction (not just the CLI) validates
    batch_size % grad_accum — otherwise accumulation silently disables
    (every full batch routes to plain_step) or the stacked multi-step
    raises at trace time."""
    with pytest.raises(ValueError, match="divisible by"):
        _build_trainer(smoke_setup, tmp_path, epochs=1, eval_freq=5,
                       batch_size=3, grad_accum=2)


def test_keep_checkpoints_retention(smoke_setup, tmp_path):
    """keep_checkpoints=2: only the newest two complete checkpoints
    survive a 3-epoch run; a stale _preempt checkpoint counts in the
    ranking and is pruned like any other; an unfinished directory (an
    in-flight async save) is never touched."""
    # stale artifacts an earlier preempted run might have left behind
    (tmp_path / "checkpoint1_preempt" / "state").mkdir(parents=True)
    (tmp_path / "inflight").mkdir()          # not checkpoint-named
    (tmp_path / "checkpoint9").mkdir()       # torn: no state/ yet
    trainer = _build_trainer(smoke_setup, tmp_path, epochs=3, eval_freq=5,
                             keep_checkpoints=2)
    trainer.train()
    names = sorted(d.name for d in tmp_path.iterdir() if d.is_dir())
    assert names == ["checkpoint2", "checkpoint3", "checkpoint9",
                     "inflight"]


def test_latest_checkpoint_prefers_preempt_of_same_epoch(tmp_path):
    """checkpoint{N}_preempt (mid-epoch N) outranks checkpoint{N} (the
    epoch N-1 boundary) but not checkpoint{N+1}."""
    for name in ("checkpoint1", "checkpoint2", "checkpoint2_preempt"):
        (tmp_path / name / "state").mkdir(parents=True)
    assert ckpt_lib.latest_checkpoint(tmp_path).name == "checkpoint2_preempt"
    (tmp_path / "checkpoint3" / "state").mkdir(parents=True)
    assert ckpt_lib.latest_checkpoint(tmp_path).name == "checkpoint3"


def test_checkpoint_resume_roundtrip(smoke_setup, tmp_path):
    t1 = _build_trainer(smoke_setup, tmp_path / "a", epochs=1, eval_freq=5)
    (tmp_path / "a").mkdir(exist_ok=True)
    t1.train()
    ckpt = ckpt_lib.latest_checkpoint(tmp_path / "a")
    assert ckpt is not None and ckpt.name == "checkpoint1"

    t2 = _build_trainer(smoke_setup, tmp_path / "a", epochs=2, eval_freq=5)
    t2.resume(ckpt)
    assert t2.last_epoch == 1
    assert t2.training_loss_values == t1.training_loss_values
    # restored params identical
    a = jax.tree_util.tree_leaves(t1.state.params)
    b = jax.tree_util.tree_leaves(t2.state.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    t2.train()  # continues to epoch 2 without error
    assert ckpt_lib.latest_checkpoint(tmp_path / "a").name == "checkpoint2"
