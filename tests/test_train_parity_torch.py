"""End-to-end cross-framework training-step parity: starting from identical
(imported) weights, one optimizer step on identical data must move our
parameters to where torch moves them (forward + CE loss + backward +
SGD(momentum, coupled weight decay) all agree)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cvcs_tpu.models import build_model  # noqa: E402
from cvcs_tpu.ops.losses import build_loss  # noqa: E402
from cvcs_tpu.train import build_optimizer, create_train_state  # noqa: E402
from cvcs_tpu.train.step import make_train_step  # noqa: E402
from cvcs_tpu.utils import torch_import  # noqa: E402
from cvcs_tpu.utils.torch_ref import TorchUrnetv2  # noqa: E402
from tests.test_torch_import import _twin_to_reference_names  # noqa: E402

PATCH = 32


@pytest.mark.slow
def test_two_epoch_recipe_matches_torch():
    """The canonical recipe (`configs/train/server.yaml` semantics) in
    miniature, run step-for-step in both frameworks: 2 epochs x 4 steps of
    wCEL (balanced class weights, background excluded/ignored) + SGD2 with
    per-epoch PolynomialLR + exact per-step BN running-stat updates, on
    identical synthetic data in identical order (`train.py:104-169`).
    Pins: every per-step loss, the final parameters, BN running stats,
    and the eval-mode confusion matrix on a held-out batch."""
    from cvcs_tpu.metrics.confusion import confusion_matrix, update_confusion
    from cvcs_tpu.train.optim import polynomial_lr

    torch.manual_seed(11)
    twin = TorchUrnetv2(16).train()
    variables = torch_import.import_unet(
        _twin_to_reference_names(twin), upsample="transpose")

    rng = np.random.default_rng(11)
    epochs, steps, bs = 2, 4, 4
    imgs = rng.integers(0, 256, (epochs * steps, bs, PATCH, PATCH, 3)
                        ).astype(np.uint8)
    msks = rng.integers(0, 16, (epochs * steps, bs, PATCH, PATCH)
                        ).astype(np.int64)
    held_img = rng.integers(0, 256, (bs, PATCH, PATCH, 3)).astype(np.uint8)
    held_msk = rng.integers(0, 16, (bs, PATCH, PATCH)).astype(np.int64)

    # balanced class weights from the train masks, background excluded
    # (weight 0) — `dataset.py:360-384`
    counts = np.bincount(msks.reshape(-1), minlength=16).astype(np.float64)
    w = counts.sum() / (15 * np.maximum(counts, 1))
    w[0] = 0.0
    w = w.astype(np.float32)

    lr0 = 6e-3

    # --- torch loop ------------------------------------------------------
    opt = torch.optim.SGD(twin.parameters(), lr=lr0, momentum=0.9,
                          weight_decay=1e-5)
    sched = torch.optim.lr_scheduler.PolynomialLR(opt, total_iters=20)
    crit = torch.nn.CrossEntropyLoss(weight=torch.tensor(w), ignore_index=0)
    t_losses = []
    for e in range(epochs):
        for s in range(steps):
            x = torch.tensor(
                imgs[e * steps + s].transpose(0, 3, 1, 2).astype(np.float32))
            y = torch.tensor(msks[e * steps + s])
            opt.zero_grad()
            loss = crit(twin(x), y)
            loss.backward()
            opt.step()
            t_losses.append(float(loss))
        sched.step()
    twin.eval()
    with torch.no_grad():
        t_pred = twin(torch.tensor(
            held_img.transpose(0, 3, 1, 2).astype(np.float32))
        ).argmax(dim=1).numpy()

    # --- our loop --------------------------------------------------------
    model, spec = build_model("Unetv2", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((bs, PATCH, PATCH, 3), jnp.uint8))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    step = make_train_step(
        build_loss("wCEL", weights=w, ignore_background=True),
        update_stats=True)
    lr_fn = polynomial_lr(lr0, total_iters=20)
    j_losses = []
    for e in range(epochs):
        lr = lr_fn(e)
        for s in range(steps):
            state, loss = step(
                state, jnp.asarray(imgs[e * steps + s]),
                jnp.asarray(msks[e * steps + s].astype(np.int32)),
                jnp.zeros((), jnp.uint8), jnp.float32(lr),
                jax.random.key(0))
            j_losses.append(float(loss))

    # per-step loss trajectory
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3)

    # final parameters and BN running stats via the importer mapping
    final = torch_import.import_unet(
        _twin_to_reference_names(twin), upsample="transpose")
    for ours, theirs, what in (
            (state.params, final["params"], "params"),
            (state.batch_stats, final["batch_stats"], "batch_stats")):
        a = jax.tree_util.tree_leaves(ours)
        b = jax.tree_util.tree_leaves(theirs)
        assert len(a) == len(b)
        # scale-aware per-leaf bound: f32 reduction-order drift compounds
        # through momentum and feeds back into the batch statistics; its
        # size tracks the ACTIVATION scale at each layer (BN running
        # means span +-90 at the stem but O(0.1) deep in the net), so
        # the bound is 1e-2 of each leaf's max magnitude with a 1.0
        # floor — measured worst drift is ~5x under it everywhere. Real
        # recipe bugs (wrong lr/wd/momentum/EMA factor) exceed it by
        # orders of magnitude; the per-step loss rtol above (2e-3) is
        # the tight trajectory pin.
        for x, y in zip(a, b):
            y = np.asarray(y)
            tol = 1e-2 * max(1.0, float(np.max(np.abs(y))))
            np.testing.assert_allclose(
                np.asarray(x), y, rtol=0, atol=tol,
                err_msg=f"{what} diverged after 8 steps")

    # eval-mode (running-stats) forward on the held-out batch: logits
    # must track the torch twin's tightly...
    with torch.no_grad():
        t_logits = twin(torch.tensor(
            held_img.transpose(0, 3, 1, 2).astype(np.float32))
        ).numpy().transpose(0, 2, 3, 1)
    j_logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(held_img, jnp.float32), train=False)
    # bound: the ~1e-3 param drift amplifies through the 23-conv net to
    # ~3e-2 of the logit scale after 8 divergent steps (measured); a
    # recipe bug (one wrong hyper-parameter) produces order-of-the-scale
    # differences
    scale = float(np.max(np.abs(t_logits)))
    np.testing.assert_allclose(np.asarray(j_logits), t_logits,
                               rtol=0, atol=5e-2 * scale)
    j_pred = np.asarray(jnp.argmax(j_logits, axis=-1))
    conf_t = np.asarray(update_confusion(
        confusion_matrix(16), jnp.asarray(t_pred),
        jnp.asarray(held_msk.astype(np.int32)), num_classes=16))
    conf_j = np.asarray(update_confusion(
        confusion_matrix(16), jnp.asarray(j_pred),
        jnp.asarray(held_msk.astype(np.int32)), num_classes=16))
    # ...while the hard-label confusion matrices agree up to argmax flips
    # on near-ties: 8 steps from random init on random labels leaves many
    # logit margins below the drift (measured 0.93% flips), so this is a
    # coarse sanity band — the logits check above is the tight pin
    disagree = np.abs(conf_t - conf_j).sum() / 2 / held_msk.size
    assert disagree < 3e-2, (
        f"{disagree:.2%} of held-out pixels classified differently")


@pytest.mark.slow
def test_one_sgd_step_matches_torch():
    torch.manual_seed(7)
    twin = TorchUrnetv2(16).train()
    variables = torch_import.import_unet(
        _twin_to_reference_names(twin), upsample="transpose")

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (2, PATCH, PATCH, 3)).astype(np.float32)
    msk = rng.integers(0, 16, (2, PATCH, PATCH))

    # --- torch step (SGD2 recipe: lr 6e-3, mom 0.9, wd 1e-5) -------------
    opt = torch.optim.SGD(twin.parameters(), lr=6e-3, momentum=0.9,
                          weight_decay=1e-5)
    crit = torch.nn.CrossEntropyLoss()
    out = twin(torch.tensor(img.transpose(0, 3, 1, 2)))
    t_loss = crit(out, torch.tensor(msk).long())
    opt.zero_grad()
    t_loss.backward()
    opt.step()

    # --- our step ----------------------------------------------------------
    model, spec = build_model("Unetv2", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((2, PATCH, PATCH, 3), jnp.uint8))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    step = make_train_step(build_loss("CEL"), update_stats=False)
    state, j_loss = step(state, jnp.asarray(img.astype(np.uint8)),
                         jnp.asarray(msk), jnp.zeros((), jnp.uint8),
                         jnp.float32(6e-3), jax.random.key(0))

    assert float(j_loss) == pytest.approx(float(t_loss), rel=1e-4)

    # compare every updated parameter through the importer mapping
    reimported = torch_import.import_unet(
        _twin_to_reference_names(twin), upsample="transpose")["params"]
    ours = jax.tree_util.tree_leaves(state.params)
    theirs = jax.tree_util.tree_leaves(reimported)
    assert len(ours) == len(theirs)
    worst = max(float(jnp.max(jnp.abs(a - jnp.asarray(b))))
                for a, b in zip(ours, theirs))
    assert worst < 5e-5, f"max param divergence after one step: {worst}"
