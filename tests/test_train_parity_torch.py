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
