"""End-to-end reference-checkpoint import: a torch.save pickle with the
reference's key naming (+ DataParallel 'module.' prefixes) must load
through `load_reference_checkpoint` and through the evaluate CLI's
`restore_variables` file path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cvcs_tpu.models import build_model  # noqa: E402
from cvcs_tpu.utils.torch_import import load_reference_checkpoint  # noqa: E402
from cvcs_tpu.utils.torch_ref import TorchUrnetv2  # noqa: E402
from tests.test_torch_import import _twin_to_reference_names  # noqa: E402


@pytest.fixture(scope="module")
def reference_ckpt(tmp_path_factory):
    torch.manual_seed(5)
    twin = TorchUrnetv2(16).eval()
    sd = _twin_to_reference_names(twin)
    # simulate a DataParallel-trained checkpoint (`nets.py:252-257`)
    sd = {f"module.{k}": v for k, v in sd.items()}
    path = tmp_path_factory.mktemp("ref") / "checkpoint50"
    torch.save({
        "epoch": 49,
        "model_state_dict": sd,
        "training_loss_values": [1.0],
        "validation_loss_values": [1.1],
        "macro_precision": [],
        "weighted_precision": [],
        "batch_size": 10,
        "optimizer": "SGD2",
    }, path)
    return path, twin


def test_load_reference_checkpoint_unetv2(reference_ckpt):
    path, twin = reference_ckpt
    variables = load_reference_checkpoint(str(path), "Unetv2")
    model, _ = build_model("Unetv2", 16, dtype=jnp.float32)
    x = np.random.default_rng(4).random((1, 32, 32, 3), np.float32)
    ours = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, train=False))(variables,
                                                     jnp.asarray(x)))
    with torch.no_grad():
        theirs = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-2)


def test_cli_restores_torch_file(reference_ckpt, gid15_root):
    """config load_checkpoint pointing at the torch pickle file."""
    from cvcs_tpu.cli import evaluate as eval_cli
    from tests.conftest import PATCH

    path, _ = reference_ckpt
    metrics = eval_cli.evaluate(dict(
        dataset=str(gid15_root), net="Unetv2", patch_size=PATCH,
        num_classes=15, precision="f32", load_checkpoint=str(path),
        images=[0]))
    assert 0.0 <= metrics["oa_score"] <= 1.0
