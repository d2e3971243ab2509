"""4-band (NirRGB) multispectral path: loader + model + train step
(BASELINE config 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.data.palette import PALETTE
from cvcs_tpu.models import build_model
from cvcs_tpu.ops.losses import build_loss
from cvcs_tpu.train import build_optimizer, create_train_state
from cvcs_tpu.train.step import make_train_step

PATCH = 32


@pytest.fixture(scope="module")
def gid4band_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gid4")
    for d in ("Image__8bit_NirRGB", "Annotation__index", "Annotation__color"):
        (root / d).mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        img = rng.integers(0, 256, (64, 64, 4), np.uint8)  # RGBA = 4 bands
        mask = rng.integers(0, 16, (64, 64), dtype=np.uint8)
        Image.fromarray(img, mode="RGBA").save(
            root / "Image__8bit_NirRGB" / f"s{i}.png")
        Image.fromarray(mask).save(
            root / "Annotation__index" / f"s{i}_15label.png")
        Image.fromarray(PALETTE[mask]).save(
            root / "Annotation__color" / f"s{i}_15label.tif")
    return root


def test_4band_loader_and_train_step(gid4band_root):
    loader = ChunkLoader(str(gid4band_root), chunk_size=2, patch_size=PATCH,
                         load_context=False, in_channels=4, seed=0)
    chunk = loader.get_chunk(0)
    assert chunk.images.shape[-1] == 4

    model, spec = build_model("SwinUnetTiny", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD1")
    state = create_train_state(
        model, optimizer, jnp.zeros((2, PATCH, PATCH, 4), jnp.uint8))
    step = make_train_step(build_loss("CEL"))
    batch = next(chunk.batches(2))
    state, loss = step(state, batch.image, batch.mask,
                       jnp.zeros((), jnp.uint8), jnp.float32(1e-3),
                       jax.random.key(0))
    assert np.isfinite(float(loss))


def test_4band_unet_too(gid4band_root):
    model, _ = build_model("Unet", 16, dtype=jnp.float32)
    x = jnp.zeros((1, PATCH, PATCH, 4), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, PATCH, PATCH, 16)


def test_eval_predict_restore_4band(gid4band_root, tmp_path):
    """A checkpoint trained with in_channels=4 restores through the
    evaluate/predict plumbing when the config carries `in_channels`
    (ADVICE r1: EVAL/INFER_KEYS rejected the key and init hardcoded 3)."""
    from cvcs_tpu.cli import common
    from cvcs_tpu.config.loader import EVAL_KEYS, INFER_KEYS
    from cvcs_tpu.train import checkpoint as ckpt_lib

    assert "in_channels" in EVAL_KEYS and "in_channels" in INFER_KEYS

    model, _ = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD1")
    state = create_train_state(
        model, optimizer, jnp.zeros((1, PATCH, PATCH, 4), jnp.uint8))
    ckpt_lib.save_checkpoint(tmp_path, 0, state, [], [], 4, "SGD1")

    cfg = dict(net="Unet", num_classes=15, in_channels=4,
               load_checkpoint=str(tmp_path / "checkpoint1"),
               precision="f32")
    # with the round-1 hardcoded in_channels=3 this raised a shape
    # mismatch in jnp_leaf_cast; success means the 4-band template matched
    variables = common.restore_variables(cfg, model, PATCH)
    kernels = [l for l in jax.tree_util.tree_leaves(variables["params"])
               if getattr(l, "ndim", 0) == 4]
    assert any(k.shape[2] == 4 for k in kernels)  # a conv consumes 4 bands


def test_evaluate_cli_4band_end_to_end(gid4band_root, tmp_path):
    """The evaluate CLI must thread `in_channels` into its ChunkLoader —
    it restored a 4-channel first conv but fed 3-band patches (round-3
    review finding: shape-mismatch crash on any multispectral eval)."""
    from cvcs_tpu.cli import evaluate as eval_cli
    from cvcs_tpu.train import checkpoint as ckpt_lib

    model, _ = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD1")
    state = create_train_state(
        model, optimizer, jnp.zeros((1, PATCH, PATCH, 4), jnp.uint8))
    ckpt_lib.save_checkpoint(tmp_path, 0, state, [], [], 4, "SGD1")
    cfg = dict(dataset=str(gid4band_root), net="Unet",
               patch_size=PATCH, num_classes=15, in_channels=4,
               precision="f32",
               load_checkpoint=str(tmp_path / "checkpoint1"))
    metrics = eval_cli.evaluate(cfg)
    assert np.isfinite(metrics["oa_score"])
