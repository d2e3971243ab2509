"""Tail-batch parity (round-1 Weak #6): the reference's DataLoader trains
and validates on the final partial batch (`train.py:110` default
drop_last=False); our loops must too, at the tail's natural size, with
torch-identical mean-reduction semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvcs_tpu.data.loader import Batch, DeviceChunk
from cvcs_tpu.models import build_model
from cvcs_tpu.ops.losses import build_loss
from cvcs_tpu.train import (
    TrainConfig, Trainer, build_optimizer, create_train_state,
)
from cvcs_tpu.train.step import make_loss_step

PATCH = 32
N = 10        # 10 samples, bs 4 -> 2 full batches + a 2-sample tail
BS = 4


def _chunk(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (N, PATCH, PATCH, 3), np.uint8)
    msk = rng.integers(0, 16, (N, PATCH, PATCH)).astype(np.int32)
    return DeviceChunk(jnp.asarray(img), jnp.asarray(msk), None)


def test_batches_natural_tail():
    chunk = _chunk()
    got = list(chunk.batches(BS, drop_last=False, pad_tail=False))
    assert [int(b.image.shape[0]) for b in got] == [4, 4, 2]
    assert all(b.valid is None for b in got)
    np.testing.assert_array_equal(
        np.asarray(got[-1].image), np.asarray(chunk.images[8:]))


def test_validation_loss_covers_tail_and_matches_torch_reduction():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    chunk = _chunk(1)
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((1, PATCH, PATCH, 3), jnp.uint8))
    loss_step = make_loss_step(build_loss("CEL"))

    losses = []
    for batch in chunk.batches(BS, drop_last=False, pad_tail=False):
        losses.append(float(loss_step(state, batch.image, batch.mask,
                                      jnp.zeros((), jnp.uint8))))
    assert len(losses) == 3   # incl. the 2-sample tail

    # torch-identical tail semantics: CE mean over the 2 tail samples only
    tail_img = chunk.images[8:].astype(jnp.float32)
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        tail_img, train=False)
    t = F.cross_entropy(
        torch.tensor(np.asarray(logits)).permute(0, 3, 1, 2),
        torch.tensor(np.asarray(chunk.masks[8:])).long())
    assert losses[-1] == pytest.approx(float(t), rel=1e-5)


def test_trainer_consumes_tail(gid15_root, tmp_path, monkeypatch):
    """With a batch size that doesn't divide the chunk's patch count the
    trainer records ceil(n/bs) losses per chunk, not floor."""
    from cvcs_tpu.data.loader import ChunkLoader

    loader = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=PATCH,
                         load_context=False, seed=0)
    val = ChunkLoader(str(gid15_root), chunk_size=2, patch_size=PATCH,
                      load_context=False, seed=1)
    loader.specify([0, 1])
    val.specify([0, 1])
    n = loader.tpi * 2               # 24 patches per chunk
    bs = 7                           # 24 = 3*7 + 3-sample tail
    assert n % bs != 0

    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((bs, PATCH, PATCH, 3), jnp.uint8))
    cfg = TrainConfig(epochs=1, batch_size=bs,
                      checkpoint_directory=str(tmp_path), freq=5,
                      precision_evaluation_freq=5, num_classes=15)
    trainer = Trainer(model, spec, state, optimizer, build_loss("CEL"),
                      loader, val, cfg, log=lambda s: None)
    trainer.train()
    per_chunk = -(-n // bs)          # ceil
    assert len(trainer.training_loss_values) == per_chunk * len(loader)
    assert len(trainer.validation_loss_values) == per_chunk * len(val)
