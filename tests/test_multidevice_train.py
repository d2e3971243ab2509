"""Data-parallel training over the 8-virtual-device CPU mesh: the Trainer's
mesh path must produce finite losses and keep params replicated (SURVEY
§2.7 DP story; the fake-backend analogue of a v5e-8 slice)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.core.mesh import MeshConfig, create_mesh, replicate
from cvcs_tpu.data.loader import ChunkLoader
from cvcs_tpu.models import build_model
from cvcs_tpu.ops.losses import build_loss
from cvcs_tpu.train import (
    TrainConfig, Trainer, build_optimizer, create_train_state,
)

PATCH = 32


def test_dp_training_over_8_devices(gid15_root, tmp_path):
    assert len(jax.devices()) == 8
    mesh = create_mesh(MeshConfig(data=8, spatial=1))
    loader = ChunkLoader(str(gid15_root), chunk_size=4, patch_size=PATCH,
                         load_context=False, seed=0)
    val = ChunkLoader(str(gid15_root), chunk_size=4, patch_size=PATCH,
                      load_context=False, seed=1)
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((8, PATCH, PATCH, 3), jnp.uint8))
    state = replicate(state, mesh)
    cfg = TrainConfig(epochs=1, batch_size=8,
                      checkpoint_directory=str(tmp_path), freq=5,
                      precision_evaluation_freq=5, num_classes=15)
    trainer = Trainer(model, spec, state, optimizer, build_loss("CEL"),
                      loader, val, cfg, mesh=mesh, log=lambda s: None)
    trainer.train()
    assert trainer.training_loss_values
    assert all(np.isfinite(v) for v in trainer.training_loss_values)
    # params stay fully replicated after sharded steps
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_training_with_multistep(gid15_root, tmp_path):
    """steps_per_call > 1 under a data mesh: batch axis (1) sharded, scan
    axis (0) replicated."""
    mesh = create_mesh(MeshConfig(data=8, spatial=1))
    loader = ChunkLoader(str(gid15_root), chunk_size=4, patch_size=PATCH,
                         load_context=False, seed=0)
    val = ChunkLoader(str(gid15_root), chunk_size=4, patch_size=PATCH,
                      load_context=False, seed=1)
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((8, PATCH, PATCH, 3), jnp.uint8))
    state = replicate(state, mesh)
    cfg = TrainConfig(epochs=1, batch_size=8,
                      checkpoint_directory=str(tmp_path), freq=5,
                      precision_evaluation_freq=5, num_classes=15,
                      steps_per_call=3)
    trainer = Trainer(model, spec, state, optimizer, build_loss("CEL"),
                      loader, val, cfg, mesh=mesh, log=lambda s: None)
    trainer.train()
    # 48 patches -> 6 micro-batches of 8: one stack of 3 + 3 singles
    assert len(trainer.training_loss_values) == 6
    assert all(np.isfinite(v) for v in trainer.training_loss_values)
