"""Data-parallel training over the 8-virtual-device CPU mesh: the Trainer's
mesh path must produce finite losses and keep params replicated (SURVEY
§2.7 DP story; the fake-backend analogue of a v5e-8 slice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_spatial_partitioned_training(gid15_root, tmp_path):
    """A combined (data=2, spatial=4) mesh: the Trainer shards patch rows
    over `spatial` (GSPMD spatial partitioning — XLA halo-exchanges the
    convolutions), so big-patch training scales past one chip's HBM. The
    run must train to finite decreasing losses with replicated params."""
    mesh = create_mesh(MeshConfig(data=2, spatial=4))
    loader = ChunkLoader(str(gid15_root), chunk_size=4, patch_size=PATCH,
                         load_context=False, seed=0)
    val = ChunkLoader(str(gid15_root), chunk_size=4, patch_size=PATCH,
                      load_context=False, seed=1)
    model, spec = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((8, PATCH, PATCH, 3), jnp.uint8))
    state = replicate(state, mesh)
    cfg = TrainConfig(epochs=2, batch_size=8,
                      checkpoint_directory=str(tmp_path), freq=5,
                      precision_evaluation_freq=5, num_classes=15)
    trainer = Trainer(model, spec, state, optimizer, build_loss("CEL"),
                      loader, val, cfg, mesh=mesh, log=lambda s: None)
    trainer.train()
    vals = trainer.training_loss_values
    assert vals and all(np.isfinite(v) for v in vals)
    assert np.mean(vals[-3:]) < np.mean(vals[:3])
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_spatial_partitioned_step_equals_single_device():
    """One spatially-partitioned train step lands within float tolerance
    of the single-device step. Sharding rows never splits a conv-window
    reduction (each output pixel's window sum stays on one device); only
    the f32 BN batch-stat reductions gain a psum, so the tolerance is
    reassociation-level, like the DP test above."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvcs_tpu.core.mesh import DATA_AXIS, SPATIAL_AXIS
    from cvcs_tpu.train.step import make_train_step

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (4, PATCH, PATCH, 3), np.uint8)
    msk = rng.integers(0, 16, (4, PATCH, PATCH)).astype(np.int32)

    model, _ = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")

    def run(mesh):
        state = create_train_state(
            model, optimizer, jnp.zeros((4, PATCH, PATCH, 3), jnp.uint8))
        step = make_train_step(build_loss("CEL"))
        if mesh is None:
            x, m = jnp.asarray(img), jnp.asarray(msk)
        else:
            state = replicate(state, mesh)
            x = jax.device_put(img, NamedSharding(
                mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None)))
            m = jax.device_put(msk, NamedSharding(
                mesh, P(DATA_AXIS, SPATIAL_AXIS)))
        state, loss = step(state, x, m, jnp.zeros((), jnp.uint8),
                           jnp.float32(6e-3), jax.random.key(0))
        return state, float(loss)

    s1, l1 = run(None)
    s8, l8 = run(create_mesh(MeshConfig(data=2, spatial=4)))
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_dp_step_equals_single_device_step():
    """The sharded analogue of tests/test_inference.py's bit-exactness
    check, for training: one train step with the batch sharded over 8
    devices must move the params exactly where the single-device step
    moves them (the gradient psum is a mean over the same samples)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvcs_tpu.core.mesh import DATA_AXIS
    from cvcs_tpu.train.step import make_train_step

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, PATCH, PATCH, 3), np.uint8)
    msk = rng.integers(0, 16, (16, PATCH, PATCH)).astype(np.int32)

    model, _ = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")

    def run(mesh):
        state = create_train_state(
            model, optimizer, jnp.zeros((16, PATCH, PATCH, 3), jnp.uint8))
        step = make_train_step(build_loss("CEL"))
        if mesh is None:
            x, m = jnp.asarray(img), jnp.asarray(msk)
        else:
            state = replicate(state, mesh)
            x = jax.device_put(img, NamedSharding(
                mesh, P(DATA_AXIS, None, None, None)))
            m = jax.device_put(msk, NamedSharding(mesh, P(DATA_AXIS)))
        state, loss = step(state, x, m, jnp.zeros((), jnp.uint8),
                           jnp.float32(6e-3), jax.random.key(0))
        return state, float(loss)

    s1, l1 = run(None)
    s8, l8 = run(create_mesh(MeshConfig(data=8, spatial=1)))
    # f32 tolerance: the 8-way psum reorders the gradient summation
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_dp_accum_step_equals_single_device_accum_step():
    """grad_accum composes with DP: the (B,) -> (accum, B/accum) reshape
    runs under GSPMD with the batch sharded over 8 devices, so each
    micro-batch is the same global sample slice (and BN's batch-mean is
    the same global mean) as on one device — losses and updated params
    must agree to f32-reassociation tolerance."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvcs_tpu.core.mesh import DATA_AXIS
    from cvcs_tpu.train.step import make_train_step

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (16, PATCH, PATCH, 3), np.uint8)
    msk = rng.integers(0, 16, (16, PATCH, PATCH)).astype(np.int32)

    model, _ = build_model("Unet", 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")

    def run(mesh):
        state = create_train_state(
            model, optimizer, jnp.zeros((16, PATCH, PATCH, 3), jnp.uint8))
        step = make_train_step(build_loss("CEL"), accum=2)
        if mesh is None:
            x, m = jnp.asarray(img), jnp.asarray(msk)
        else:
            state = replicate(state, mesh)
            x = jax.device_put(img, NamedSharding(
                mesh, P(DATA_AXIS, None, None, None)))
            m = jax.device_put(msk, NamedSharding(mesh, P(DATA_AXIS)))
        state, loss = step(state, x, m, jnp.zeros((), jnp.uint8),
                           jnp.float32(6e-3), jax.random.key(0))
        return state, float(loss)

    s1, l1 = run(None)
    s8, l8 = run(create_mesh(MeshConfig(data=8, spatial=1)))
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(
                        (s1.params, s1.batch_stats)),
                    jax.tree_util.tree_leaves(
                        (s8.params, s8.batch_stats))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def _step_pair(name, mesh_cfg, batch=8, seed=9):
    """One train step on `name` under `mesh_cfg`, and the same step on a
    single device — returns ((state, loss) sharded, (state, loss) single)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvcs_tpu.core.mesh import DATA_AXIS, SPATIAL_AXIS
    from cvcs_tpu.train.step import make_train_step

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (batch, PATCH, PATCH, 3), np.uint8)
    msk = rng.integers(0, 16, (batch, PATCH, PATCH)).astype(np.int32)
    model, _ = build_model(name, 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")

    def run(mesh):
        state = create_train_state(
            model, optimizer, jnp.zeros((batch, PATCH, PATCH, 3),
                                        jnp.uint8))
        step = make_train_step(build_loss("CEL"))
        if mesh is None:
            x, m = jnp.asarray(img), jnp.asarray(msk)
        else:
            n_sp = dict(mesh.shape).get(SPATIAL_AXIS, 1)
            state = replicate(state, mesh)
            sp = SPATIAL_AXIS if n_sp > 1 else None
            x = jax.device_put(img, NamedSharding(
                mesh, P(DATA_AXIS, sp, None, None)))
            m = jax.device_put(msk, NamedSharding(mesh, P(DATA_AXIS, sp)))
        state, loss = step(state, x, m, jnp.zeros((), jnp.uint8),
                           jnp.float32(6e-3), jax.random.key(0))
        return state, float(loss)

    single = run(None)
    data, spatial = mesh_cfg
    sharded = run(create_mesh(MeshConfig(data=data, spatial=spatial)))
    return sharded, single


@pytest.mark.parametrize("name", ["SwinUnetTiny", "SegformerB0"])
@pytest.mark.parametrize("mesh_cfg", [(8, 1), (2, 4)],
                         ids=["dp8", "dp2xsp4"])
def test_attention_model_mesh_step_equals_single_device(name, mesh_cfg):
    """Round-4 verdict Weak #3: every mesh-training correctness pin used
    UNet. Attention models hit the op patterns GSPMD row-sharding can
    partition pathologically — Swin's jnp.roll + window-partition
    reshapes (`models/swin.py`), SegFormer's sr-conv attention — so pin
    DP and (data x spatial) step equality for both families. f32 models;
    tolerance is psum/reassociation-level like the UNet pins above."""
    (s8, l8), (s1, l1) = _step_pair(name, mesh_cfg)
    np.testing.assert_allclose(l8, l1, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(
                        (s1.params, s1.batch_stats)),
                    jax.tree_util.tree_leaves(
                        (s8.params, s8.batch_stats))):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=2e-4)


def test_sync_bn_unbiased_correction_counts_all_devices():
    """TorchBatchNorm with axis_name (sync-BN): batch stats psum over the
    named axis, so the unbiased-EMA correction must use the GLOBAL sample
    count (n_local * axis_size) — the local-n correction silently skewed
    running_var (round-3 review finding; dormant until a model opts into
    sync-BN)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from cvcs_tpu.core.mesh import DATA_AXIS
    from cvcs_tpu.models.blocks import TorchBatchNorm

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))

    def init_and_stats(bn, xs, **apply_kw):
        v = bn.init(jax.random.key(0), xs, use_running_average=False)
        _, mut = bn.apply(v, xs, use_running_average=False,
                          mutable=["batch_stats"], **apply_kw)
        return mut["batch_stats"]["var"]

    single = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
    want_var = init_and_stats(single, x)

    mesh = create_mesh(MeshConfig(data=8, spatial=1))
    sync = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                          axis_name=DATA_AXIS)
    v = sync.init(jax.random.key(0), x[:2], use_running_average=False)

    def body(variables, xs):
        _, mut = sync.apply(variables, xs, use_running_average=False,
                            mutable=["batch_stats"])
        return mut["batch_stats"]["var"]

    got_var = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=P(), check_rep=False))(v, x)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(want_var),
                               rtol=1e-5)
