"""Tensor-parallel channel sharding: sharded params must produce the same
forward as replicated params on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.core.mesh import MeshConfig, create_mesh
from cvcs_tpu.models import build_model
from cvcs_tpu.parallel.tp import channel_shardings, shard_params


def test_tp_forward_matches_replicated():
    mesh = create_mesh(MeshConfig(data=1, spatial=8))
    model, _ = build_model("Unet", 16, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3)) * 255
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(1)}, x, train=False)

    def fwd(params, batch_stats, a):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, a, train=False)

    base = jax.jit(fwd)(variables["params"], variables["batch_stats"], x)
    tp_params = shard_params(variables["params"], mesh, min_channels=64)
    tp = jax.jit(fwd)(tp_params, variables["batch_stats"], x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(tp),
                               atol=1e-4, rtol=1e-4)
    # at least the 1024-wide bottleneck kernels must actually be sharded
    shardings = channel_shardings(variables["params"], mesh,
                                  min_channels=64)
    n_sharded = sum(
        0 if s.is_fully_replicated else 1
        for s in jax.tree_util.tree_leaves(shardings))
    assert n_sharded > 10
