"""Train state: params + BN statistics + optimizer state as one pytree.

The whole state is donated through the jitted train step (no host copies,
buffers reused in place — the TPU analogue of the reference's in-place
``opt.step()``). Params and optimizer state are f32; compute runs bf16 via
the model's dtype policy (:mod:`cvcs_tpu.core.precision`).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from cvcs_tpu.train.optim import OptimizerBundle


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                       # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: Any = struct.field(pytree_node=False)


def create_train_state(
    model,
    optimizer: OptimizerBundle,
    example_image: jnp.ndarray,
    example_context: jnp.ndarray | None = None,
    seed: int = 0,
) -> TrainState:
    """Initialize model variables (jitted — eager linen init compiles one
    program per parameter) and optimizer state."""

    def init_fn(key):
        return model.init(
            {"params": key, "dropout": jax.random.fold_in(key, 1)},
            example_image, context=example_context, train=False)

    variables = jax.jit(init_fn)(jax.random.key(seed))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        apply_fn=model.apply,
        tx=optimizer.tx,
    )


def param_count(params) -> int:
    """Total trainable parameters (the reference prints this at startup,
    `train.py:42`, `utils.py:204-205`)."""
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
