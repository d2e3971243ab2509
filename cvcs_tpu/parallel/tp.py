"""Tensor parallelism: channel-sharded compute for the largest backbones.

SURVEY §2.7 item (c): optional TP over channels for the biggest models
(UNet's 1024-ch bottleneck, ResNet-101's 2048-ch stage 4, SegFormer-B3's
512-ch stage 4). Nothing in this workload *needs* TP — every model fits one
chip — so the design is a thin, genuinely-sharded layer rather than a full
Megatron clone:

* :func:`channel_shardings` / :func:`shard_params` place every large
  conv/dense kernel with its output-channel dim split over a mesh axis
  (per-device parameter memory drops by the axis size for those kernels);
* :func:`tensor_parallel` is a trace-time context: while active, models
  call :func:`constrain` on their bottleneck activations, which inserts
  ``jax.lax.with_sharding_constraint`` pinning the activation's channel
  dim to the same axis. That stops XLA's SPMD partitioner from
  all-gathering the kernels and computing replicated (round-1 failure
  mode): the convs feeding a constrained activation are partitioned
  channel-wise, and XLA inserts the all-gather/all-reduce collectives at
  the sharded/replicated boundaries over ICI.

Verification lives in ``tests/test_tp.py``: the compiled HLO must contain
cross-device collectives AND a per-partition bottleneck conv whose output
channel dim is ``C / n_devices`` — evidence of sharded *compute*, not just
sharded placement.
"""

from __future__ import annotations

import contextlib
import threading

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


def channel_shardings(params, mesh: Mesh, axis: str = "spatial",
                      min_channels: int = 512):
    """NamedSharding pytree: last-dim (output channels) sharded over
    ``axis`` for large kernels, everything else replicated."""
    n = mesh.shape[axis]

    def rule(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.shape[-1] >= min_channels
                and leaf.shape[-1] % n == 0):
            spec = [None] * (leaf.ndim - 1) + [axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_params(params, mesh: Mesh, axis: str = "spatial",
                 min_channels: int = 512):
    """device_put the params with :func:`channel_shardings`."""
    return jax.device_put(
        params, channel_shardings(params, mesh, axis, min_channels))


@contextlib.contextmanager
def tensor_parallel(mesh: Mesh, axis: str = "spatial",
                    min_channels: int = 512):
    """Enable TP activation constraints for model code traced inside.

    Use around the ``jit``/trace of a forward whose params were placed by
    :func:`shard_params` with the same mesh/axis::

        tp_params = shard_params(variables["params"], mesh, axis="model")
        with tensor_parallel(mesh, "model"):
            fn = jax.jit(fwd).lower(tp_params, batch_stats, x).compile()
    """
    prev = getattr(_state, "tp", None)
    _state.tp = (mesh, axis, min_channels)
    try:
        yield
    finally:
        _state.tp = prev


def constrain(x):
    """Pin ``x``'s channel (last) dim to the active TP axis; identity when
    no :func:`tensor_parallel` context is active or the dim doesn't divide.
    Models call this on their widest activations (UNet encode5, ResNet
    stage 4, SegFormer stage 4)."""
    tp = getattr(_state, "tp", None)
    if tp is None:
        return x
    mesh, axis, min_channels = tp
    n = mesh.shape[axis]
    if x.ndim < 2 or x.shape[-1] < min_channels or x.shape[-1] % n:
        return x
    spec = [None] * (x.ndim - 1) + [axis]
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
