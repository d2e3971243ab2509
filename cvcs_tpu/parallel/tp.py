"""Tensor parallelism: channel-sharding rules for the largest backbones.

SURVEY §2.7 item (c): optional TP over channels for the biggest models
(UNet's 1024-ch bottleneck, ResNet-101's 2048-ch stage 4, SegFormer-B3's
512-ch stage). Nothing in this workload *needs* TP — the models fit one
chip comfortably — so this is deliberately lightweight: a pytree of
`NamedSharding`s that puts every conv/dense parameter whose output-channel
dimension is at least ``min_channels`` onto the given mesh axis, leaving
the rest replicated. Under jit, XLA's SPMD partitioner propagates the
channel sharding through the convs and inserts the (all-gather /
reduce-scatter) collectives over ICI; activations stay unsharded at the
layer boundaries so no manual collectives are required.

Usage::

    shardings = channel_shardings(state.params, mesh, axis="spatial")
    state = state.replace(params=jax.device_put(state.params, shardings))
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
