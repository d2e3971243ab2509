"""Device mesh and sharding helpers.

The reference framework is single-device (reference `utils.py:273-280` picks a
hardcoded ``cuda:0`` or CPU and has no distributed layer at all — SURVEY §2.7).
Here parallelism is a first-class axis instead: every entry point builds a
`jax.sharding.Mesh` with

* a ``data`` axis — batch data parallelism for training (XLA inserts the
  gradient all-reduce over ICI when params are replicated and the batch is
  sharded), and
* a ``spatial`` axis — used by the sliding-window inference engine to shard a
  scene's tile grid across devices with `ppermute` halo exchange
  (:mod:`cvcs_tpu.infer.halo`).

On a single chip both axes have size 1 and everything degrades to plain jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How to lay devices out.

    ``data`` * ``spatial`` must equal the number of devices used. ``None``
    means "all remaining devices on this axis".
    """

    data: int | None = None
    spatial: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        spatial = self.spatial
        data = self.data if self.data is not None else n_devices // spatial
        if data * spatial != n_devices:
            raise ValueError(
                f"mesh {data}x{spatial} does not cover {n_devices} devices"
            )
        return data, spatial


def create_mesh(
    config: MeshConfig | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build the (data, spatial) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    config = config or MeshConfig()
    data, spatial = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def local_mesh() -> Mesh:
    """A 1x1 mesh on the first local device — the single-chip fallback."""
    return create_mesh(MeshConfig(data=1, spatial=1), devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Mapping[str, Any] | Any, mesh: Mesh) -> Any:
    """Device-put a batch pytree with the leading dim sharded over ``data``.

    Leaves whose leading dim is not divisible by the ``data`` axis size are
    replicated instead (e.g. scalar aux inputs).
    """
    axis = mesh.shape[DATA_AXIS]

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if x.ndim >= 1 and x.shape[0] % axis == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)
