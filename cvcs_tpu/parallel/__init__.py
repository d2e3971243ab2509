"""Mesh parallelism primitives: halo exchange for spatially-sharded scene
inference (the framework's context-parallel axis) over ICI via ppermute."""

from cvcs_tpu.parallel.halo import exchange_row_halo, sharded_rows  # noqa: F401
