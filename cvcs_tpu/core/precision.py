"""Mixed-precision policy.

TPU-first dtype policy: parameters and batch-norm statistics live in float32,
compute (convolutions / matmuls on the MXU) runs in bfloat16, and loss /
metric reductions accumulate in float32. The reference runs everything in
float32 on CUDA (`train.py:121` casts inputs to float); bf16 on the MXU is the
idiomatic TPU equivalent and is this framework's default.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


DEFAULT_POLICY = Policy()
# Full-f32 policy: used by parity tests against reference semantics and by
# the CPU test backend where bf16 is emulated (slow).
F32_POLICY = Policy(compute_dtype=jnp.float32)


def policy_from_config(name: str | None) -> Policy:
    if name in (None, "bf16", "bfloat16", "mixed"):
        return DEFAULT_POLICY
    if name in ("f32", "float32", "full"):
        return F32_POLICY
    raise ValueError(f"unknown precision policy: {name!r}")
