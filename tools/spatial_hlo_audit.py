"""Audit the GSPMD-partitioned HLO of spatially-sharded train steps.

Round-3 found the SPMD partitioner re-materializes full activations for
transpose-conv decoders under row sharding (BASELINE.md §Blocked; warned
at `cli/train.py` point-of-use). Attention models bring new hazard
patterns — Swin's `jnp.roll` + window partition/merge reshapes,
SegFormer's sr-conv attention — so this tool compiles one train step per
model on a (data=2, spatial=4) virtual CPU mesh and reports every
cross-device data movement op in the optimized HLO: counts and output
bytes of all-gather / all-to-all / collective-permute, plus the largest
single gathers. An "involuntary re-materialization" shows up as
all-gathers whose outputs are full (unsharded-H) activation tensors.

Usage: python tools/spatial_hlo_audit.py [model ...]
(default: Unet Unetv2 SwinUnetTiny SegformerB0)
"""

import os
import re
import sys
from collections import defaultdict

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_platforms", "cpu")

PATCH = 64
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}


def shape_bytes(text: str) -> int:
    """Total output bytes of an HLO shape string like
    'f32[2,16,64,32]' or a tuple '(f32[...], u8[...])'."""
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def audit(name: str):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvcs_tpu.core.mesh import (
        DATA_AXIS, SPATIAL_AXIS, MeshConfig, create_mesh,
    )
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_train_step

    mesh = create_mesh(MeshConfig(data=2, spatial=4))
    model, spec = build_model(name, 16, dtype=jnp.float32)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((4, PATCH, PATCH, 3), jnp.uint8))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.integers(0, 256, (4, PATCH, PATCH, 3), np.uint8),
        NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None)))
    msk = jax.device_put(
        rng.integers(0, 16, (4, PATCH, PATCH)).astype(np.int32),
        NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS)))
    step = make_train_step(build_loss("CEL"), spec.requires_context)
    compiled = step.lower(state, img, msk, jnp.zeros((), jnp.uint8),
                          jnp.float32(1e-3), jax.random.key(0)).compile()
    hlo = compiled.as_text()

    ops = defaultdict(lambda: [0, 0, 0])   # op -> [count, bytes, max]
    for line in hlo.splitlines():
        m = re.search(
            r"=\s+(\([^)]*\)|\S+)\s+(all-gather|all-to-all|"
            r"collective-permute|all-reduce)\(", line)
        if not m:
            continue
        b = shape_bytes(m.group(1))
        rec = ops[m.group(2)]
        rec[0] += 1
        rec[1] += b
        rec[2] = max(rec[2], b)
    print(f"\n== {name} (train step, data=2 x spatial=4, patch {PATCH}, "
          f"bs 4) ==")
    if not ops:
        print("  no collectives (fully local)")
    for op, (cnt, tot, mx) in sorted(ops.items()):
        print(f"  {op:20s} x{cnt:3d}  total {tot/1e6:8.2f} MB  "
              f"largest {mx/1e6:8.2f} MB")
    # full-activation re-materialization heuristic: an all-gather whose
    # single output is at least the whole (bs, H, W, C_min) input frame
    frame = 4 * PATCH * PATCH * 4
    n_remat = 0
    for line in hlo.splitlines():
        m = re.search(r"=\s+(\([^)]*\)|\S+)\s+all-gather\(", line)
        if m and shape_bytes(m.group(1)) >= frame:
            n_remat += 1
    print(f"  all-gathers >= one full {4}x{PATCH}x{PATCH} f32 frame "
          f"({frame/1e6:.2f} MB): {n_remat}")
    return ops, n_remat


def main():
    names = sys.argv[1:] or ["Unet", "Unetv2", "SwinUnetTiny",
                             "SegformerB0"]
    for n in names:
        audit(n)


if __name__ == "__main__":
    main()
