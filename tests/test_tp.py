"""Tensor parallelism must be real, not placement-only (round-1 Weak #4):

* numerics: TP forward == replicated forward;
* compiled HLO contains cross-device collectives;
* compiled HLO computes the bottleneck conv at the PER-PARTITION channel
  width (C / n_devices) — sharded compute, not an all-gather back to
  replicated math;
* per-device parameter memory for sharded kernels is 1/n of replicated.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

from cvcs_tpu.core.mesh import MeshConfig, create_mesh
from cvcs_tpu.models import build_model
from cvcs_tpu.parallel.tp import (
    channel_shardings, shard_params, tensor_parallel,
)

N_DEV = 8


def _setup():
    mesh = create_mesh(MeshConfig(data=1, spatial=N_DEV))
    model, _ = build_model("Unet", 16, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3)) * 255
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(1)}, x, train=False)

    def fwd(params, batch_stats, a):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, a, train=False)

    return mesh, model, x, variables, fwd


def test_tp_forward_matches_replicated():
    mesh, model, x, variables, fwd = _setup()
    base = jax.jit(fwd)(variables["params"], variables["batch_stats"], x)
    tp_params = shard_params(variables["params"], mesh, min_channels=64)
    with tensor_parallel(mesh, "spatial", min_channels=512):
        tp = jax.jit(fwd)(tp_params, variables["batch_stats"], x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(tp),
                               atol=1e-4, rtol=1e-4)


def test_tp_compiled_hlo_is_sharded_compute():
    mesh, model, x, variables, fwd = _setup()
    tp_params = shard_params(variables["params"], mesh, min_channels=64)
    with tensor_parallel(mesh, "spatial", min_channels=512):
        compiled = (jax.jit(fwd)
                    .lower(tp_params, variables["batch_stats"], x)
                    .compile())
    txt = compiled.as_text()
    # XLA inserted real collectives over the mesh
    assert any(op in txt for op in
               ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute")), "no collectives in compiled HLO"
    # the 1024-ch bottleneck runs at per-partition width 1024/8 = 128:
    # some convolution writes an f32[...,128] result
    conv_lines = [l for l in txt.splitlines() if " convolution(" in l
                  or " convolution-start(" in l]
    per_part = [l for l in conv_lines
                if re.search(r"f32\[[0-9,]*,128\]", l)]
    assert per_part, (
        "no per-partition (128-ch) bottleneck conv — compute is replicated:\n"
        + "\n".join(conv_lines[:20]))


def _compiled_tp_hlo(model_name: str, size: int) -> str:
    """Compile a TP forward of a zoo model on the 8-device mesh and return
    the post-SPMD HLO text."""
    mesh = create_mesh(MeshConfig(data=1, spatial=N_DEV))
    model, _ = build_model(model_name, 16, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(0), (2, size, size, 3)) * 255
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(1)}, x, train=False)

    def fwd(params, batch_stats, a):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, a, train=False)

    tp_params = shard_params(variables["params"], mesh, min_channels=512)
    with tensor_parallel(mesh, "spatial", min_channels=512):
        compiled = (jax.jit(fwd)
                    .lower(tp_params, variables["batch_stats"], x)
                    .compile())
    return compiled.as_text()


def _compute_widths(txt: str) -> set:
    """Output-channel widths of every conv/dot in the compiled HLO."""
    out = set()
    for line in txt.splitlines():
        m = re.search(r"f32\[([0-9,]+)\]\S* (?:convolution|dot)\(", line)
        if m:
            out.add(int(m.group(1).split(",")[-1]))
    return out


def test_tp_resnet101_hlo_is_sharded_compute():
    """`parallel/tp.py` claims a constrain hook at ResNet-101's 2048-ch
    stage 4 (`models/resnet.py`): the compiled HLO must contain collectives
    and NO conv/dot at the full 512/1024/2048 widths — stage 3/4 compute
    runs at the per-partition widths (e.g. 2048/8 = 256), not replicated
    after an all-gather (the round-1 failure mode)."""
    txt = _compiled_tp_hlo("Resnet101", 64)
    assert any(op in txt for op in
               ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute")), "no collectives in compiled HLO"
    widths = _compute_widths(txt)
    assert not widths & {512, 1024, 2048}, (
        f"full-width conv/dot survived — compute is replicated: {widths}")
    assert 256 in widths, (  # 2048/8: stage-4 blocks at partition width
        f"no per-partition stage-4 conv/dot: {widths}")


def test_tp_segformer_b3_hlo_is_sharded_compute():
    """Same for SegFormer-B3's 512-ch stage 4 (`models/segformer.py`):
    no conv/dot at the full 512 (attention/proj) or 2048 (MixFFN hidden)
    widths — those run at 512/8 = 64 and 2048/8 = 256 per partition."""
    txt = _compiled_tp_hlo("SegformerMod", 64)
    assert any(op in txt for op in
               ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute")), "no collectives in compiled HLO"
    widths = _compute_widths(txt)
    assert not widths & {512, 2048}, (
        f"full-width stage-4 dot survived — compute is replicated: {widths}")


def test_tp_per_device_param_memory_shrinks():
    mesh, model, x, variables, fwd = _setup()
    tp_params = shard_params(variables["params"], mesh, min_channels=64)
    shardings = channel_shardings(variables["params"], mesh, min_channels=64)
    n_sharded = 0
    for arr, shd in zip(jax.tree_util.tree_leaves(tp_params),
                        jax.tree_util.tree_leaves(shardings)):
        shard_bytes = arr.addressable_shards[0].data.nbytes
        if shd.is_fully_replicated:
            assert shard_bytes == arr.nbytes
        else:
            assert shard_bytes == arr.nbytes // N_DEV
            n_sharded += 1
    assert n_sharded > 10   # the deep half of the UNet is genuinely sharded
