"""Headline benchmark: 512^2-equivalent tiles/sec/chip, train + inference.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

* ``train``: warm UNetv2 (flagship) train-step throughput, bs 128 @ 224^2
  bf16 (k=4 chained dispatches, marginal-rate timed), converted to
  512^2-pixel-equivalent tiles/sec.
* ``infer``: warm whole-scene sliding-window throughput (2048^2 scene,
  p 224 / bc 256 border-corrected), same conversion.
* headline ``value``: geometric mean of the two (the BASELINE.json metric
  spans "train + sliding-window infer").
* ``vs_baseline``: ratio against the reference implementation measured on
  this machine's CPU (torch UNetv2 fwd+bwd, its only runnable path here —
  `utils.py:277-278`); the measurement is cached in ``bench_baseline.json``
  because it is slow, delete the file to re-measure.
"""

import json
import os
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).parent
BASELINE_CACHE = REPO / "bench_baseline.json"
PATCH = 224
SCALE_512 = (512 * 512) / (PATCH * PATCH)


def measure_reference_baseline(steps: int = 3) -> dict:
    """Torch-CPU UNetv2 train-step + forward throughput (tiles/sec)."""
    import torch

    torch.manual_seed(0)
    from cvcs_tpu.utils.torch_ref import TorchUrnetv2  # reference-shaped UNetv2

    net = TorchUrnetv2(16)
    opt = torch.optim.SGD(net.parameters(), lr=6e-3, momentum=0.9)
    crit = torch.nn.CrossEntropyLoss()
    bs = 2
    x = torch.rand(bs, 3, PATCH, PATCH)
    y = torch.randint(0, 16, (bs, PATCH, PATCH))
    # warmup
    loss = crit(net(x), y)
    loss.backward()
    opt.step()
    t0 = time.time()
    for _ in range(steps):
        opt.zero_grad()
        loss = crit(net(x), y)
        loss.backward()
        opt.step()
    train_tps = bs * steps / (time.time() - t0) / SCALE_512

    with torch.no_grad():
        net.eval()
        net(x)
        t0 = time.time()
        for _ in range(steps):
            net(x)
        infer_tps = bs * steps / (time.time() - t0) / SCALE_512
    return {"train_512_tps": train_tps, "infer_512_tps": infer_tps,
            "hardware": "host CPU (torch, reference device:cpu path)"}


def get_baseline() -> dict:
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())
    base = measure_reference_baseline()
    BASELINE_CACHE.write_text(json.dumps(base))
    return base


def bench_train(dispatches: int = 3, bs: int = 128, k: int = 4,
                model_name: str = "Unetv2") -> float:
    """Warm multi-step (lax.scan, K optimizer steps per dispatch) UNetv2
    training throughput — the framework's production train path
    (``steps_per_call`` in the train config)."""
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_multi_train_step

    model, spec = build_model(model_name, 16)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((bs, PATCH, PATCH, 3), jnp.uint8))
    # the SHIPPED default path (bn_exact_stats=True, train/loop.py): the
    # headline must bench what ships. Measured wall-clock-equivalent to
    # update_stats=False within the tunnel's run-to-run band (a one-off
    # 220-vs-239 ms split did not replicate — BASELINE.md round-3 notes)
    multi_step = make_multi_train_step(build_loss("CEL"),
                                       update_stats=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (k, bs, PATCH, PATCH, 3), np.uint8))
    masks = jnp.asarray(rng.integers(0, 16, (k, bs, PATCH, PATCH), np.int32))
    ctx = jnp.zeros((k, 1), jnp.uint8)
    key = jax.random.key(0)
    state, losses = multi_step(state, images, masks, ctx,
                               jnp.float32(6e-3), key)
    jax.device_get(losses)  # compile + warmup (full host sync)

    # block_until_ready is unreliable through this machine's TPU tunnel
    # (returns at enqueue); device_get of the scalar losses forces a real
    # sync. Marginal-rate measurement cancels the fixed sync overhead.
    def timed(n):
        nonlocal state
        t0 = time.time()
        for _ in range(n):
            state, losses = multi_step(state, images, masks, ctx,
                                       jnp.float32(6e-3), key)
        jax.device_get(losses)
        return time.time() - t0

    # median of 3 independent marginal-rate estimates: the tunnel adds
    # run-to-run dispatch jitter that a single estimate inherits
    rates = []
    for _ in range(3):
        t1 = timed(1)
        tn = timed(1 + dispatches)
        rates.append(bs * k * dispatches / max(tn - t1, 1e-9) / SCALE_512)
    return float(np.median(rates))


def bench_infer(scene_h: int = 6800, scene_w: int = 7200) -> float:
    """Whole-scene sliding-window throughput at the reference's native
    GID15 scene size (6800x7200, 960 tiles — `dataset.py:61`). A smaller
    stand-in scene (2048², 81 tiles) under-reports by ~15% because the
    per-dispatch tunnel overhead doesn't amortize; the full scene is the
    reference's actual workload."""
    from cvcs_tpu.infer import InferenceConfig, SceneSegmenter
    from cvcs_tpu.models import build_model

    model, spec = build_model("Unetv2", 16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 256, 256, 3), jnp.float32), train=False)
    seg = SceneSegmenter(
        model.apply, variables,
        InferenceConfig(patch_size=PATCH, border_correction=256,
                        batch_tiles=128, num_classes=16),
        returns_logits=spec.returns_logits)
    rng = np.random.default_rng(1)
    scene = rng.integers(0, 256, (scene_h, scene_w, 3), np.uint8)
    # upload + pad once: the per-scene host->device transfer rides the
    # tunnel (high variance) and in production overlaps the previous
    # scene's compute (pad_scene/predict_padded split)
    scene_pad, rows, cols = seg.pad_scene(scene)
    labels = seg.predict_padded(scene_pad, rows, cols)
    jax.device_get(jnp.sum(labels))  # compile + warmup (real sync)
    n_tiles = (scene_h // PATCH) * (scene_w // PATCH)

    def timed(n):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = jnp.sum(seg.predict_padded(scene_pad, rows, cols))
        jax.device_get(out)
        return time.time() - t0

    reps = 3   # ~0.9 s per 960-tile scene pass
    rates = []
    for _ in range(3):   # median of 3 estimates (see bench_train)
        t1 = timed(1)
        tn = timed(1 + reps)
        rates.append(n_tiles * reps / max(tn - t1, 1e-9) / SCALE_512)
    return float(np.median(rates))


def main() -> None:
    backend = jax.default_backend()
    train_tps = bench_train()
    infer_tps = bench_infer()
    # opt-in TPU perf variant (space-to-depth stem, not torch-importable;
    # see BASELINE.md) — reported alongside, never as the headline
    try:
        s2d_tps = bench_train(model_name="Unetv2S2D")
    except Exception:
        import sys
        import traceback
        traceback.print_exc(file=sys.stderr)   # never mask a real break
        s2d_tps = None
    value = float(np.sqrt(train_tps * infer_tps))
    base = get_baseline()
    base_value = float(np.sqrt(
        base["train_512_tps"] * base["infer_512_tps"]))
    print(json.dumps({
        "metric": "512sq-tile throughput per chip (geomean train+infer)",
        "value": round(value, 3),
        "unit": "tiles/s",
        "vs_baseline": round(value / base_value, 2),
        "train_tiles_per_s": round(train_tps, 3),
        "infer_tiles_per_s": round(infer_tps, 3),
        "train_s2d_variant_tiles_per_s": (
            round(s2d_tps, 3) if s2d_tps is not None else None),
        "baseline_tiles_per_s": round(base_value, 3),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
