"""Trace the full-convolution banded inference path on the real TPU and
print top device ops by self time (same parsing as tools/profile_train.py).

Usage: MODEL=Unetv2 FC_BANDS=6 python tools/profile_fullconv.py [H W p bc]
"""

import gzip
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

H = int(sys.argv[1]) if len(sys.argv) > 1 else 6800
W = int(sys.argv[2]) if len(sys.argv) > 2 else 7200
PATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 224
BC = int(sys.argv[4]) if len(sys.argv) > 4 else 256
MODEL = os.environ.get("MODEL", "Unetv2")
FC_BANDS = int(os.environ.get("FC_BANDS", "6"))
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/tb_trace_fc")


def main():
    from cvcs_tpu.infer import InferenceConfig, SceneSegmenter
    from cvcs_tpu.models import build_model

    model, spec = build_model(MODEL, 16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)},
        jnp.zeros((1, PATCH, PATCH, 3), jnp.float32), train=False)
    cfg = InferenceConfig(patch_size=PATCH, border_correction=BC,
                          batch_tiles=64, num_classes=16)
    seg = SceneSegmenter(model.apply, variables, cfg,
                         returns_logits=spec.returns_logits)
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 256, (H, W, 3), np.uint8)
    padded, rows, cols, halo = seg.pad_scene_fullconv(scene)

    def run():
        return seg.predict_padded_fullconv(padded, rows, cols, halo,
                                           band_rows=FC_BANDS)

    jax.device_get(jnp.sum(run()))
    print("warm; tracing...", flush=True)
    with jax.profiler.trace(TRACE_DIR):
        jax.device_get(jnp.sum(run()))
    time.sleep(2)

    traces = sorted(Path(TRACE_DIR).rglob("*.trace.json.gz"),
                    key=lambda p: p.stat().st_mtime)
    if not traces:
        print("no trace file found")
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    op_time = defaultdict(float)
    total = 0.0
    for e in events:
        pname = pids.get(e["pid"], "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        op_time[name] += e["dur"]
        total += e["dur"]
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:40]
    print(f"\ntotal device op-time: {total / 1e3:.1f} ms/scene — top ops:")
    for name, dur in top:
        print(f"  {dur / 1e3:9.2f} ms  {100 * dur / max(total, 1e-9):5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
