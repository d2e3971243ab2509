"""Capture a jax.profiler trace of the flagship train step on the real TPU
and print the top ops by self time (parsed from the trace JSON).

Usage: python tools/profile_train.py [bs] [k] [model] [patch]
Writes the trace under /tmp/tb_trace_r2 and prints a table.
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

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
MODEL = sys.argv[3] if len(sys.argv) > 3 else "Unetv2"
PATCH = int(sys.argv[4]) if len(sys.argv) > 4 else 224
UPDATE_STATS = os.environ.get("UPDATE_STATS", "1") != "0"
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/tb_trace_r3")


def main():
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_multi_train_step

    model, spec = build_model(MODEL, 16)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((BS, PATCH, PATCH, 3), jnp.uint8))
    multi_step = make_multi_train_step(build_loss("CEL"),
                                       update_stats=UPDATE_STATS)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (K, BS, PATCH, PATCH, 3), np.uint8))
    masks = jnp.asarray(rng.integers(0, 16, (K, BS, PATCH, PATCH), np.int32))
    ctx = jnp.zeros((K, 1), jnp.uint8)
    key = jax.random.key(0)
    state, losses = multi_step(state, images, masks, ctx,
                               jnp.float32(6e-3), key)
    jax.device_get(losses)
    print("warm; timing...", flush=True)

    def timed(n):
        nonlocal state
        t0 = time.time()
        for _ in range(n):
            state, losses = multi_step(state, images, masks, ctx,
                                       jnp.float32(6e-3), key)
        jax.device_get(losses)
        return time.time() - t0

    t1 = timed(1)
    tn = timed(4)
    step_ms = (tn - t1) / 3 / K * 1000
    print(f"step time: {step_ms:.1f} ms/step (bs {BS})  "
          f"-> {BS / (step_ms / 1000) / (512 * 512 / PATCH / PATCH):.1f} "
          "tiles512/s", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        state, losses = multi_step(state, images, masks, ctx,
                                   jnp.float32(6e-3), key)
        jax.device_get(losses)
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
    # keep only TPU op-level lanes (XLA Ops), not host threads
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
    print(f"\ntotal device op-time: {total / 1e3:.1f} ms over "
          f"{K} steps — top ops:")
    for name, dur in top:
        print(f"  {dur / 1e3:9.2f} ms  {100 * dur / max(total, 1e-9):5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
