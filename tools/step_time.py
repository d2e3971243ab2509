"""Measure flagship train-step time (honest chained timing) under the
current XLA_FLAGS / model settings. Prints ms/step and tiles512/s.

Usage: python tools/step_time.py [bs] [k] [model] [reps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
MODEL = sys.argv[3] if len(sys.argv) > 3 else "Unetv2"
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3
PATCH = 224


def main():
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_multi_train_step

    update_stats = os.environ.get("UPDATE_STATS", "1") != "0"
    model, spec = build_model(MODEL, 16)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((BS, PATCH, PATCH, 3), jnp.uint8))
    multi_step = make_multi_train_step(build_loss("CEL"),
                                       update_stats=update_stats)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (K, BS, PATCH, PATCH, 3), np.uint8))
    masks = jnp.asarray(rng.integers(0, 16, (K, BS, PATCH, PATCH), np.int32))
    ctx = jnp.zeros((K, 1), jnp.uint8)
    key = jax.random.key(0)
    state, losses = multi_step(state, images, masks, ctx,
                               jnp.float32(6e-3), key)
    jax.device_get(losses)

    def timed(n):
        nonlocal state
        t0 = time.time()
        for _ in range(n):
            state, losses = multi_step(state, images, masks, ctx,
                                       jnp.float32(6e-3), key)
        jax.device_get(losses)
        return time.time() - t0

    t1 = timed(1)
    tn = timed(1 + REPS)
    step_ms = (tn - t1) / REPS / K * 1000
    tiles = BS / (step_ms / 1000) / (512 * 512 / PATCH / PATCH)
    print(f"RESULT model={MODEL} bs={BS} k={K} "
          f"update_stats={update_stats}: {step_ms:.1f} ms/step  "
          f"{tiles:.1f} tiles512/s  flags={os.environ.get('LIBTPU_INIT_ARGS', '')}"
          f" xla={os.environ.get('XLA_FLAGS', '')}")
    print(f"LOSSES {np.asarray(losses, np.float32).tolist()}")
    try:
        stats = jax.local_devices()[0].memory_stats()
        print(f"PEAK_HBM_MB {stats['peak_bytes_in_use'] / 2**20:.0f}")
    except Exception as e:  # tunneled backends may not expose stats
        print(f"PEAK_HBM_MB unavailable ({e})")


if __name__ == "__main__":
    main()
