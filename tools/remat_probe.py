"""Measure the remat memory/FLOP trade with XLA's own numbers: AOT-compile
the flagship train step plain vs remat at a given (bs, patch) and print
`compiled.memory_analysis()` (HBM the program actually reserves) plus, if
it fits, honest chained step timing. An OOM at compile/alloc time is
caught and reported as the result.

Usage: python tools/remat_probe.py <bs> [patch] [model] [remat] [accum]
remat: 0 = plain, 2 = block-level nn.remat inside the model (models
exposing `remat`). Mode 1 (step-level jax.checkpoint around the whole
forward) was measured HARMFUL on UNetv2 (+3.3GiB peak, -25% throughput,
BASELINE.md round 3) and removed from train/step.py.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
PATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 224
MODEL = sys.argv[3] if len(sys.argv) > 3 else "Unetv2"
REMAT = int(sys.argv[4]) if len(sys.argv) > 4 else 0
ACCUM = int(sys.argv[5]) if len(sys.argv) > 5 else 1


def main():
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_train_step

    if REMAT == 1:
        raise SystemExit("mode 1 (whole-forward jax.checkpoint) was "
                         "measured harmful and removed — see docstring")
    kw = {"remat": True} if REMAT == 2 else {}
    model, spec = build_model(MODEL, 16, **kw)
    optimizer = build_optimizer("SGD2")
    state = create_train_state(
        model, optimizer, jnp.zeros((1, PATCH, PATCH, 3), jnp.uint8))
    step = make_train_step(build_loss("CEL"), accum=ACCUM)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (BS, PATCH, PATCH, 3), np.uint8))
    msk = jnp.asarray(rng.integers(0, 16, (BS, PATCH, PATCH), np.int32))
    ctx = jnp.zeros((), jnp.uint8)
    key = jax.random.key(0)
    lr = jnp.float32(6e-3)

    tag = (f"model={MODEL} bs={BS} p={PATCH} remat={int(REMAT)} "
           f"accum={ACCUM}")
    try:
        lowered = step.lower(state, img, msk, ctx, lr, key)
        compiled = lowered.compile()
    except Exception as e:  # noqa: BLE001 - report OOM class + message
        print(f"RESULT {tag}: COMPILE-FAIL {type(e).__name__}: "
              f"{str(e)[:300]}")
        return
    ma = compiled.memory_analysis()
    gb = 1 << 30
    print(f"MEMORY {tag}: temp={ma.temp_size_in_bytes / gb:.2f}GiB "
          f"args={ma.argument_size_in_bytes / gb:.2f}GiB "
          f"output={ma.output_size_in_bytes / gb:.2f}GiB "
          f"alias={ma.alias_size_in_bytes / gb:.2f}GiB "
          f"peak(temp+args-alias)="
          f"{(ma.temp_size_in_bytes + ma.argument_size_in_bytes - ma.alias_size_in_bytes) / gb:.2f}GiB",
          flush=True)
    try:
        state2, loss = compiled(state, img, msk, ctx, lr, key)
        jax.device_get(loss)
    except Exception as e:  # noqa: BLE001
        print(f"RESULT {tag}: RUN-FAIL {type(e).__name__}: {str(e)[:300]}")
        return
    t0 = time.time()
    state2, loss = compiled(state2, img, msk, ctx, lr, key)
    jax.device_get(loss)
    t1 = time.time() - t0
    n = 3
    t0 = time.time()
    for _ in range(n + 1):
        state2, loss = compiled(state2, img, msk, ctx, lr, key)
    jax.device_get(loss)
    step_s = (time.time() - t0 - t1) / n
    tiles = BS / step_s / (512 * 512 / PATCH / PATCH)
    print(f"RESULT {tag}: {step_s * 1000:.1f} ms/step  "
          f"{tiles:.1f} tiles512/s")


if __name__ == "__main__":
    main()
